"""Data-engine tests: loaders on tiny fixtures, preprocessing composition,
seeded split determinism, cache round-trip, count-sum invariants, superset
mapping (SURVEY.md §4 item 2)."""

import gzip
import os

import h5py
import numpy as np
import pytest
import scipy.io
import scipy.sparse

from scvae_tpu.data import (
    DataSet,
    SparseRowMatrix,
    create_development_data_set,
    indices_for_evaluation_subset,
    sparsity,
)
from scvae_tpu.data import internal_io, processing
from scvae_tpu.data.loaders import LOADERS


class TestSparse:
    def test_whole_matrix_stats(self):
        dense = np.array([[0, 1, 2], [3, 0, 0]], np.float32)
        m = SparseRowMatrix(scipy.sparse.csr_matrix(dense))
        assert m.mean() == pytest.approx(dense.mean())
        assert m.var() == pytest.approx(dense.var())
        assert m.std() == pytest.approx(dense.std())
        np.testing.assert_allclose(
            np.asarray(m.var(axis=0)).squeeze(), dense.var(axis=0), rtol=1e-6
        )

    def test_sparsity(self):
        dense = np.array([[0, 1], [0, 0]], np.float32)
        assert sparsity(scipy.sparse.csr_matrix(dense)) == 0.75
        assert sparsity(dense) == 0.75


class TestDevelopmentSet:
    def test_deterministic(self):
        d1 = create_development_data_set(n_examples=200, n_features=25)
        d2 = create_development_data_set(n_examples=200, n_features=25)
        np.testing.assert_array_equal(d1["values"], d2["values"])
        np.testing.assert_array_equal(d1["labels"], d2["labels"])

    def test_structure(self):
        d = create_development_data_set(n_examples=300, n_features=25)
        assert d["values"].shape == (300, 25)
        assert (d["labels"] == "0").sum() == 30  # 10% "no class"
        assert set(d["feature mapping"]) == {
            "feature A", "feature B", "feature C", "feature D", "feature E"
        }
        assert len(d["example names"]) == 300


class TestPreprocessing:
    def test_log_exp_roundtrip(self):
        m = SparseRowMatrix(
            scipy.sparse.csr_matrix(np.array([[0.0, 3.0], [1.0, 0.0]]))
        )
        log = processing.build_preprocessor(["log"])
        exp = processing.build_preprocessor(["exp"])
        round_trip = exp(log(m.copy()))
        np.testing.assert_allclose(
            np.asarray(round_trip.todense()), np.asarray(m.todense()), rtol=1e-6
        )

    def test_binarise(self):
        m = SparseRowMatrix(
            scipy.sparse.csr_matrix(np.array([[0.0, 3.0], [0.4, 0.6]]))
        )
        binarise = processing.build_preprocessor(["binarise"])
        out = np.asarray(binarise(m).todense())
        np.testing.assert_array_equal(out, [[0, 1], [0, 1]])

    def test_noisy_binarise_is_bernoulli(self):
        m = SparseRowMatrix(
            scipy.sparse.csr_matrix(np.full((50, 50), 0.5, np.float32))
        )
        noisy = processing.build_preprocessor(["binarise"], noisy=True)
        out = np.asarray(noisy(m.copy()).todense())
        assert set(np.unique(out)) <= {0.0, 1.0}
        assert 0.3 < out.mean() < 0.7

    def test_feature_mapping_aggregates(self):
        values = scipy.sparse.csr_matrix(
            np.array([[1, 2, 4], [8, 16, 32]], np.float32)
        )
        mapped, names = processing.map_features(
            values, ["g1", "g2", "g3"], {"A": ["g1", "g2"], "B": ["g3"]}
        )
        np.testing.assert_array_equal(
            np.asarray(mapped.todense()), [[3, 4], [24, 32]]
        )
        assert list(names) == ["A", "B"]

    def test_feature_mapping_unknown_ids_kept(self):
        values = scipy.sparse.csr_matrix(np.eye(3, dtype=np.float32))
        mapped, names = processing.map_features(
            values, ["g1", "g2", "gX"], {"A": ["g1", "g2"]}
        )
        assert list(names) == ["A", "gX"]
        np.testing.assert_array_equal(
            np.asarray(mapped.todense()), [[1, 0], [1, 0], [0, 1]]
        )

    def test_select_features_highest_variance(self):
        rng = np.random.RandomState(0)
        dense = np.concatenate(
            [rng.randn(50, 3) * 5, rng.randn(50, 3) * 0.01], axis=1
        ).astype(np.float32)
        values = {"original": SparseRowMatrix(scipy.sparse.csr_matrix(dense))}
        names = np.array([f"f{i}" for i in range(6)])
        selected, selected_names = processing.select_features(
            values, names, method="keep_highest_variances", parameters=[3]
        )
        assert set(selected_names) == {"f0", "f1", "f2"}

    def test_filter_examples_remove_class(self):
        values = {"original": SparseRowMatrix(
            scipy.sparse.csr_matrix(np.arange(12, dtype=np.float32).reshape(4, 3))
        )}
        names = np.array(["a", "b", "c", "d"])
        labels = np.array(["x", "No class", "x", "y"])
        filtered, f_names, f_labels, _ = processing.filter_examples(
            values, names, method="excluded_classes", labels=labels,
            excluded_classes=["No class"],
        )
        assert list(f_names) == ["a", "c", "d"]
        assert list(f_labels) == ["x", "x", "y"]

    def test_random_filter_seeded(self):
        values = {"original": SparseRowMatrix(
            scipy.sparse.csr_matrix(np.random.RandomState(0).rand(100, 4))
        )}
        names = np.arange(100).astype(str)
        out1 = processing.filter_examples(
            values, names, method="random", parameters=[10]
        )
        out2 = processing.filter_examples(
            values, names, method="random", parameters=[10]
        )
        np.testing.assert_array_equal(out1[1], out2[1])


class TestSplitting:
    def _data_dictionary(self, n=100, f=5):
        rng = np.random.RandomState(0)
        return {
            "values": SparseRowMatrix(
                scipy.sparse.csr_matrix(rng.poisson(2, (n, f)).astype(np.float32))
            ),
            "labels": rng.randint(0, 3, n),
            "example names": np.array([f"c{i}" for i in range(n)]),
            "feature names": np.array([f"g{j}" for j in range(f)]),
            "class names": [0, 1, 2],
        }

    def test_random_split_deterministic_and_sized(self):
        d = self._data_dictionary()
        s1 = processing.split_data_set(d, method="random", fraction=0.9)
        s2 = processing.split_data_set(d, method="random", fraction=0.9)
        np.testing.assert_array_equal(
            s1["training set"]["example names"],
            s2["training set"]["example names"],
        )
        assert s1["training set"]["values"].shape[0] == 81  # 0.9·0.9·100
        assert s1["validation set"]["values"].shape[0] == 9
        assert s1["test set"]["values"].shape[0] == 10

    def test_sequential_split(self):
        d = self._data_dictionary()
        s = processing.split_data_set(d, method="sequential", fraction=0.9)
        assert list(s["training set"]["example names"][:2]) == ["c0", "c1"]

    def test_split_partition_is_exact(self):
        d = self._data_dictionary()
        s = processing.split_data_set(d, method="random", fraction=0.9)
        all_names = np.concatenate(
            [
                s[k]["example names"]
                for k in ("training set", "validation set", "test set")
            ]
        )
        assert sorted(all_names) == sorted(d["example names"])

    def test_indices_split(self):
        d = self._data_dictionary()
        d["split indices"] = {
            "training": slice(0, 80),
            "validation": slice(80, 90),
            "test": slice(90, 100),
        }
        s = processing.split_data_set(d, method="default")
        assert s["training set"]["values"].shape[0] == 80
        assert s["test set"]["example names"][0] == "c90"


class TestInternalIO:
    def test_roundtrip(self, tmp_path):
        d = {
            "values": SparseRowMatrix(
                scipy.sparse.csr_matrix(
                    np.random.RandomState(0).poisson(1, (20, 6)).astype(np.float32)
                )
            ),
            "labels": np.array(["a", "b"] * 10),
            "example names": np.array([f"e{i}" for i in range(20)]),
            "feature names": np.array([f"f{i}" for i in range(6)]),
            "preprocessed values": None,
            "split indices": {"training": slice(0, 15), "test": slice(15, 20)},
            "feature mapping": {"A": ["f0", "f1"], "B": ["f2"]},
        }
        path = str(tmp_path / "cache.h5")
        internal_io.save_data_dictionary(d, path)
        loaded = internal_io.load_data_dictionary(path)
        np.testing.assert_array_equal(
            np.asarray(loaded["values"].todense()),
            np.asarray(d["values"].todense()),
        )
        assert isinstance(loaded["values"], SparseRowMatrix)
        np.testing.assert_array_equal(loaded["labels"], d["labels"])
        assert loaded["preprocessed values"] is None
        assert loaded["split indices"]["training"] == slice(0, 15)
        assert sorted(loaded["feature mapping"]["A"]) == ["f0", "f1"]


class TestLoaders:
    def test_matrix_ebf(self, tmp_path):
        path = str(tmp_path / "m.tsv")
        with open(path, "w") as f:
            f.write("cell\tg1\tg2\n")
            f.write("c1\t1\t2\n")
            f.write("c2\t3\t4\n")
        d = LOADERS["matrix_ebf"]({"values": {"full": path}})
        np.testing.assert_array_equal(
            np.asarray(d["values"].todense()), [[1, 2], [3, 4]]
        )
        assert list(d["example names"]) == ["c1", "c2"]

    def test_matrix_fbe_transposes(self, tmp_path):
        path = str(tmp_path / "m.tsv")
        with open(path, "w") as f:
            f.write("gene\tc1\tc2\n")
            f.write("g1\t1\t3\n")
            f.write("g2\t2\t4\n")
        d = LOADERS["matrix_fbe"]({"values": {"full": path}})
        np.testing.assert_array_equal(
            np.asarray(d["values"].todense()), [[1, 2], [3, 4]]
        )
        assert list(d["feature names"]) == ["g1", "g2"]

    def test_10x_directory(self, tmp_path):
        matrix = scipy.sparse.csr_matrix(
            np.array([[1, 0, 2], [0, 3, 0]], np.float32)
        )  # genes × cells
        scipy.io.mmwrite(str(tmp_path / "matrix.mtx"), matrix)
        with open(tmp_path / "genes.tsv", "w") as f:
            f.write("ENSG1\tGeneA\nENSG2\tGeneB\n")
        with open(tmp_path / "barcodes.tsv", "w") as f:
            f.write("AAAC\nGGGT\nTTTC\n")
        d = LOADERS["10x"]({"values": {"full": str(tmp_path)}})
        assert d["values"].shape == (3, 2)  # cells × genes
        np.testing.assert_array_equal(
            np.asarray(d["values"].todense()), [[1, 0], [0, 3], [2, 0]]
        )
        assert list(d["feature names"]) == ["GeneA", "GeneB"]
        assert list(d["example names"]) == ["AAAC", "GGGT", "TTTC"]

    def test_cellranger_h5(self, tmp_path):
        dense = np.array([[5, 0], [0, 7], [1, 1]], np.float32)  # genes × cells
        csc = scipy.sparse.csc_matrix(dense)
        path = str(tmp_path / "mat.h5")
        with h5py.File(path, "w") as f:
            g = f.create_group("GRCh38")
            g.create_dataset("data", data=csc.data)
            g.create_dataset("indices", data=csc.indices)
            g.create_dataset("indptr", data=csc.indptr)
            g.create_dataset("shape", data=csc.shape)
            g.create_dataset("genes", data=np.array([b"E1", b"E2", b"E3"]))
            g.create_dataset(
                "gene_names", data=np.array([b"A", b"B", b"C"])
            )
            g.create_dataset("barcodes", data=np.array([b"bc1", b"bc2"]))
        d = LOADERS["h5"]({"values": {"full": path}})
        np.testing.assert_array_equal(
            np.asarray(d["values"].todense()), dense.T
        )
        assert list(d["feature names"]) == ["A", "B", "C"]

    def test_loom(self, tmp_path):
        path = str(tmp_path / "d.loom")
        matrix = np.array([[1, 2], [3, 4], [5, 6]], np.float32)  # genes×cells
        with h5py.File(path, "w") as f:
            f.create_dataset("matrix", data=matrix)
            ra = f.create_group("row_attrs")
            ra.create_dataset("Gene", data=np.array([b"g1", b"g2", b"g3"]))
            ca = f.create_group("col_attrs")
            ca.create_dataset("CellID", data=np.array([b"c1", b"c2"]))
            ca.create_dataset("ClusterName", data=np.array([b"T", b"B"]))
        d = LOADERS["loom"]({"all": {"full": path}})
        assert d["values"].shape == (2, 3)
        assert list(d["labels"]) == ["T", "B"]
        assert list(d["example names"]) == ["c1", "c2"]

    def test_macosko(self, tmp_path):
        vpath = str(tmp_path / "expr.txt")
        with open(vpath, "w") as f:
            f.write("gene\tcellA\tcellB\n")
            f.write("g1\t1\t0\n")
        lpath = str(tmp_path / "labels.txt")
        with open(lpath, "w") as f:
            f.write("cellA\t7\ncellB\t3\n")
        d = LOADERS["macosko"](
            {"values": {"full": vpath}, "labels": {"full": lpath}}
        )
        assert list(d["labels"]) == [7, 3]


class TestDataSet:
    def test_development_end_to_end(self, tmp_path):
        ds = DataSet("development", directory=str(tmp_path))
        ds.load()
        assert ds.number_of_examples == 10000
        assert ds.number_of_features == 25
        assert ds.count_sum.shape == (10000, 1)
        assert ds.normalised_count_sum.max() == pytest.approx(1.0)
        # superset mapping from the spec
        assert ds.has_superset_labels
        assert set(ds.superset_class_names) == {"Rods", "Cones", "No class"}
        assert ds.excluded_classes == ["0"]
        # cache created and reload hits it
        ds2 = DataSet("development", directory=str(tmp_path))
        ds2.load()
        np.testing.assert_array_equal(
            np.asarray(ds2.values.todense()), np.asarray(ds.values.todense())
        )

    def test_split_deterministic(self, tmp_path):
        ds = DataSet("development", directory=str(tmp_path))
        train, valid, test = ds.split(method="random", fraction=0.9)
        assert train.kind == "training"
        assert train.number_of_examples == 8100
        assert valid.number_of_examples == 900
        assert test.number_of_examples == 1000
        train2, _, _ = DataSet("development", directory=str(tmp_path)).split(
            method="random", fraction=0.9
        )
        np.testing.assert_array_equal(train.example_names, train2.example_names)

    def test_class_probabilities(self, tmp_path):
        ds = DataSet("development", directory=str(tmp_path))
        ds.load()
        probs = ds.class_probabilities
        assert "0" not in probs or probs.get("0", 0) == 0
        assert abs(sum(probs.values()) - 1.0) < 1e-9

    def test_map_features(self, tmp_path):
        ds = DataSet("development", directory=str(tmp_path), map_features=True)
        ds.load()
        assert ds.number_of_features == 5
        assert set(ds.feature_names) == {
            "feature A", "feature B", "feature C", "feature D", "feature E"
        }

    def test_preprocessing_cached(self, tmp_path):
        ds = DataSet(
            "development",
            directory=str(tmp_path),
            preprocessing_methods=["log"],
        )
        ds.load()
        assert ds.has_preprocessed_values
        expected = np.log1p(np.asarray(ds.values.todense()))
        np.testing.assert_allclose(
            np.asarray(ds.preprocessed_values.todense()), expected, rtol=1e-6
        )

    def test_evaluation_subset_stratified(self, tmp_path):
        ds = DataSet("development", directory=str(tmp_path))
        ds.load()
        subset = indices_for_evaluation_subset(ds)
        assert len(subset) <= 25
        i1 = indices_for_evaluation_subset(ds)
        np.testing.assert_array_equal(subset, i1)

    def test_clear(self, tmp_path):
        ds = DataSet("development", directory=str(tmp_path))
        ds.load()
        ds.clear()
        assert not ds.has_values


class TestSupersetMapping:
    def test_infer(self):
        from scvae_tpu.data.dataset import _map_labels_to_superset_labels

        labels = np.array(["CD4 T cells", "CD8 T cells", "B cells"])
        out = _map_labels_to_superset_labels(labels, "infer")
        assert out is not None and len(out) == 3

    def test_explicit(self):
        from scvae_tpu.data.dataset import _map_labels_to_superset_labels

        labels = np.array(["1", "2", "0"])
        superset = {"Rods": ["1"], "Cones": ["2"], "No class": ["0"]}
        out = _map_labels_to_superset_labels(labels, superset)
        assert list(out) == ["Rods", "Cones", "No class"]
