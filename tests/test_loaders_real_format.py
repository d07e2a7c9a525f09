"""Byte-faithful miniature archives in the real on-disk formats, driven
through the FULL ``DataSet`` path (parse → acquire → load → HDF5 cache →
split), not just the loader functions (round 3, VERDICT item 5; reference
``scvae/data/loaders.py:93-404``).

Formats covered: 10x MTX tar.gz (CellRanger v2 triplet), CellRanger v3
HDF5, loom, GEO-style transposed TSV (macosko layout) — plus one CLI
end-to-end train on the 10x tarball.
"""

import gzip
import io
import os
import subprocess
import sys
import tarfile

import numpy as np
import pytest
import scipy.sparse

from scvae_tpu.data import DataSet

N_CELLS = 60
N_GENES = 32


def _counts(seed=0):
    rng = np.random.RandomState(seed)
    dense = rng.poisson(0.8, size=(N_CELLS, N_GENES)).astype(np.int64)
    return dense


def _barcodes():
    return [f"AAACCTG{i:03d}-1" for i in range(N_CELLS)]


def _gene_ids():
    return [f"ENSG{i:011d}" for i in range(N_GENES)]


def _gene_names():
    return [f"Gene{i}" for i in range(N_GENES)]


# -- fixture builders -------------------------------------------------------


def make_10x_targz(path, dense):
    """CellRanger v2 tarball: matrix.mtx (genes×cells, MatrixMarket),
    genes.tsv, barcodes.tsv — gzipped members under a subdirectory, as
    10x distributes them."""
    m = scipy.sparse.coo_matrix(dense.T)  # genes × cells
    mtx = io.BytesIO()
    scipy.io.mmwrite(mtx, m, field="integer")
    genes = "\n".join(
        f"{i}\t{n}" for i, n in zip(_gene_ids(), _gene_names())
    ).encode() + b"\n"
    barcodes = ("\n".join(_barcodes()) + "\n").encode()

    with tarfile.open(path, "w:gz") as tar:
        for name, payload in [
            ("filtered_matrices/matrix.mtx.gz", gzip.compress(mtx.getvalue())),
            ("filtered_matrices/genes.tsv.gz", gzip.compress(genes)),
            ("filtered_matrices/barcodes.tsv.gz", gzip.compress(barcodes)),
        ]:
            info = tarfile.TarInfo(name)
            info.size = len(payload)
            tar.addfile(info, io.BytesIO(payload))


def make_cellranger_h5(path, dense):
    """CellRanger v3 HDF5: /matrix group with CSC genes×cells CSC pieces,
    /matrix/features/{id,name}, /matrix/barcodes."""
    import h5py

    csc = scipy.sparse.csc_matrix(dense.T)  # genes × cells
    with h5py.File(path, "w") as f:
        g = f.create_group("matrix")
        g.create_dataset("data", data=csc.data.astype(np.int32))
        g.create_dataset("indices", data=csc.indices.astype(np.int64))
        g.create_dataset("indptr", data=csc.indptr.astype(np.int64))
        g.create_dataset("shape", data=np.asarray(csc.shape, np.int32))
        g.create_dataset(
            "barcodes", data=np.array(_barcodes(), dtype="S")
        )
        feats = g.create_group("features")
        feats.create_dataset("id", data=np.array(_gene_ids(), dtype="S"))
        feats.create_dataset("name", data=np.array(_gene_names(), dtype="S"))
    return path


def make_loom(path, dense, with_labels=True):
    """Loom 2.x layout: /matrix genes×cells, /row_attrs/Gene,
    /col_attrs/{CellID,ClusterName}."""
    import h5py

    with h5py.File(path, "w") as f:
        f.create_dataset("matrix", data=dense.T.astype(np.float32))
        ra = f.create_group("row_attrs")
        ra.create_dataset("Gene", data=np.array(_gene_names(), dtype="S"))
        ca = f.create_group("col_attrs")
        ca.create_dataset("CellID", data=np.array(_barcodes(), dtype="S"))
        if with_labels:
            names = np.array(
                ["TypeA" if i % 2 else "TypeB" for i in range(N_CELLS)],
                dtype="S",
            )
            ca.create_dataset("ClusterName", data=names)
    return path


def make_geo_tsv(path, dense):
    """GEO supplementary-style gzipped TSV: gene rows × cell columns with
    a leading gene-name column (the Macosko retina layout)."""
    with gzip.open(path, "wt") as f:
        f.write("gene\t" + "\t".join(_barcodes()) + "\n")
        for i, name in enumerate(_gene_names()):
            f.write(name + "\t" + "\t".join(map(str, dense[:, i])) + "\n")
    return path


def _spec_json(tmp_path, filename, spec):
    import json

    path = str(tmp_path / filename)
    with open(path, "w") as f:
        json.dump(spec, f)
    return path


def _load(tmp_path, input_file, **kwargs):
    ds = DataSet(
        input_file, directory=str(tmp_path / "data_cache"), **kwargs
    )
    ds.load()
    return ds


# -- tests ------------------------------------------------------------------


class TestTenXTarball:
    def test_full_dataset_path(self, tmp_path):
        dense = _counts()
        tar_path = str(tmp_path / "pbmc_mini.tar.gz")
        make_10x_targz(tar_path, dense)
        spec = _spec_json(
            tmp_path, "pbmc_mini.json",
            {"values": "pbmc_mini.tar.gz", "format": "10x"},
        )
        ds = _load(tmp_path, spec)
        assert ds.number_of_examples == N_CELLS
        assert ds.number_of_features == N_GENES
        np.testing.assert_array_equal(
            np.asarray(ds.values.todense()), dense.astype(np.float32)
        )
        assert list(ds.example_names[:2]) == _barcodes()[:2]
        assert list(ds.feature_names[:2]) == _gene_names()[:2]

    def test_cache_round_trip(self, tmp_path):
        dense = _counts()
        tar_path = str(tmp_path / "pbmc_mini.tar.gz")
        make_10x_targz(tar_path, dense)
        spec = _spec_json(
            tmp_path, "pbmc_mini.json",
            {"values": "pbmc_mini.tar.gz", "format": "10x"},
        )
        ds1 = _load(tmp_path, spec)
        # second load hits the internal HDF5 cache
        ds2 = _load(tmp_path, spec)
        np.testing.assert_array_equal(
            np.asarray(ds1.values.todense()),
            np.asarray(ds2.values.todense()),
        )


class TestCellRangerH5:
    def test_full_dataset_path(self, tmp_path):
        dense = _counts(1)
        h5_path = str(tmp_path / "filtered_feature_bc_matrix.h5")
        make_cellranger_h5(h5_path, dense)
        spec = _spec_json(
            tmp_path, "mini_h5.json",
            {"values": "filtered_feature_bc_matrix.h5", "format": "h5"},
        )
        ds = _load(tmp_path, spec)
        assert ds.number_of_examples == N_CELLS
        np.testing.assert_array_equal(
            np.asarray(ds.values.todense()), dense.astype(np.float32)
        )
        assert list(ds.feature_names[:2]) == _gene_names()[:2]


class TestLoom:
    def test_full_dataset_path_with_labels(self, tmp_path):
        dense = _counts(2)
        loom_path = str(tmp_path / "mini.loom")
        make_loom(loom_path, dense)
        # loom archives are single-file ("all"), addressed via the URLs
        # spec form (acquire passes local paths through untouched)
        spec = _spec_json(
            tmp_path, "mini_loom.json",
            {"URLs": {"all": {"full": loom_path}}, "format": "loom"},
        )
        ds = _load(tmp_path, spec)
        assert ds.number_of_examples == N_CELLS
        np.testing.assert_array_equal(
            np.asarray(ds.values.todense()), dense.astype(np.float32)
        )
        assert set(ds.labels) == {"TypeA", "TypeB"}


class TestGeoTsv:
    def test_full_dataset_path(self, tmp_path):
        dense = _counts(3)
        tsv_path = str(tmp_path / "GSE_mini_expression.txt.gz")
        make_geo_tsv(tsv_path, dense)
        spec = _spec_json(
            tmp_path, "mini_geo.json",
            {"values": "GSE_mini_expression.txt.gz", "format": "matrix_fbe"},
        )
        ds = _load(tmp_path, spec)
        assert ds.number_of_examples == N_CELLS
        assert ds.number_of_features == N_GENES
        np.testing.assert_array_equal(
            np.asarray(ds.values.todense()), dense.astype(np.float32)
        )


class TestCLIEndToEnd:
    def test_train_on_10x_tarball(self, tmp_path):
        dense = _counts(4)
        tar_path = str(tmp_path / "pbmc_cli.tar.gz")
        make_10x_targz(tar_path, dense)
        spec = _spec_json(
            tmp_path, "pbmc_cli.json",
            {"values": "pbmc_cli.tar.gz", "format": "10x"},
        )
        env = dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=1",
        )
        # A TPU-terminal sitecustomize (PYTHONPATH) force-selects the
        # hardware backend via jax.config.update, overriding the env —
        # strip it so the subprocess really runs on CPU.
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["PYTHONPATH"] = ""
        
        out = subprocess.run(
            [
                sys.executable, "-m", "scvae_tpu", "train", spec,
                "--data-directory", str(tmp_path / "cli_data"),
                "--models-directory", str(tmp_path / "cli_models"),
                "--split-data-set", "--number-of-epochs", "2",
                "--minibatch-size", "16", "--latent-size", "2",
                "--hidden-sizes", "8",
            ],
            capture_output=True, text=True, timeout=560,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            env=env,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        assert "Epoch 2/2" in out.stdout or "Epoch 2/2" in out.stderr
