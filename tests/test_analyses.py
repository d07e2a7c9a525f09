"""Analyses-layer tests: clustering metrics, summary statistics,
decomposition, prediction, figures, orchestrators, cross-analysis."""

import os

import numpy as np
import pytest

from scvae_tpu.analyses import (
    PredictionSpecifications,
    analyse_data,
    analyse_model,
    analyse_results,
    cross_analyse,
    decompose,
    map_cluster_ids_to_label_ids,
    predict_labels,
)
from scvae_tpu.analyses import figures, metrics
from scvae_tpu.data import DataSet


@pytest.fixture(scope="module")
def dev_split(tmp_path_factory):
    directory = str(tmp_path_factory.mktemp("data"))
    ds = DataSet(
        "development", directory=directory, example_filter=["random", 400]
    )
    return ds.split(method="random", fraction=0.9)


class TestClusteringMetrics:
    def test_ari_perfect(self):
        labels = np.array(["a", "a", "b", "b"])
        assert metrics.adjusted_rand_index(labels, np.array([1, 1, 2, 2])) == 1.0

    def test_ari_excludes_classes(self):
        labels = np.array(["a", "a", "b", "No class"])
        pred = np.array([1, 1, 2, 7])
        v1 = metrics.adjusted_rand_index(labels, pred, ["No class"])
        assert v1 == 1.0

    def test_accuracy(self):
        labels = np.array(["a", "b", "b"])
        pred = np.array(["a", "b", "a"])
        assert metrics.accuracy(labels, pred) == pytest.approx(2 / 3)

    def test_silhouette_degenerate(self):
        values = np.random.RandomState(0).rand(5, 3)
        assert np.isnan(metrics.silhouette_score(values, np.ones(5)))

    def test_compute_clustering_metrics(self, dev_split):
        _, _, test_set = dev_split
        rng = np.random.RandomState(0)
        test_set.update_predictions(
            predicted_cluster_ids=rng.randint(0, 3, test_set.number_of_examples)
        )
        out = metrics.compute_clustering_metrics(test_set)
        assert out["adjusted Rand index"]["clusters"] is not None
        assert out["silhouette score"]["clusters"] is not None
        test_set.reset_predictions()


class TestSummary:
    def test_summary_statistics_sparse_vs_dense(self, dev_split):
        train, _, _ = dev_split
        dense = np.asarray(train.values.todense())
        s_sparse = metrics.summary_statistics(train.values, name="sparse")
        s_dense = metrics.summary_statistics(dense, name="dense", tolerance=0)
        assert s_sparse["mean"] == pytest.approx(s_dense["mean"], rel=1e-6)
        assert s_sparse["standard deviation"] == pytest.approx(
            s_dense["standard deviation"], rel=1e-5
        )
        table = metrics.format_summary_statistics([s_sparse, s_dense])
        assert "sparse" in table and "mean" in table


class TestDecomposition:
    def test_pca_shapes_and_aux(self):
        rng = np.random.RandomState(0)
        values = rng.randn(100, 10).astype(np.float32)
        other = {"valid": rng.randn(20, 10).astype(np.float32)}
        centroids = {
            "prior": {
                "means": rng.randn(3, 10),
                "covariance_matrices": np.stack([np.eye(10)] * 3),
            }
        }
        decomposed, other_dec, cent_dec = decompose(
            values, other_value_sets=other, centroids=centroids,
            method="PCA", number_of_components=2,
        )
        assert decomposed.shape == (100, 2)
        assert other_dec["valid"].shape == (20, 2)
        assert cent_dec["prior"]["means"].shape == (3, 2)
        assert cent_dec["prior"]["covariance_matrices"].shape == (3, 2, 2)

    @pytest.mark.parametrize("method", ["PCA", "SVD", "ICA"])
    def test_methods(self, method):
        values = np.random.RandomState(0).rand(50, 8).astype(np.float32)
        out = decompose(values, method=method, number_of_components=2)
        assert out.shape == (50, 2)

    def test_tsne(self):
        values = np.random.RandomState(0).rand(60, 5).astype(np.float32)
        out = decompose(values, method="t-SNE", number_of_components=2)
        assert out.shape == (60, 2)


class TestPrediction:
    def test_majority_vote(self):
        label_ids = np.array([0, 0, 1, 1, 1, 2])
        cluster_ids = np.array([5, 5, 5, 7, 7, 7])
        out = map_cluster_ids_to_label_ids(label_ids, cluster_ids)
        np.testing.assert_array_equal(out, [0, 0, 0, 1, 1, 1])

    def test_majority_vote_excludes(self):
        label_ids = np.array([9, 0, 1, 1])
        cluster_ids = np.array([5, 5, 5, 5])
        out = map_cluster_ids_to_label_ids(label_ids, cluster_ids, [9])
        assert set(out) == {1}

    def test_specifications_name(self):
        spec = PredictionSpecifications("kmeans", number_of_clusters=4)
        assert spec.method == "k-means"
        assert spec.name == "kmeans_4"

    def test_kmeans_predict_labels(self, dev_split):
        train, _, test = dev_split
        cluster_ids, predicted_labels, predicted_superset = predict_labels(
            train, test, method="k-means",
            number_of_clusters=3,
        )
        assert cluster_ids.shape == (test.number_of_examples,)
        assert predicted_labels is not None
        assert predicted_superset is not None


class TestFigures:
    def test_learning_curves(self, tmp_path):
        curves = {
            "training": {"lower_bound": [-10, -8, -7], "kl_divergence": [1, 2, 3]},
            "validation": {"lower_bound": [-11, -9, -8]},
        }
        path = figures.plot_learning_curves(curves, directory=str(tmp_path))
        assert os.path.exists(path)

    def test_scatter_with_centroids(self, tmp_path):
        rng = np.random.RandomState(0)
        values = rng.randn(100, 2)
        labels = rng.choice(["a", "b"], 100)
        centroids = {
            "means": rng.randn(2, 2),
            "covariance_matrices": np.stack([np.eye(2)] * 2),
        }
        path = figures.plot_values(
            values, colour_coding=labels, centroids=centroids,
            directory=str(tmp_path),
        )
        assert os.path.exists(path)

    def test_histograms_and_heatmap(self, tmp_path):
        rng = np.random.RandomState(0)
        values = rng.poisson(2, (50, 10)).astype(float)
        assert os.path.exists(
            figures.plot_cutoff_count_histogram(values, directory=str(tmp_path))
        )
        assert os.path.exists(
            figures.plot_class_histogram(
                rng.choice(["x", "y"], 50), directory=str(tmp_path)
            )
        )
        assert os.path.exists(
            figures.plot_heat_map(
                values, labels=rng.choice(["x", "y"], 50),
                directory=str(tmp_path),
            )
        )

    def test_profile_comparison(self, tmp_path):
        rng = np.random.RandomState(0)
        observed = rng.poisson(3, 30).astype(float)
        expected = observed + rng.randn(30) * 0.3
        path = figures.plot_profile_comparison(
            observed, expected,
            expected_total_standard_deviations=np.full(30, 1.0),
            directory=str(tmp_path),
        )
        assert os.path.exists(path)


class TestOrchestrators:
    def test_analyse_data(self, dev_split, tmp_path):
        train, valid, test = dev_split
        results = analyse_data(
            [train, valid],
            included_analyses="standard",
            analyses_directory=str(tmp_path / "analyses"),
        )
        assert len(results["statistics"]) == 2
        assert results["figures"]

    def test_full_result_pipeline_with_cross_analysis(self, dev_split, tmp_path):
        from scvae_tpu.models import GaussianMixtureVariationalAutoencoder

        train, valid, test = dev_split
        model = GaussianMixtureVariationalAutoencoder(
            feature_size=25, latent_size=2, hidden_sizes=[16],
            reconstruction_distribution="negative binomial",
            number_of_latent_clusters=3,
            log_directory=str(tmp_path / "models"),
        )
        model.train(
            train, valid, number_of_epochs=2, minibatch_size=64, verbose=False
        )
        analyses_directory = str(tmp_path / "analyses")

        model_results = analyse_model(
            model, analyses_directory=analyses_directory
        )
        assert model_results["figures"]

        transformed, reconstructed, latent = model.evaluate(
            test, minibatch_size=64, verbose=False
        )
        spec = PredictionSpecifications(
            "model", number_of_clusters=3, training_set_kind="training"
        )
        transformed.update_predictions(prediction_specifications=spec)
        results = analyse_results(
            transformed,
            reconstructed,
            latent,
            model,
            included_analyses="all",
            evaluation_subset_indices=np.arange(3),
            analyses_directory=analyses_directory,
        )
        directory = results["directory"]
        assert os.path.exists(os.path.join(directory, "test-metrics.pkl.gz"))
        assert any(
            name.startswith("test-prediction") and name.endswith(".pkl.gz")
            for name in os.listdir(directory)
        )

        table = cross_analyse(analyses_directory, log_summary=True)
        assert len(table) == 1
        assert "ELBO" in table.columns
        assert "ARI" in table.columns


class TestCrossAnalysisAggregation:
    """Synthetic analyses trees exercising filtering, spec parsing, and the
    cross-model figures without training any model."""

    @staticmethod
    def _write_run(
        base,
        rel_path,
        elbo,
        ari=None,
        epochs=5,
        method="k-means",
        classes=5,
        silhouette=None,
    ):
        import gzip
        import pickle

        directory = os.path.join(str(base), rel_path)
        os.makedirs(directory, exist_ok=True)
        metrics_dict = {
            "evaluation": {
                "lower_bound": [elbo],
                "reconstruction_error": [elbo + 1.0],
                "kl_divergence": [1.0],
            },
            "number of epochs trained": epochs,
        }
        with gzip.open(
            os.path.join(directory, "test-metrics.pkl.gz"), "w"
        ) as f:
            pickle.dump(metrics_dict, f)
        if ari is not None:
            prediction = {
                "prediction method": method,
                "number of classes": classes,
                "clustering metric values": {
                    "adjusted Rand index": {
                        "clusters": ari,
                        "clusters; superset": ari + 0.05,
                    },
                    "adjusted mutual information": {"clusters": ari - 0.01},
                    "silhouette score": {"clusters": silhouette},
                },
            }
            with gzip.open(
                os.path.join(
                    directory, f"test-prediction-{method}.pkl.gz"
                ),
                "w",
            ) as f:
                pickle.dump(prediction, f)

    def test_spec_parsing_filtering_and_figures(self, tmp_path):
        base = tmp_path / "analyses"
        runs = [
            ("dev/VAE/gaussian/poisson-l_2-h_100-mc_1-iw_1", -120.0, 0.4, 5),
            ("dev/VAE/gaussian/poisson-l_10-h_100-mc_1-iw_1", -110.0, 0.5, 5),
            (
                "dev/VAE/gaussian/negative_binomial-l_2-h_100-mc_1-iw_1",
                -100.0,
                0.6,
                5,
            ),
            (
                "dev/VAE/gaussian/negative_binomial-l_10-h_100-mc_1-iw_1",
                -95.0,
                0.7,
                5,
            ),
            (
                "dev/GMVAE/gaussian_mixture-c_5/"
                "negative_binomial-l_10-h_100-mc_1-iw_1/run_a/best",
                -90.0,
                0.8,
                40,
            ),
        ]
        for rel, elbo, ari, epochs in runs:
            self._write_run(base, rel, elbo, ari, epochs)

        table = cross_analyse(str(base), log_summary=True)
        assert len(table) == 5
        # Best ELBO first
        assert table["ELBO"].iloc[0] == -90.0
        # Parsed specifications
        gm_rows = table[table["model type"] == "GMVAE"]
        assert len(gm_rows) == 1
        assert gm_rows["clusters"].iloc[0] == 5
        assert gm_rows["latent size"].iloc[0] == 10
        assert gm_rows["run"].iloc[0] == "a"
        assert gm_rows["version"].iloc[0] == "best"
        assert set(table["reconstruction distribution"]) == {
            "poisson",
            "negative_binomial",
        }
        assert set(table["data set"]) == {"dev"}
        cross_dir = base / "cross_analysis" / "all"
        assert (cross_dir / "comparison.csv").exists()
        assert (cross_dir / "all.log").exists()
        # Three cross-model figure families + correlations (round-2 item 8)
        assert (cross_dir / "correlations_dev.png").exists()
        assert (cross_dir / "elbo_heat_map_dev.png").exists()
        assert (cross_dir / "model_metrics_dev_elbo.png").exists()
        assert (cross_dir / "model_metrics_dev_enre.png").exists()
        assert (cross_dir / "model_metrics_dev_kl_z.png").exists()
        assert (
            cross_dir / "model_metric_sets_dev_standard_ari_elbo.png"
        ).exists()
        assert (
            cross_dir / "model_metric_sets_dev_superset_ari_elbo.png"
        ).exists()
        # Summary log carries the aggregated comparison table
        log = (cross_dir / "all.log").read_text()
        assert "Comparison" in log
        assert "GMVAE(5)" in log
        assert "VAE(G)" in log
        assert "kM(5)" in log  # clustering-method title
        assert "OP" in log  # best → optimal parameters abbreviation

    def test_runs_aggregate_to_mean_sd_and_baselines(self, tmp_path):
        """≥3 named runs aggregate into a mean±sd comparison row; other-
        method baselines appear in the log and the metric-set figures
        (reference cross_analysis.py:536-546, 1385-1529)."""
        import gzip
        import pickle

        base = tmp_path / "analyses"
        ds = "development/no_preprocessing/split-random_0.9"
        for run, elbo in (("a", -100.0), ("b", -102.0), ("c", -104.0)):
            self._write_run(
                base,
                f"{ds}/VAE/gaussian/negative_binomial-l_10-h_100-mc_1-iw_1"
                f"/run_{run}/e_20-mc_1-iw_1",
                elbo,
                0.6,
                epochs=20,
                silhouette=0.3,
            )
        # Baseline method directory inside the data-set directory
        method_dir = base / ds / "seurat"
        os.makedirs(method_dir, exist_ok=True)
        with gzip.open(
            os.path.join(method_dir, "test-prediction-seurat.pkl.gz"), "w"
        ) as f:
            pickle.dump(
                {
                    "prediction method": "Seurat",
                    "number of classes": 7,
                    "clustering metric values": {
                        "adjusted Rand index": {"clusters": 0.55}
                    },
                },
                f,
            )

        table = cross_analyse(
            str(base), other_methods=["seurat"], log_summary=True
        )
        assert len(table) == 3  # one flat row per run
        cross_dir = base / "cross_analysis" / "all"
        log = (cross_dir / "all.log").read_text()
        assert "-102±2" in log  # mean ± sd over the three runs
        assert "Other methods:" in log
        assert "Seurat" in log
        baseline_figures = [
            p
            for p in os.listdir(cross_dir)
            if "other_methods" in p and p.endswith(".png")
        ]
        assert baseline_figures

    def test_epoch_cut_off_and_string_filters(self, tmp_path):
        base = tmp_path / "analyses"
        self._write_run(
            base, "dev/VAE/gaussian/poisson-l_2-h_100", -120.0, 0.4, epochs=5
        )
        self._write_run(
            base,
            "dev/GMVAE/gaussian_mixture-c_5/poisson-l_2-h_100",
            -90.0,
            0.8,
            epochs=50,
        )
        table = cross_analyse(str(base), epoch_cut_off=10, log_summary=False)
        assert len(table) == 1
        assert table["model type"].iloc[0] == "VAE"

        table = cross_analyse(
            str(base), model_excluded_strings=["GMVAE"], log_summary=False
        )
        assert len(table) == 1

        table = cross_analyse(
            str(base),
            prediction_excluded_strings=["k-means"],
            log_summary=False,
        )
        assert "ARI" not in table.columns


class TestAllAnalysisKindsProduceArtifacts:
    """Every key in ANALYSIS_GROUPS['all'] must produce artifacts — no
    silent no-ops (round-2 item 2; reference analyses.py:750-1607)."""

    @pytest.fixture(scope="class")
    def trained(self, tmp_path_factory):
        from scvae_tpu.data import DataSet
        from scvae_tpu.models import GaussianMixtureVariationalAutoencoder

        tmp = tmp_path_factory.mktemp("all_kinds")
        ds = DataSet(
            "development", directory=str(tmp / "data"),
            example_filter=["random", 300],
        )
        train, valid, test = ds.split(method="random", fraction=0.9)
        model = GaussianMixtureVariationalAutoencoder(
            feature_size=25, latent_size=3, hidden_sizes=[16],
            reconstruction_distribution="negative binomial",
            number_of_latent_clusters=3,
            minibatch_normalisation=True,
            log_directory=str(tmp / "models"),
        )
        model.train(train, valid, number_of_epochs=3, minibatch_size=64,
                    verbose=False)
        return tmp, model, train, valid, test

    def test_unknown_analysis_kind_raises(self, trained):
        from scvae_tpu import analyses

        tmp, model, train, valid, test = trained
        with pytest.raises(ValueError, match="Unknown analysis"):
            analyses.analyse_data(
                [train], included_analyses=["not_a_kind"],
                analyses_directory=str(tmp / "a"),
            )

    def test_analyse_data_all(self, trained):
        from scvae_tpu import analyses

        tmp, model, train, valid, test = trained
        adir = str(tmp / "analyses_data")
        analyses.analyse_data(
            [train], included_analyses="all", analyses_directory=adir
        )
        import glob

        paths = glob.glob(adir + "/**/*.png", recursive=True)
        names = "\n".join(paths)
        for expected in (
            "count_histogram", "class_histogram", "heat_map", "distances",
            "feature_value_standard_deviations",
        ):
            assert expected in names, f"missing {expected} artifact"

    def test_analyse_model_and_results_all(self, trained):
        import glob

        from scvae_tpu import analyses

        tmp, model, train, valid, test = trained
        adir = str(tmp / "analyses_results")
        model_results = analyses.analyse_model(
            model, included_analyses="all", analyses_directory=adir
        )
        model_names = "\n".join(model_results["figures"])
        # KL-neuron evolution heat map wired (round-1 dead code)
        assert "kl_divergence_evolution" in model_names
        assert "centroid_means_evolution" in model_names
        assert "centroid_covariance_evolution" in model_names
        # Separate per-loss-set learning-curve overlays
        # (reference analyses.py:373-392)
        assert "learning_curves_lower_bound_reconstruction_error" in model_names
        assert "learning_curves_kl_divergence" in model_names

        outputs = model.evaluate(
            test, minibatch_size=64, output_versions="all", verbose=False
        )
        transformed, reconstructed, latent = outputs
        results = analyses.analyse_results(
            transformed, reconstructed, latent, model,
            included_analyses="all", analyses_directory=adir,
        )
        names = "\n".join(str(p) for p in results["figures"])
        for expected in (
            "latent_space", "heat_map", "distances", "count_histogram",
            "latent_correlations", "latent_features", "latent_scatter_matrix",
            "pca_test_reconstructed",  # decomposition grid of x̂
        ):
            assert expected in names, f"missing {expected} artifact"
        # prediction TSV export (subanalyses.analyse_predictions wired)
        tsvs = glob.glob(adir + "/**/predictions_*.tsv*", recursive=True)
        assert tsvs, "missing prediction TSV export"
        # metrics pickles for cross-analysis
        assert glob.glob(adir + "/**/test-metrics.pkl.gz", recursive=True)
