"""Quality anchors at realistic (bench-shaped) scale + the download
branch of acquisition (round 4, VERDICT r03 items 2/5).

Round-3 quality evidence (golden bands, torch parity, the ARI gate) all
sat on the 25-gene ``development`` set; the bench claims performance at
F=2048.  These tests pin model quality at F=2048 with a planted-cluster
synthetic, and exercise ``acquire_data_set``'s HTTP download end-to-end
against a local server (reference ``scvae/data/loading.py:31-94``)."""

import io
import os
import tarfile
import threading

import numpy as np
import pytest

F = 2048
K = 4
GENES_PER_PROGRAM = 128


def planted_counts(n_cells, seed=0):
    """Poisson counts with K planted cluster programs: every cluster
    boosts its own disjoint block of genes 15× over the base rate —
    strongly separable, so a working GMVAE must recover the partition."""
    rng = np.random.RandomState(seed)
    labels = rng.randint(0, K, size=n_cells)
    base = np.full((K, F), 0.2, np.float32)
    for k in range(K):
        base[k, k * GENES_PER_PROGRAM:(k + 1) * GENES_PER_PROGRAM] = 3.0
    counts = rng.poisson(base[labels]).astype(np.float32)
    return counts, labels


def _dataset(counts, labels, kind):
    from scvae_tpu.data import DataSet

    n = counts.shape[0]
    return DataSet(
        "planted", title="planted clusters", specifications={},
        values=counts,
        labels=np.array([f"type {k}" for k in labels]),
        example_names=np.array([f"cell {i}" for i in range(n)]),
        feature_names=np.array([f"gene {j}" for j in range(F)]),
        kind=kind, version="original",
    )


@pytest.mark.slow
class TestPlantedClusterQuality:
    """Recorded bands (2026-08-21, CPU f32, seeds below): GMVAE ARI
    0.9839, training lower bound -1948 (epoch 1) → -1619 (epoch 10) —
    see PARITY.md §3.  The floors are far looser than the recorded
    values so reduction-order noise cannot trip them, yet far above
    failure (cluster collapse has ARI ≈ 0)."""

    def test_gmvae_recovers_planted_clusters_at_f2048(self, tmp_path):
        from scvae_tpu.analyses.metrics import adjusted_rand_index
        from scvae_tpu.models import GaussianMixtureVariationalAutoencoder

        counts, labels = planted_counts(6000, seed=0)
        train = _dataset(counts[:5000], labels[:5000], "training")
        valid = _dataset(counts[5000:5500], labels[5000:5500], "validation")
        test = _dataset(counts[5500:], labels[5500:], "test")

        model = GaussianMixtureVariationalAutoencoder(
            feature_size=F, latent_size=8, hidden_sizes=[64],
            reconstruction_distribution="negative binomial",
            number_of_latent_clusters=K,
            number_of_warm_up_epochs=3,
            log_directory=str(tmp_path / "models"),
        )
        result = model.train(
            train, valid, number_of_epochs=10, minibatch_size=512,
            seed=0, verbose=False, data_placement="device",
            track_accuracy=False,
        )
        transformed, _, _ = model.evaluate(
            test, minibatch_size=512, output_versions="all", verbose=False
        )
        to_id = test.class_name_to_class_id
        label_ids = np.array([to_id[n] for n in test.labels])
        ari = adjusted_rand_index(
            label_ids, transformed.predicted_cluster_ids
        )
        assert ari >= 0.83, (
            f"planted-cluster ARI {ari:.3f} below 0.83 at F={F} "
            "(recorded known-good 0.9839; floor = recorded − 0.15 per "
            "VERDICT r04 item 3 — protects against degradation, not "
            "just collapse)"
        )
        lb = result.history["training"]["lower_bound"][-1]
        assert lb > -1700, (
            f"final training lower bound {lb:.0f} below the F={F} band "
            "(recorded known-good -1619; epoch-1 value is already -1948)"
        )

    def test_vae_elbo_improves_at_f2048(self, tmp_path):
        from scvae_tpu.models import VariationalAutoencoder

        counts, labels = planted_counts(4000, seed=1)
        train = _dataset(counts[:3500], labels[:3500], "training")
        valid = _dataset(counts[3500:], labels[3500:], "validation")
        model = VariationalAutoencoder(
            feature_size=F, latent_size=8, hidden_sizes=[64],
            reconstruction_distribution="negative binomial",
            minibatch_normalisation=True,
            log_directory=str(tmp_path / "models"),
        )
        result = model.train(
            train, valid, number_of_epochs=6, minibatch_size=512,
            seed=0, verbose=False, data_placement="device",
        )
        curve = result.history["validation"]["lower_bound"]
        assert curve[-1] > curve[0] + 100, curve
        assert curve[-1] > -2600, curve


class TestHTTPAcquisition:
    """The download branch of ``acquire_data_set`` against a local HTTP
    server serving a miniature 10x CellRanger-v2 tarball, through the
    full ``DataSet`` path (URL spec → download → loader → cache)."""

    def _make_10x_targz_bytes(self, dense):
        n_genes, n_cells = dense.shape[1], dense.shape[0]
        coo = [
            (g + 1, c + 1, int(dense[c, g]))
            for c in range(n_cells)
            for g in range(n_genes)
            if dense[c, g]
        ]
        mtx = io.StringIO()
        mtx.write("%%MatrixMarket matrix coordinate integer general\n")
        mtx.write(f"{n_genes} {n_cells} {len(coo)}\n")
        for g, c, v in coo:
            mtx.write(f"{g} {c} {v}\n")
        files = {
            "mini/matrix.mtx": mtx.getvalue().encode(),
            "mini/genes.tsv": "".join(
                f"ENSG{j:08d}\tGene{j}\n" for j in range(n_genes)
            ).encode(),
            "mini/barcodes.tsv": "".join(
                f"BC{c:06d}-1\n" for c in range(n_cells)
            ).encode(),
        }
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w:gz") as tar:
            for name, payload in files.items():
                info = tarfile.TarInfo(name)
                info.size = len(payload)
                tar.addfile(info, io.BytesIO(payload))
        return buf.getvalue()

    def test_dataset_downloads_over_http(self, tmp_path):
        import functools
        import http.server
        import json

        from scvae_tpu.data import DataSet

        rng = np.random.RandomState(0)
        dense = rng.poisson(1.0, size=(30, 8)).astype(np.int64)
        dense[0, 0] = max(dense[0, 0], 1)  # at least one entry
        serve_dir = tmp_path / "www"
        serve_dir.mkdir()
        (serve_dir / "pbmc_mini.tar.gz").write_bytes(
            self._make_10x_targz_bytes(dense)
        )

        handler = functools.partial(
            http.server.SimpleHTTPRequestHandler,
            directory=str(serve_dir),
        )
        server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        try:
            port = server.server_address[1]
            spec_path = tmp_path / "mini_remote.json"
            spec_path.write_text(json.dumps({
                "URLs": {
                    "values": {
                        "full": f"http://127.0.0.1:{port}/pbmc_mini.tar.gz"
                    }
                },
                "format": "10x",
            }))
            ds = DataSet(
                str(spec_path), directory=str(tmp_path / "cache")
            )
            ds.load()
            assert ds.number_of_examples == 30
            assert ds.number_of_features == 8
            np.testing.assert_array_equal(
                np.asarray(ds.values.todense()), dense
            )
            # the downloaded archive landed in the originals directory
            downloaded = [
                os.path.join(root, name)
                for root, _, names in os.walk(tmp_path / "cache")
                for name in names
                if name.endswith(".tar.gz")
            ]
            assert downloaded, "downloaded archive not cached on disk"
        finally:
            server.shutdown()
            server.server_close()
