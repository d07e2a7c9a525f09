"""Sharding tests on the 8-virtual-device CPU mesh: single- vs multi-device
gradient equivalence, mesh construction, model-axis TP (SURVEY.md §4 item 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scvae_tpu.models import create_train_state, make_optimizer, make_train_step
from scvae_tpu.models import gmvae, vae
from scvae_tpu.parallel import (
    batch_sharding,
    create_mesh,
    param_shardings,
    shard_batch,
    shard_train_state,
)


def make_batch(np_rng, b=32, f=16):
    x = np_rng.poisson(2.0, size=(b, f)).astype(np.float32)
    cs = x.sum(axis=1, keepdims=True)
    return {
        "x": jnp.asarray(x),
        "t": jnp.asarray(x),
        "count_sum": jnp.asarray(cs),
        "count_sum_feature": jnp.asarray(cs / max(cs.max(), 1.0)),
    }


def test_eight_cpu_devices_available():
    assert jax.device_count() == 8


def test_create_mesh_shapes():
    mesh = create_mesh()
    assert mesh.shape == {"data": 8, "model": 1}
    mesh2 = create_mesh(model_parallelism=2)
    assert mesh2.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        create_mesh(model_parallelism=3)


def test_param_shardings_rules(rng):
    config = vae.VAEConfig(
        feature_size=16, latent_size=2, hidden_sizes=(8,),
        reconstruction_distribution="negative binomial",
        number_of_reconstruction_classes=3,
        minibatch_normalisation=False,
    )
    params, _ = vae.init(config, rng)
    mesh = create_mesh(model_parallelism=2)
    shardings = param_shardings(params, mesh)
    # reconstruction head kernels sharded on the gene axis
    recon = shardings["reconstruction"]["p"]["kernel"]
    assert recon.spec == jax.sharding.PartitionSpec(None, "model")
    # encoder replicated
    enc = shardings["encoder"]["layers"][0]["kernel"]
    assert enc.spec == jax.sharding.PartitionSpec()


class TestDataParallelEquivalence:
    def _run(self, mesh, np_rng, steps=3):
        config = vae.VAEConfig(
            feature_size=16, latent_size=2, hidden_sizes=(8,),
            reconstruction_distribution="poisson",
            minibatch_normalisation=True,
        )
        rng = jax.random.PRNGKey(0)
        params, state = vae.init(config, rng)
        optimizer = make_optimizer(1e-2)
        ts = create_train_state(params, state, optimizer)
        if mesh is not None:
            ts = shard_train_state(ts, mesh)

        def loss(params, model_state, batch, rng, wuw):
            return vae.loss_fn(
                config, params, model_state, batch, rng, warm_up_weight=wuw
            )

        train_step = make_train_step(loss, optimizer, donate=False)
        batch = make_batch(np_rng)
        if mesh is not None:
            batch = shard_batch(batch, mesh)
        metrics = None
        for i in range(steps):
            ts, metrics = train_step(ts, batch, jax.random.PRNGKey(100 + i), 1.0)
        return ts, metrics

    def test_sharded_matches_unsharded_metrics(self, np_rng):
        ts_single, m_single = self._run(None, np.random.RandomState(7))
        mesh = create_mesh()
        ts_shard, m_shard = self._run(mesh, np.random.RandomState(7))
        np.testing.assert_allclose(
            float(m_single["lower_bound"]),
            float(m_shard["lower_bound"]),
            rtol=5e-4,
        )

    def test_sharded_gradients_match_unsharded(self, np_rng):
        # Gradient equivalence without the Adam sign-amplification of
        # reduction-order noise: one value_and_grad on both layouts.
        config = vae.VAEConfig(
            feature_size=16, latent_size=2, hidden_sizes=(8,),
            reconstruction_distribution="poisson",
            minibatch_normalisation=True,
        )
        rng = jax.random.PRNGKey(0)
        params, state = vae.init(config, rng)
        batch = make_batch(np.random.RandomState(7))

        def loss(params, batch):
            value, _ = vae.loss_fn(
                config, params, state, batch, jax.random.PRNGKey(5),
                warm_up_weight=1.0,
            )
            return value

        grad_fn = jax.jit(jax.grad(loss))
        g_single = grad_fn(params, batch)

        mesh = create_mesh()
        params_sharded = jax.tree_util.tree_map(
            lambda leaf, s: jax.device_put(leaf, s),
            params,
            param_shardings(params, mesh),
        )
        g_sharded = grad_fn(params_sharded, shard_batch(batch, mesh))

        for a, b in zip(
            jax.tree_util.tree_leaves(g_single),
            jax.tree_util.tree_leaves(g_sharded),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
            )

    def test_model_axis_sharding_runs(self, np_rng):
        config = vae.VAEConfig(
            feature_size=16, latent_size=2, hidden_sizes=(8,),
            reconstruction_distribution="negative binomial",
            minibatch_normalisation=True,
        )
        mesh = create_mesh(model_parallelism=2)
        rng = jax.random.PRNGKey(0)
        params, state = vae.init(config, rng)
        optimizer = make_optimizer(1e-3)
        ts = shard_train_state(
            create_train_state(params, state, optimizer), mesh
        )

        def loss(params, model_state, batch, rng, wuw):
            return vae.loss_fn(
                config, params, model_state, batch, rng, warm_up_weight=wuw
            )

        train_step = make_train_step(loss, optimizer, donate=False)
        batch = shard_batch(make_batch(np_rng), mesh)
        ts, metrics = train_step(ts, batch, jax.random.PRNGKey(1), 1.0)
        assert np.isfinite(float(metrics["lower_bound"]))

    def test_gmvae_sharded_step(self, np_rng):
        config = gmvae.GMVAEConfig(
            feature_size=16, latent_size=2, hidden_sizes=(8,),
            reconstruction_distribution="negative binomial",
            number_of_latent_clusters=3,
            minibatch_normalisation=True,
        )
        mesh = create_mesh()
        rng = jax.random.PRNGKey(0)
        params, state = gmvae.init(config, rng)
        optimizer = make_optimizer(1e-3)
        ts = shard_train_state(
            create_train_state(params, state, optimizer), mesh
        )

        def loss(params, model_state, batch, rng, wuw):
            return gmvae.loss_fn(
                config, params, model_state, batch, rng, warm_up_weight=wuw
            )

        train_step = make_train_step(loss, optimizer, donate=False)
        batch = shard_batch(make_batch(np_rng), mesh)
        ts, metrics = train_step(ts, batch, jax.random.PRNGKey(1), 1.0)
        assert np.isfinite(float(metrics["lower_bound"]))


class TestMeshThroughAPI:
    """DP+TP reachable from the user-facing API (round-2 item 1): the same
    ``train()``/``evaluate()`` calls, with a mesh, must reproduce the
    single-device learning curves on the 8-virtual-device CPU mesh."""

    @pytest.fixture(scope="class")
    def dev_sets(self, tmp_path_factory):
        from scvae_tpu.data import DataSet

        directory = str(tmp_path_factory.mktemp("data"))
        ds = DataSet(
            "development", directory=directory,
            example_filter=["random", 600],
        )
        return ds.split(method="random", fraction=0.9)

    def _train(self, tmp_path, dev_sets, mesh, tag, model_cls=None, **model_kwargs):
        from scvae_tpu.models import VariationalAutoencoder

        train, valid, _ = dev_sets
        cls = model_cls or VariationalAutoencoder
        model = cls(
            feature_size=25, latent_size=2, hidden_sizes=[16],
            reconstruction_distribution="negative binomial",
            minibatch_normalisation=True,
            log_directory=str(tmp_path / f"models_{tag}"),
            **model_kwargs,
        )
        result = model.train(
            train, valid, number_of_epochs=3, minibatch_size=64,
            seed=0, verbose=False, mesh=mesh,
        )
        return model, result

    def test_train_api_mesh_matches_single_device(self, tmp_path, dev_sets):
        _, r_single = self._train(tmp_path, dev_sets, None, "single")
        mesh = create_mesh(model_parallelism=2)
        _, r_mesh = self._train(tmp_path, dev_sets, mesh, "mesh")
        np.testing.assert_allclose(
            r_single.history["validation"]["lower_bound"],
            r_mesh.history["validation"]["lower_bound"],
            rtol=2e-3,
        )
        np.testing.assert_allclose(
            r_single.history["training"]["lower_bound"],
            r_mesh.history["training"]["lower_bound"],
            rtol=2e-3,
        )

    def test_evaluate_api_mesh_matches_single_device(self, tmp_path, dev_sets):
        _, _, test = dev_sets
        m_single, _ = self._train(tmp_path, dev_sets, None, "eval_single")
        mesh = create_mesh()
        m_mesh, _ = self._train(tmp_path, dev_sets, mesh, "eval_mesh")
        m_single.evaluate(
            test, minibatch_size=64, output_versions="latent", verbose=False
        )
        m_mesh.evaluate(
            test, minibatch_size=64, output_versions="latent",
            verbose=False, number_of_devices=8,
        )
        np.testing.assert_allclose(
            m_single._last_evaluation_metrics["lower_bound"],
            m_mesh._last_evaluation_metrics["lower_bound"],
            rtol=2e-3,
        )

    def test_gmvae_train_api_mesh(self, tmp_path, dev_sets):
        from scvae_tpu.models import GaussianMixtureVariationalAutoencoder

        _, r_single = self._train(
            tmp_path, dev_sets, None, "gm_single",
            model_cls=GaussianMixtureVariationalAutoencoder,
            number_of_latent_clusters=3,
        )
        mesh = create_mesh(model_parallelism=2)
        _, r_mesh = self._train(
            tmp_path, dev_sets, mesh, "gm_mesh",
            model_cls=GaussianMixtureVariationalAutoencoder,
            number_of_latent_clusters=3,
        )
        np.testing.assert_allclose(
            r_single.history["validation"]["lower_bound"],
            r_mesh.history["validation"]["lower_bound"],
            rtol=5e-3,
        )
        # accuracy tracking ran under the mesh too
        assert "accuracy" in r_mesh.history["validation"]

    def test_streaming_pipeline_mesh(self, tmp_path, dev_sets):
        """Force the streaming path under a mesh (data_placement)."""
        from scvae_tpu.models import VariationalAutoencoder

        train, valid, _ = dev_sets
        model = VariationalAutoencoder(
            feature_size=25, latent_size=2, hidden_sizes=[16],
            reconstruction_distribution="poisson",
            minibatch_normalisation=True,
            log_directory=str(tmp_path / "models_stream"),
        )
        result = model.train(
            train, valid, number_of_epochs=2, minibatch_size=64,
            seed=0, verbose=False, number_of_devices=8,
            data_placement="streaming",
        )
        assert np.isfinite(result.history["validation"]["lower_bound"][-1])


class TestShardedResume:
    """Preemption-safe resume under a mesh (round 3, VERDICT item 7;
    SURVEY §5.3-5.4): train 2 epochs sharded, 'kill', resume for 2 more
    under (a) the same mesh and (b) a DIFFERENT device count — the
    4-epoch curve must match an uninterrupted 4-epoch run (modulo
    f32 reduction-order noise across shardings)."""

    @pytest.fixture(scope="class")
    def dev_sets(self, tmp_path_factory):
        from scvae_tpu.data import DataSet

        directory = str(tmp_path_factory.mktemp("data"))
        ds = DataSet(
            "development", directory=directory,
            example_filter=["random", 600],
        )
        return ds.split(method="random", fraction=0.9)

    def _model(self, tmp_path, tag):
        from scvae_tpu.models import VariationalAutoencoder

        return VariationalAutoencoder(
            feature_size=25, latent_size=2, hidden_sizes=[16],
            reconstruction_distribution="negative binomial",
            minibatch_normalisation=True,
            log_directory=str(tmp_path / f"models_{tag}"),
        )

    @pytest.mark.parametrize("resume_mesh_devices", [8, 4])
    def test_resume_continues_curve(self, tmp_path, dev_sets,
                                    resume_mesh_devices):
        train, valid, _ = dev_sets
        kwargs = dict(minibatch_size=64, seed=0, verbose=False)
        mesh_a = create_mesh()  # 8 devices

        # uninterrupted baseline
        baseline = self._model(tmp_path, f"base_{resume_mesh_devices}")
        r_full = baseline.train(
            train, valid, number_of_epochs=4, mesh=mesh_a, **kwargs
        )

        # interrupted: 2 epochs, new process would restore from disk —
        # here a fresh model object (state only from checkpoints)
        tag = f"resume_{resume_mesh_devices}"
        m1 = self._model(tmp_path, tag)
        m1.train(train, valid, number_of_epochs=2, mesh=mesh_a, **kwargs)

        m2 = self._model(tmp_path, tag)  # same log dir → resumes
        mesh_b = create_mesh(
            devices=jax.devices()[:resume_mesh_devices]
        )
        r_resumed = m2.train(
            train, valid, number_of_epochs=4, mesh=mesh_b, **kwargs
        )

        assert len(r_resumed.history["validation"]["lower_bound"]) == 4
        np.testing.assert_allclose(
            r_full.history["validation"]["lower_bound"],
            r_resumed.history["validation"]["lower_bound"],
            rtol=2e-3,
        )
