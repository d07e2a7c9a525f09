"""Mesh-composable TPU fast paths (round-4 flagship; VERDICT r03 item 1).

The packed row-DMA gather and the fused likelihood kernels are Pallas
custom calls GSPMD cannot partition; these tests prove their shard_map
wrappers (``ops.gather`` sharded ``PackedRows``, ``ops.sharded``) compose
with a (data, model) mesh — in TPU interpreter mode on the 8-virtual-
device CPU platform — and that training through the public API with both
fast paths forced on matches the fallback paths exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import NamedSharding, PartitionSpec as P

from scvae_tpu.parallel import create_mesh


@pytest.fixture(scope="module")
def mesh():
    """Full 8-virtual-device mesh (data=4, model=2) — used where the
    interpret machinery tolerates 8 concurrent device threads (the
    row-DMA gather kernel)."""
    return create_mesh(model_parallelism=2)  # (data=4, model=2)


@pytest.fixture(scope="module")
def mesh4():
    """(data=2, model=2) mesh for the fused-kernel interpret tests: the
    TPU interpreter takes a global barrier across all manual devices per
    pallas_call, which deadlocks for the operand-heavy fused kernels at
    8 concurrent virtual devices on a 2-core host (the gather kernel is
    fine at 8).  Four devices exercise the identical composition — both
    mesh axes, the model-axis psum, and data stratification."""
    import jax

    return create_mesh(devices=jax.devices()[:4], model_parallelism=2)


def _stratified_idx(rng, n_per_shard, block, shards):
    return np.concatenate(
        [
            rng.permutation(n_per_shard)[:block] + d * n_per_shard
            for d in range(shards)
        ]
    ).astype(np.int32)


class TestShardedPackedGather:
    @pytest.mark.parametrize("dtype,f", [(np.float32, 1024),
                                         (np.int16, 2048)])
    def test_gather_parity(self, mesh, dtype, f):
        from scvae_tpu.ops.gather import gather_rows, pack_rows

        n = 64  # 16 rows/shard
        rng = np.random.RandomState(0)
        values = rng.randint(0, 100, size=(n, f)).astype(dtype)
        sharding = NamedSharding(mesh, P("data"))
        packed = pack_rows(values, sharding=sharding)
        assert packed.mesh is mesh and packed.data_axis == "data"
        idx = _stratified_idx(rng, 16, 8, 4)  # B=32, 8/shard
        with pltpu.force_tpu_interpret_mode():
            out = jax.jit(
                lambda p, i: gather_rows(p, i, (jnp.float32,))[0]
            )(packed, jnp.asarray(idx))
        np.testing.assert_array_equal(
            np.asarray(out), values[idx].astype(np.float32)
        )

    def test_supports_sharded_gather_batch(self, mesh):
        from scvae_tpu.ops.gather import (
            pack_rows,
            supports_sharded_gather_batch,
        )

        values = np.zeros((64, 1024), np.float32)
        packed = pack_rows(
            values, sharding=NamedSharding(mesh, P("data"))
        )
        assert supports_sharded_gather_batch(packed, 32)  # 8/shard
        assert not supports_sharded_gather_batch(packed, 16)  # 4/shard
        assert not supports_sharded_gather_batch(packed, 30)  # not /4

    def test_pack_rows_rejects_undivisible_sharding(self, mesh):
        from scvae_tpu.ops.gather import pack_rows

        with pytest.raises(ValueError, match="row-sharded"):
            pack_rows(
                np.zeros((66, 1024), np.float32),
                sharding=NamedSharding(mesh, P("data")),
            )


class TestStratifiedPermutations:
    def test_blocks_stay_in_shard_ranges(self):
        from scvae_tpu.models.step import epoch_permutation

        n_padded, n_real, batch, shards = 96, 90, 24, 4
        perm = epoch_permutation(
            n_padded, batch, np.random.RandomState(0),
            data_shards=shards, n_real=n_real,
        )
        block = batch // shards
        shard_rows = n_padded // shards
        for d in range(shards):
            cols = perm[:, d * block:(d + 1) * block]
            assert np.all(cols >= d * shard_rows)
            assert np.all(cols < d * shard_rows + min(
                shard_rows, n_real - d * shard_rows))
        flat = perm.ravel()
        assert len(np.unique(flat)) == len(flat)  # no repeats in an epoch

    def test_sequential_covers_all_real_rows(self):
        from scvae_tpu.models.step import stratified_sequential_batches

        n_padded, n_real, batch, shards = 96, 90, 24, 4
        idx, leftovers = stratified_sequential_batches(
            n_padded, n_real, batch, shards
        )
        covered = set(idx.ravel().tolist())
        for start, stop in leftovers:
            covered.update(range(start, stop))
        shard_rows = n_padded // shards
        expected = set()
        for d in range(shards):
            real = min(shard_rows, n_real - d * shard_rows)
            expected.update(range(d * shard_rows, d * shard_rows + real))
        assert covered == expected


class TestShardedFusedLikelihood:
    """shard_map-wrapped fused kernels vs the exact jnp reference, on a
    (data=2, model=2) mesh in interpreter mode: values and gradients."""

    def _setup(self, name, np_rng, b=8, f=96, hidden=16, s=2):
        from scvae_tpu.ops.fused_likelihood import _BASE_HEADS

        h = jnp.asarray(np_rng.normal(size=(s, b, hidden)), jnp.float32)
        t = jnp.asarray(np_rng.poisson(2.0, size=(b, f)), jnp.float32)
        head_names = (
            ("lambda",) if name == "constrained poisson"
            else _BASE_HEADS[name]
        )
        heads = {
            p: {
                "kernel": jnp.asarray(
                    np_rng.normal(scale=0.1, size=(hidden, f)), jnp.float32
                ),
                "bias": jnp.asarray(
                    np_rng.normal(scale=0.1, size=(f,)), jnp.float32
                ),
            }
            for p in head_names
        }
        return h, heads, t

    @pytest.mark.parametrize("name", [
        "poisson",
        "negative binomial",
        "zero-inflated negative binomial",
    ])
    def test_value_and_grad_parity(self, mesh4, name, np_rng):
        from scvae_tpu import ops

        h, heads, t = self._setup(name, np_rng)

        def loss_sharded(h, heads):
            rows = ops.sharded_fused_log_likelihood(
                name, h, heads, t, mesh=mesh4
            )
            return jnp.sum(rows)

        def loss_reference(h, heads):
            return jnp.sum(ops.reference_log_likelihood(name, h, heads, t))

        with pltpu.force_tpu_interpret_mode():
            v_s, g_s = jax.jit(
                jax.value_and_grad(loss_sharded, argnums=(0, 1))
            )(h, heads)
        v_r, g_r = jax.jit(
            jax.value_and_grad(loss_reference, argnums=(0, 1))
        )(h, heads)
        np.testing.assert_allclose(float(v_s), float(v_r), rtol=1e-5)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5
            ),
            g_s, g_r,
        )

    def test_constrained_poisson_parity(self, mesh4, np_rng):
        from scvae_tpu import ops

        name = "constrained poisson"
        h, heads, t = self._setup(name, np_rng)
        count_sum = jnp.sum(t, axis=-1, keepdims=True) + 1.0

        def loss_sharded(h, heads):
            rows = ops.sharded_fused_log_likelihood(
                name, h, heads, t, mesh=mesh4, count_sum=count_sum
            )
            return jnp.sum(rows)

        def loss_reference(h, heads):
            return jnp.sum(
                ops.reference_log_likelihood(
                    name, h, heads, t, count_sum=count_sum
                )
            )

        with pltpu.force_tpu_interpret_mode():
            v_s, g_s = jax.jit(
                jax.value_and_grad(loss_sharded, argnums=(0, 1))
            )(h, heads)
        v_r, g_r = jax.jit(
            jax.value_and_grad(loss_reference, argnums=(0, 1))
        )(h, heads)
        np.testing.assert_allclose(float(v_s), float(v_r), rtol=1e-5)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5
            ),
            g_s, g_r,
        )

    def test_categorised_parity(self, mesh4, np_rng):
        from scvae_tpu import ops

        name, k = "negative binomial", 3
        h, heads, t = self._setup(name, np_rng)
        hidden, f = heads["p"]["kernel"].shape
        cat_kernel = jnp.asarray(
            np_rng.normal(scale=0.1, size=(k + 1, hidden, f)), jnp.float32
        )
        cat_bias = jnp.asarray(
            np_rng.normal(scale=0.1, size=(k + 1, f)), jnp.float32
        )

        def loss_sharded(h, heads, ck, cb):
            rows = ops.sharded_fused_categorised_log_likelihood(
                name, h, heads, ck, cb, t, mesh=mesh4
            )
            return jnp.sum(rows)

        def loss_reference(h, heads, ck, cb):
            return jnp.sum(
                ops.reference_categorised_log_likelihood(
                    name, h, heads, ck, cb, t
                )
            )

        with pltpu.force_tpu_interpret_mode():
            v_s, g_s = jax.jit(
                jax.value_and_grad(loss_sharded, argnums=(0, 1, 2, 3))
            )(h, heads, cat_kernel, cat_bias)
        v_r, g_r = jax.jit(
            jax.value_and_grad(loss_reference, argnums=(0, 1, 2, 3))
        )(h, heads, cat_kernel, cat_bias)
        np.testing.assert_allclose(float(v_s), float(v_r), rtol=1e-5)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5
            ),
            g_s, g_r,
        )


class TestTrainEpochComposition:
    """One train_epoch scan: mesh + packed gather + sharded fused kernels
    vs single-device jnp.take + reference likelihood, SAME stratified
    permutation — curves must agree to f32 reduction noise."""

    def _build(self, np_rng, mesh_for_loss, fused):
        from scvae_tpu.models import step, vae

        f, hidden, b = 1024, 16, 32
        config = vae.VAEConfig(
            feature_size=f, latent_size=4, hidden_sizes=(hidden,),
            reconstruction_distribution="negative binomial",
            minibatch_normalisation=True,
            fused_likelihood=fused,
        )
        params, state = vae.init(config, jax.random.PRNGKey(7))
        optimizer = step.make_optimizer(1e-3)
        ts = step.create_train_state(params, state, optimizer)

        def loss(params, model_state, batch, rng, wuw):
            return vae.loss_fn(
                config, params, model_state, batch, rng,
                warm_up_weight=wuw, mesh=mesh_for_loss,
            )

        return config, ts, optimizer, loss

    def test_packed_mesh_matches_single_device(self, mesh4, np_rng):
        from scvae_tpu import ops
        from scvae_tpu.models import step
        from scvae_tpu.ops.gather import FieldAlias, pack_rows
        from scvae_tpu.parallel import (
            batch_sharding,
            shard_train_state,
        )

        n, f, b = 64, 1024, 32
        x = np_rng.poisson(2.0, size=(n, f)).astype(np.float32)
        perm = np.stack([
            _stratified_idx(np.random.RandomState(3 + e), 32, 16, 2)
            for e in range(2)
        ])  # (2 batches, 32); data axis has 2 shards of 32 rows

        with ops.force_pallas(), pltpu.force_tpu_interpret_mode():
            _, ts, optimizer, loss = self._build(np_rng, mesh4, True)
            ts = shard_train_state(ts, mesh4)
            packed = pack_rows(x, sharding=NamedSharding(mesh4, P("data")))
            data = {"x": packed, "t": FieldAlias("x")}
            train_epoch = step.make_train_epoch(
                loss, optimizer, batch_constraint=batch_sharding(mesh4),
                donate=False,
            )
            _, metrics_mesh = train_epoch(
                ts, data, jnp.asarray(perm), jax.random.PRNGKey(11), 1.0
            )

        _, ts2, optimizer2, loss2 = self._build(np_rng, None, False)
        data2 = {"x": jnp.asarray(x), "t": jnp.asarray(x)}
        train_epoch2 = step.make_train_epoch(loss2, optimizer2, donate=False)
        _, metrics_single = train_epoch2(
            ts2, data2, jnp.asarray(perm), jax.random.PRNGKey(11), 1.0
        )

        np.testing.assert_allclose(
            float(metrics_mesh["lower_bound"]),
            float(metrics_single["lower_bound"]),
            rtol=1e-5,
        )
        np.testing.assert_allclose(
            float(metrics_mesh["last_lower_bound"]),
            float(metrics_single["last_lower_bound"]),
            rtol=1e-5,
        )


class TestTrainAPIMeshFastPaths:
    """Full ``train()`` through the public API with packed gather + fused
    kernels forced on under a (data=2, model=2) mesh, against the same
    mesh with both fast paths off and the stratification forced to match
    — the learning curves must agree."""

    def _dataset(self, n, f):
        from scvae_tpu.data import DataSet

        rng = np.random.RandomState(0)
        values = rng.poisson(1.5, size=(n, f)).astype(np.float32)
        return DataSet(
            "mesh_fastpath", title="mesh fastpath",
            specifications={},
            values=values,
            example_names=np.array([f"cell {i}" for i in range(n)]),
            feature_names=np.array([f"gene {j}" for j in range(f)]),
            kind="training", version="original",
        )

    @pytest.mark.slow
    def test_api_curves_match(self, tmp_path, mesh4, monkeypatch):
        from scvae_tpu import ops
        from scvae_tpu.models import VariationalAutoencoder, api

        n, f = 64, 1024
        train_set = self._dataset(n, f)
        # 38 validation rows: not a multiple of the batch, so the
        # stratified evaluator's per-shard leftover (remainder) path runs
        valid_set = self._dataset(38, f)
        kwargs = dict(
            number_of_epochs=2, minibatch_size=32, seed=0, verbose=False,
            mesh=mesh4,
        )

        def build(tag, fused):
            return VariationalAutoencoder(
                feature_size=f, latent_size=4, hidden_sizes=[16],
                reconstruction_distribution="negative binomial",
                minibatch_normalisation=True,
                fused_likelihood=fused,
                log_directory=str(tmp_path / tag),
            )

        with ops.force_pallas(), pltpu.force_tpu_interpret_mode():
            r_fast = build("fast", True).train(
                train_set, valid_set, **kwargs
            )

        # fallback run: same mesh, fast paths off, stratification forced
        # to the packed run's scheme so the batch streams coincide
        real = api._packed_stratification

        def forced(data):
            shards, n_padded = real(data)
            if shards == 1:
                first = next(iter(data.values()))
                return 2, first.shape[0]
            return shards, n_padded

        monkeypatch.setattr(api, "_packed_stratification", forced)
        r_slow = build("slow", False).train(train_set, valid_set, **kwargs)

        np.testing.assert_allclose(
            r_fast.history["validation"]["lower_bound"],
            r_slow.history["validation"]["lower_bound"],
            rtol=1e-5,
        )
        np.testing.assert_allclose(
            r_fast.history["training"]["lower_bound"],
            r_slow.history["training"]["lower_bound"],
            rtol=1e-5,
        )


class TestGMVAEShardedFused:
    """GMVAE y-marginalised loss with the sharded fused kernels under the
    mesh vs the exact reference path: values and gradients."""

    def test_loss_and_grad_parity(self, mesh4, np_rng):
        from scvae_tpu import ops
        from scvae_tpu.models import gmvae

        f, b = 96, 8
        config = gmvae.GMVAEConfig(
            feature_size=f, latent_size=3, hidden_sizes=(8,),
            number_of_latent_clusters=3,
            reconstruction_distribution="negative binomial",
            minibatch_normalisation=True,
        )
        params, state = gmvae.init(config, jax.random.PRNGKey(0))
        x = jnp.asarray(np_rng.poisson(2.0, size=(b, f)), jnp.float32)
        batch = {"x": x, "t": x}
        rng = jax.random.PRNGKey(5)

        import dataclasses

        def run(fused, use_mesh):
            cfg = dataclasses.replace(config, fused_likelihood=fused)

            def loss(p):
                value, _aux = gmvae.loss_fn(
                    cfg, p, state, batch, rng,
                    mesh=mesh4 if use_mesh else None,
                )
                return value

            return jax.jit(jax.value_and_grad(loss))(params)

        with ops.force_pallas(), pltpu.force_tpu_interpret_mode():
            v_fast, g_fast = run(True, True)
        v_ref, g_ref = run(False, False)
        np.testing.assert_allclose(float(v_fast), float(v_ref), rtol=1e-5)
        jax.tree_util.tree_map(
            lambda a, c: np.testing.assert_allclose(
                np.asarray(a), np.asarray(c), rtol=5e-4, atol=1e-5
            ),
            g_fast, g_ref,
        )
