"""Device-resident data path: epoch scan, eval scan, and equivalence with
the streaming path."""

import jax
import numpy as np
import pytest
import scipy.sparse

from scvae_tpu.data import DataSet
from scvae_tpu.data.pipeline import device_resident_data
from scvae_tpu.data.sparse import SparseRowMatrix
from scvae_tpu.models import (
    VariationalAutoencoder,
    create_train_state,
    make_optimizer,
)
from scvae_tpu.models import vae
from scvae_tpu.models.step import (
    epoch_permutation,
    make_eval_epoch,
    make_train_epoch,
    sequential_batches,
)


def _sparse_counts(n=200, f=12, seed=0):
    rng = np.random.RandomState(seed)
    return SparseRowMatrix(
        scipy.sparse.csr_matrix(rng.poisson(2, (n, f)).astype(np.float32))
    )


def test_device_resident_data_aliases_duplicates():
    m = _sparse_counts()
    data = device_resident_data({"x": m, "t": m}, count_dtype=np.int16)
    assert data["x"] is data["t"]
    assert data["x"].dtype == np.int16


def test_device_resident_data_keeps_noninteger_float():
    dense = np.random.RandomState(0).rand(10, 4).astype(np.float32)
    data = device_resident_data({"x": dense}, count_dtype=np.int16)
    assert data["x"].dtype == np.float32


def test_epoch_permutation_and_sequential_batches():
    perm = epoch_permutation(103, 10, np.random.RandomState(0))
    assert perm.shape == (10, 10)
    assert len(np.unique(perm)) == 100
    seq = sequential_batches(103, 10)
    np.testing.assert_array_equal(seq.reshape(-1), np.arange(100))


def test_train_epoch_matches_streaming_step(rng):
    """One scan epoch == the same steps taken one by one.

    Batch norm is off here: with center=True BN the pre-BN bias is
    mathematically gradient-free, so its Adam updates amplify pure float
    noise and scan-vs-eager cannot be compared leaf-for-leaf.
    """
    config = vae.VAEConfig(
        feature_size=12, latent_size=2, hidden_sizes=(8,),
        reconstruction_distribution="poisson",
        minibatch_normalisation=False,
    )
    params, state = vae.init(config, rng)
    optimizer = make_optimizer(1e-3)

    def loss(p, s, b, r, w):
        return vae.loss_fn(config, p, s, b, r, warm_up_weight=w)

    m = _sparse_counts()
    data = device_resident_data({"x": m, "t": m})
    perm = epoch_permutation(200, 50, np.random.RandomState(3))

    epoch_rng = jax.random.PRNGKey(9)

    # manual replication of the scan's rng splitting + steps (run FIRST —
    # the jitted epoch donates its train state, deleting shared buffers)
    import jax.numpy as jnp
    import optax

    ts_manual = create_train_state(params, state, optimizer)
    carry_rng = epoch_rng
    bounds = []
    for i in range(perm.shape[0]):
        carry_rng, sub = jax.random.split(carry_rng)
        batch = {
            k: jnp.take(v, jnp.asarray(perm[i]), axis=0)
            for k, v in data.items()
        }
        (l, (mets, new_state)), grads = jax.value_and_grad(
            loss, has_aux=True
        )(ts_manual.params, ts_manual.model_state, batch, sub, 1.0)
        updates, new_opt = optimizer.update(
            grads, ts_manual.opt_state, ts_manual.params
        )
        from scvae_tpu.models.step import TrainState

        ts_manual = TrainState(
            params=optax.apply_updates(ts_manual.params, updates),
            model_state=new_state,
            opt_state=new_opt,
            step=ts_manual.step + 1,
        )
        bounds.append(float(mets["lower_bound"]))

    # scan path
    ts_scan = create_train_state(params, state, optimizer)
    train_epoch = make_train_epoch(loss, optimizer, jit=True)
    ts_scan, metrics = train_epoch(ts_scan, data, perm, epoch_rng, 1.0)

    np.testing.assert_allclose(
        float(metrics["lower_bound"]), np.mean(bounds), rtol=1e-4
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(ts_scan.params),
        jax.tree_util.tree_leaves(ts_manual.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


def test_eval_epoch_matches_direct(rng):
    config = vae.VAEConfig(
        feature_size=12, latent_size=2, hidden_sizes=(8,),
        reconstruction_distribution="poisson",
        minibatch_normalisation=False,
    )
    params, state = vae.init(config, rng)

    def eval_fn(p, s, b, r):
        metrics, _ = vae.elbo_terms(config, p, s, b, r, training=False)
        return metrics

    m = _sparse_counts(n=100)
    data = device_resident_data({"x": m, "t": m})
    idx = sequential_batches(100, 25)
    eval_epoch = make_eval_epoch(eval_fn)
    out = eval_epoch(params, state, data, idx, jax.random.PRNGKey(0))
    assert np.isfinite(float(out["lower_bound"]))
    assert set(out) == {
        "lower_bound", "reconstruction_error", "kl_divergence",
        "kl_divergence_neurons",
    }


def test_api_device_vs_streaming_training(tmp_path):
    ds = DataSet(
        "development", directory=str(tmp_path / "d"),
        example_filter=["random", 400],
    )
    train_set, valid_set, _ = ds.split(method="random", fraction=0.9)

    def run(placement, subdir):
        model = VariationalAutoencoder(
            feature_size=25, latent_size=2, hidden_sizes=[16],
            reconstruction_distribution="poisson",
            log_directory=str(tmp_path / subdir),
        )
        result = model.train(
            train_set, valid_set, number_of_epochs=2, minibatch_size=64,
            data_placement=placement, verbose=False,
        )
        return result.history["validation"]["lower_bound"]

    lb_stream = run("streaming", "m1")
    lb_device = run("device", "m2")
    # Different RNG consumption patterns → different trajectories on the
    # steep early curve; both must improve and land in the same ballpark.
    assert len(lb_stream) == len(lb_device) == 2
    assert lb_stream[-1] > lb_stream[0]
    assert lb_device[-1] > lb_device[0]
    assert abs(lb_stream[-1] - lb_device[-1]) / abs(lb_stream[-1]) < 0.3


class TestPackedEpochEndToEnd:
    """Whole train_epoch over packed device data in interpreter mode —
    the CI twin of benchmarks/tpu_gather_smoke.py: the Pallas row gather
    + FieldAlias dedup + fused NB likelihood must reproduce the unpacked
    jnp.take path's curve exactly."""

    def test_packed_epoch_matches_unpacked(self):
        import jax
        from jax.experimental.pallas import tpu as pltpu

        from scvae_tpu.models import (
            create_train_state,
            make_optimizer,
            vae,
        )
        from scvae_tpu.models.step import make_train_epoch

        n, f, b = 64, 2048, 8
        counts = np.random.RandomState(0).poisson(
            0.3, size=(n, f)
        ).astype(np.int16)
        config = vae.VAEConfig(
            feature_size=f, latent_size=4, hidden_sizes=(16,),
            reconstruction_distribution="negative binomial",
            minibatch_normalisation=True,
            fused_likelihood=True,  # jnp reference path off-TPU…
        )
        optimizer = make_optimizer(1e-3)

        def loss(params, model_state, batch, rng, wuw):
            return vae.loss_fn(
                config, params, model_state, batch, rng, warm_up_weight=wuw
            )

        perm = np.arange(16, dtype=np.int32).reshape(2, b)

        def run(packed):
            data = device_resident_data(
                {"x": counts, "t": counts},
                count_dtype=np.int16,
                packed=packed,
            )
            params, state = vae.init(config, jax.random.PRNGKey(0))
            ts = create_train_state(params, state, optimizer)
            train_epoch = make_train_epoch(loss, optimizer, jit=False)
            with pltpu.force_tpu_interpret_mode():
                ts, metrics = train_epoch(
                    ts, data, jax.numpy.asarray(perm),
                    jax.random.PRNGKey(1), 1.0
                )
            return float(metrics["lower_bound"])

        lb_unpacked = run(False)
        lb_packed = run(True)
        np.testing.assert_allclose(lb_packed, lb_unpacked, rtol=1e-6)


class TestGatherDtypePolicyAndLgammaHoist:
    """Round-4 perf-path numerics: (a) bf16 gather outputs for the
    encoder input / likelihood target are value-exact for counts ≤ 256,
    so training must match the f32-gather path EXACTLY (on the CPU f32
    trunk); (b) the per-dataset lgamma row-sum hoist
    (api._append_lgamma_rowsum) must not change the objective."""

    def _setup(self):
        import scipy.sparse

        from scvae_tpu.models import vae
        from scvae_tpu.models.step import make_optimizer

        rng = np.random.RandomState(7)
        counts = scipy.sparse.random(
            256, 1024, density=0.1, format="csr", random_state=rng,
            data_rvs=lambda k: rng.poisson(3.0, k) + 1.0,
        )
        counts.data = counts.data.astype(np.float32)
        config = vae.VAEConfig(
            feature_size=1024, latent_size=4, hidden_sizes=(16,),
            reconstruction_distribution="negative binomial",
            minibatch_normalisation=True, fused_likelihood=True,
        )
        optimizer = make_optimizer(1e-3)

        def loss(p, s, b, r, w):
            return vae.loss_fn(config, p, s, b, r, warm_up_weight=w)

        return counts, config, optimizer, loss

    def _run(self, counts, config, optimizer, loss, *, batch_dtypes,
             hoist):
        import jax.numpy as jnp
        from jax.experimental.pallas import tpu as pltpu

        from scvae_tpu import ops
        from scvae_tpu.data.pipeline import device_resident_data
        from scvae_tpu.models import vae
        from scvae_tpu.models.api import _append_lgamma_rowsum
        from scvae_tpu.models.step import (
            create_train_state,
            epoch_permutation,
            make_train_epoch,
        )

        with ops.force_pallas(), pltpu.force_tpu_interpret_mode():
            data = device_resident_data(
                {"x": counts, "t": counts}, count_dtype=np.int16
            )
            if hoist:
                data = _append_lgamma_rowsum(data, config)
                assert "t_lgamma_rowsum" in data
            params, state = vae.init(config, jax.random.PRNGKey(0))
            ts = create_train_state(params, state, optimizer)
            train_epoch = make_train_epoch(
                loss, optimizer, donate=False, batch_dtypes=batch_dtypes
            )
            perm = jnp.asarray(
                epoch_permutation(256, 64, np.random.RandomState(1))
            )
            _, metrics = train_epoch(
                ts, data, perm, jax.random.PRNGKey(3), 1.0
            )
            return float(metrics["lower_bound"])

    def test_bf16_gather_and_hoist_match_f32(self):
        import jax.numpy as jnp

        counts, config, optimizer, loss = self._setup()
        base = self._run(
            counts, config, optimizer, loss, batch_dtypes=None, hoist=False
        )
        hoisted = self._run(
            counts, config, optimizer, loss, batch_dtypes=None, hoist=True
        )
        bf16 = self._run(
            counts, config, optimizer, loss,
            batch_dtypes={"x": jnp.bfloat16, "t": jnp.bfloat16}, hoist=True,
        )
        np.testing.assert_allclose(hoisted, base, rtol=1e-6)
        np.testing.assert_allclose(bf16, base, rtol=1e-6)

    def test_policy_gates(self):
        import dataclasses

        from scvae_tpu import ops
        from scvae_tpu.models import vae
        from scvae_tpu.models.api import _bf16_batch_dtypes

        counts, config, _, _ = self._setup()
        arrays = {"x": counts, "t": counts}
        # f32 training (CPU default) → no overrides
        assert _bf16_batch_dtypes(arrays, config) is None
        bf16_config = dataclasses.replace(config, precision="bfloat16")
        with ops.force_pallas():
            out = _bf16_batch_dtypes(arrays, bf16_config)
            assert out is not None and set(out) == {"x", "t"}
            # categorised keeps in-kernel t-only lgamma chains → gated
            cat = dataclasses.replace(
                bf16_config, number_of_reconstruction_classes=10
            )
            assert _bf16_batch_dtypes(arrays, cat) is None
            # counts above 256 are not bf16-exact → gated
            big = counts.copy()
            big.data = big.data + 300.0
            assert _bf16_batch_dtypes({"x": big, "t": big},
                                      bf16_config) is None
