"""Pallas fused-likelihood kernel tests: special functions vs jax.lax,
forward/backward parity vs the distribution library (interpreter mode on
CPU; SURVEY.md §4 item 4)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from scvae_tpu.distributions import NegativeBinomial, Poisson
from scvae_tpu.models import networks
from scvae_tpu.ops import (
    digamma,
    fused_log_likelihood,
    lgamma,
    reference_log_likelihood,
    supports_fused_likelihood,
)


class TestSpecialFunctions:
    def test_lgamma_matches_lax(self):
        x = jnp.asarray(
            np.concatenate(
                [np.linspace(0.05, 2, 40), np.linspace(2, 500, 40)]
            ).astype(np.float32)
        )
        ours = lgamma(x)
        ref = jax.lax.lgamma(x)
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_digamma_matches_lax(self):
        x = jnp.asarray(
            np.concatenate(
                [np.linspace(0.05, 2, 40), np.linspace(2, 500, 40)]
            ).astype(np.float32)
        )
        ours = digamma(x)
        ref = jax.lax.digamma(x)
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(ref), rtol=2e-5, atol=2e-5
        )


_HEAD_NAMES = {
    "poisson": ("log_lambda",),
    "negative binomial": ("p", "log_r"),
    "zero-inflated poisson": ("pi", "log_lambda"),
    "zero-inflated negative binomial": ("pi", "p", "log_r"),
    "constrained poisson": ("lambda",),
}

FUSABLE = list(_HEAD_NAMES)


def _make_case(name, m=48, hidden=16, f=24, seed=0):
    rng = np.random.RandomState(seed)
    h = jnp.asarray(rng.randn(m, hidden).astype(np.float32) * 0.5)
    t = jnp.asarray(rng.poisson(2.0, (m, f)).astype(np.float32))
    keys = jax.random.split(jax.random.PRNGKey(seed), len(_HEAD_NAMES[name]))
    heads = {
        pname: networks.init_dense(key, hidden, f)
        for pname, key in zip(_HEAD_NAMES[name], keys)
    }
    if name == "constrained poisson":
        count_sum = jnp.sum(t, axis=-1, keepdims=True) + 1.0
        return h, heads, t, count_sum
    return h, heads, t, None


def _distribution_log_prob_sum(name, h, heads, t, count_sum=None):
    """Ground truth via the distribution library (same clipping)."""
    from scvae_tpu.distributions import DISTRIBUTIONS

    spec = DISTRIBUTIONS[name]
    theta = {
        pname: spec.parameters[pname].constrain(
            h @ heads[pname]["kernel"] + heads[pname]["bias"]
        )
        for pname in heads
    }
    dist = spec.build(theta, count_sum=count_sum)
    return jnp.sum(dist.log_prob(t), axis=-1)


class TestReferenceImplementation:
    @pytest.mark.parametrize("name", FUSABLE)
    def test_matches_distribution_library(self, name):
        h, heads, t, count_sum = _make_case(name)
        ref = reference_log_likelihood(name, h, heads, t, count_sum)
        expected = _distribution_log_prob_sum(name, h, heads, t, count_sum)
        np.testing.assert_allclose(
            np.asarray(ref), np.asarray(expected), rtol=2e-4, atol=2e-3
        )


class TestFusedKernels:
    @pytest.mark.parametrize("name", FUSABLE)
    def test_forward_parity_interpret(self, name):
        h, heads, t, count_sum = _make_case(name)
        with pltpu.force_tpu_interpret_mode():
            out = fused_log_likelihood(name, h, heads, t, count_sum)
        expected = reference_log_likelihood(name, h, heads, t, count_sum)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(expected), rtol=1e-4, atol=1e-3
        )

    @pytest.mark.parametrize("name", FUSABLE)
    def test_gradient_parity_interpret(self, name):
        h, heads, t, count_sum = _make_case(name)

        def loss_fused(h, heads):
            return jnp.sum(fused_log_likelihood(name, h, heads, t, count_sum))

        def loss_reference(h, heads):
            return jnp.sum(
                reference_log_likelihood(name, h, heads, t, count_sum)
            )

        with pltpu.force_tpu_interpret_mode():
            g_fused = jax.grad(loss_fused, argnums=(0, 1))(h, heads)
        g_ref = jax.grad(loss_reference, argnums=(0, 1))(h, heads)
        for a, b in zip(
            jax.tree_util.tree_leaves(g_fused),
            jax.tree_util.tree_leaves(g_ref),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3
            )

    @pytest.mark.parametrize(
        "name",
        ["zero-inflated poisson", "zero-inflated negative binomial"],
    )
    def test_zero_inflated_zero_branch(self, name):
        # All-zero targets exercise the t == 0 mixture branch exclusively.
        h, heads, t, _ = _make_case(name)
        t = jnp.zeros_like(t)

        def loss_fused(h, heads):
            return jnp.sum(fused_log_likelihood(name, h, heads, t))

        def loss_reference(h, heads):
            return jnp.sum(_distribution_log_prob_sum(name, h, heads, t))

        with pltpu.force_tpu_interpret_mode():
            value = loss_fused(h, heads)
            g_fused = jax.grad(loss_fused, argnums=(0, 1))(h, heads)
        np.testing.assert_allclose(
            float(value), float(loss_reference(h, heads)), rtol=1e-4
        )
        g_ref = jax.grad(loss_reference, argnums=(0, 1))(h, heads)
        for a, b in zip(
            jax.tree_util.tree_leaves(g_fused),
            jax.tree_util.tree_leaves(g_ref),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3
            )

    def test_constrained_poisson_count_sum_cotangent(self):
        h, heads, t, count_sum = _make_case("constrained poisson")

        def loss_fused(n):
            return jnp.sum(
                fused_log_likelihood("constrained poisson", h, heads, t, n)
            )

        def loss_reference(n):
            return jnp.sum(
                reference_log_likelihood(
                    "constrained poisson", h, heads, t, n
                )
            )

        with pltpu.force_tpu_interpret_mode():
            g_fused = jax.grad(loss_fused)(count_sum)
        g_ref = jax.grad(loss_reference)(count_sum)
        np.testing.assert_allclose(
            np.asarray(g_fused), np.asarray(g_ref), rtol=5e-3, atol=5e-3
        )

    def test_supports(self):
        assert supports_fused_likelihood("poisson")
        assert supports_fused_likelihood("negative binomial")
        assert supports_fused_likelihood("zero-inflated poisson")
        assert supports_fused_likelihood("zero-inflated negative binomial")
        assert supports_fused_likelihood("constrained poisson")
        # categorised wrappers fuse too (round-3; K+1 class heads)
        assert supports_fused_likelihood("poisson", k_max=4)
        assert supports_fused_likelihood(
            "zero-inflated negative binomial", k_max=10
        )
        assert not supports_fused_likelihood("constrained poisson", k_max=4)
        assert not supports_fused_likelihood("poisson", k_max=100)
        assert not supports_fused_likelihood("lomax")

    def test_leading_axes_broadcast(self):
        h, heads, t, _ = _make_case("poisson", m=8)
        h3 = jnp.broadcast_to(h, (3,) + h.shape)  # (S, B, H)
        with pltpu.force_tpu_interpret_mode():
            out = fused_log_likelihood("poisson", h3, heads, t)
        assert out.shape == (3, 8)
        expected = reference_log_likelihood("poisson", h, heads, t)
        np.testing.assert_allclose(
            np.asarray(out[0]), np.asarray(expected), rtol=1e-4, atol=1e-3
        )


class TestFusedCategorised:
    """Piecewise-categorical fused kernel (K+1 class heads; round 3).

    Ground truth is the distribution library's Categorised composition
    (reference ``scvae/distributions/categorised.py:251-260``)."""

    def _make(self, name="negative binomial", k_max=4, m=48, hidden=16,
              f=24, seed=0):
        h, heads, t, _ = _make_case(name, m=m, hidden=hidden, f=f, seed=seed)
        cat = networks.init_categorised_head(
            jax.random.PRNGKey(seed + 7), hidden, f, k_max
        )
        # non-trivial class logits (init bias is zero, kernel is random)
        return h, heads, cat, t

    def _expected(self, name, h, heads, cat, t):
        from scvae_tpu.distributions import Categorical, Categorised

        base = _distribution_log_prob_sum  # noqa: F841  (pattern reference)
        from scvae_tpu.distributions import DISTRIBUTIONS

        spec = DISTRIBUTIONS[name]
        theta = {
            pname: spec.parameters[pname].constrain(
                h @ heads[pname]["kernel"] + heads[pname]["bias"]
            )
            for pname in heads
        }
        dist = spec.build(theta)
        logits = networks.apply_categorised_logits(cat, h)
        composed = Categorised(dist=dist, cat=Categorical(logits=logits))
        return jnp.sum(composed.log_prob(t), axis=-1)

    @pytest.mark.parametrize(
        "name",
        [
            "poisson",
            "negative binomial",
            "zero-inflated poisson",
            "zero-inflated negative binomial",
        ],
    )
    def test_reference_matches_distribution_library(self, name):
        from scvae_tpu.ops import reference_categorised_log_likelihood

        h, heads, cat, t = self._make(name)
        got = reference_categorised_log_likelihood(
            name, h, heads, cat["kernel"], cat["bias"], t
        )
        expected = self._expected(name, h, heads, cat, t)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(expected), rtol=2e-4, atol=2e-3
        )

    @pytest.mark.parametrize(
        "name", ["negative binomial", "zero-inflated negative binomial"]
    )
    def test_forward_parity_interpret(self, name):
        from scvae_tpu.ops import fused_categorised_log_likelihood

        h, heads, cat, t = self._make(name)
        with pltpu.force_tpu_interpret_mode():
            out = fused_categorised_log_likelihood(
                name, h, heads, cat["kernel"], cat["bias"], t
            )
        expected = self._expected(name, h, heads, cat, t)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(expected), rtol=2e-4, atol=2e-3
        )

    def test_boundary_counts_exact(self):
        """Targets pinned to the piecewise boundary: 0, K−1, K, K+1."""
        from scvae_tpu.ops import reference_categorised_log_likelihood

        name, k_max = "negative binomial", 4
        h, heads, cat, t = self._make(name, k_max=k_max)
        t = jnp.asarray(
            np.resize(
                np.array([0.0, k_max - 1.0, float(k_max), k_max + 1.0],
                         np.float32),
                t.shape,
            )
        )
        got = reference_categorised_log_likelihood(
            name, h, heads, cat["kernel"], cat["bias"], t
        )
        expected = self._expected(name, h, heads, cat, t)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(expected), rtol=2e-4, atol=2e-3
        )

    @pytest.mark.parametrize("name", ["negative binomial"])
    def test_gradient_parity_interpret(self, name):
        from scvae_tpu.ops import (
            fused_categorised_log_likelihood,
            reference_categorised_log_likelihood,
        )

        h, heads, cat, t = self._make(name)

        def loss_fused(h, heads, cat):
            return jnp.sum(
                fused_categorised_log_likelihood(
                    name, h, heads, cat["kernel"], cat["bias"], t
                )
            )

        def loss_reference(h, heads, cat):
            return jnp.sum(
                reference_categorised_log_likelihood(
                    name, h, heads, cat["kernel"], cat["bias"], t
                )
            )

        with pltpu.force_tpu_interpret_mode():
            g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(h, heads, cat)
        g_ref = jax.grad(loss_reference, argnums=(0, 1, 2))(h, heads, cat)
        for a, b in zip(
            jax.tree_util.tree_leaves(g_fused),
            jax.tree_util.tree_leaves(g_ref),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3
            )

    def test_gradient_matches_autodiff_of_composition(self):
        """End-to-end check against autodiff of the distribution-library
        composition (not just the reference_… twin)."""
        name = "zero-inflated negative binomial"
        h, heads, cat, t = self._make(name)

        def loss_lib(h, heads, cat):
            return jnp.sum(self._expected(name, h, heads, cat, t))

        from scvae_tpu.ops import reference_categorised_log_likelihood

        def loss_ref(h, heads, cat):
            return jnp.sum(
                reference_categorised_log_likelihood(
                    name, h, heads, cat["kernel"], cat["bias"], t
                )
            )

        g_lib = jax.grad(loss_lib, argnums=(0, 1, 2))(h, heads, cat)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(h, heads, cat)
        for a, b in zip(
            jax.tree_util.tree_leaves(g_lib),
            jax.tree_util.tree_leaves(g_ref),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3
            )


class TestPackedGather:
    """Pallas row-DMA gather (scvae_tpu/ops/gather.py, round 3): packed
    layout round-trip and parity with jnp.take in interpreter mode."""

    def _source(self, n=64, f=256, dtype=np.int16, seed=0):
        rng = np.random.RandomState(seed)
        return rng.poisson(1.0, size=(n, f)).astype(dtype)

    def test_can_pack(self):
        from scvae_tpu.ops.gather import can_pack

        assert can_pack(100, 2048, np.float32)   # 2048 = 8·256
        assert can_pack(100, 2048, np.int16)     # 2048 = 16·128
        assert not can_pack(100, 25, np.float32)
        assert not can_pack(100, 1024, np.int16)  # 1024/16 = 64 < 128

    def test_pack_rows_is_a_view(self):
        from scvae_tpu.ops.gather import pack_rows

        src = self._source(f=2048, dtype=np.float32)
        packed = pack_rows(src)
        assert packed.shape == src.shape
        assert packed.data.shape == (src.shape[0] * 8, 2048 // 8)
        # byte-identity: unpacking row i reproduces the logical row
        row = np.asarray(packed.data[8 * 3: 8 * 4]).reshape(-1)
        np.testing.assert_array_equal(row, src[3])

    @pytest.mark.parametrize("dtype", [np.float32, np.int16])
    def test_gather_rows_parity_interpret(self, dtype):
        from scvae_tpu.ops.gather import gather_rows, pack_rows

        src = self._source(n=64, f=2048, dtype=dtype)
        packed = pack_rows(src)
        idx = jnp.asarray(
            np.random.RandomState(1).permutation(64)[:32], jnp.int32
        )
        with pltpu.force_tpu_interpret_mode():
            out_f32, out_bf16 = gather_rows(
                packed, idx, (jnp.float32, jnp.bfloat16)
            )
        expected = np.take(src, np.asarray(idx), axis=0).astype(np.float32)
        np.testing.assert_array_equal(np.asarray(out_f32), expected)
        np.testing.assert_array_equal(
            np.asarray(out_bf16).astype(np.float32), expected
        )  # small counts are exact in bf16

    @pytest.mark.parametrize("dtype", [np.float32, np.int16])
    def test_reference_gather_matches_take(self, dtype):
        """The pure-jnp reference gather (used for cross-process packed
        verification, VERDICT r04 item 4) is value-identical to
        ``jnp.take`` over the unpacked matrix — no interpreter needed."""
        from scvae_tpu.ops import use_reference_gather
        from scvae_tpu.ops.gather import gather_rows, pack_rows

        src = self._source(n=64, f=2048, dtype=dtype)
        packed = pack_rows(src)
        idx = jnp.asarray(
            np.random.RandomState(2).permutation(64)[:32], jnp.int32
        )
        with use_reference_gather():
            out_f32, out_bf16 = gather_rows(
                packed, idx, (jnp.float32, jnp.bfloat16)
            )
        expected = np.take(src, np.asarray(idx), axis=0).astype(np.float32)
        np.testing.assert_array_equal(np.asarray(out_f32), expected)
        np.testing.assert_array_equal(
            np.asarray(out_bf16).astype(np.float32), expected
        )

    def test_reference_gather_sharded_matches_take(self):
        """Reference gather through the shard_map path (mesh-sharded
        PackedRows, shard-stratified indices) — the configuration the
        2-process loopback verifies numerically."""
        from jax.sharding import Mesh, NamedSharding
        from jax.sharding import PartitionSpec as P

        from scvae_tpu.ops import use_reference_gather
        from scvae_tpu.ops.gather import gather_rows, pack_rows

        mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
        src = self._source(n=64, f=2048, dtype=np.float32)
        packed = pack_rows(
            src, sharding=NamedSharding(mesh, P("data"))
        )
        # shard-stratified: block d draws from shard d's rows [16d, 16d+16)
        rng = np.random.RandomState(3)
        idx_np = np.concatenate([
            16 * d + rng.permutation(16)[:8] for d in range(4)
        ]).astype(np.int32)
        with use_reference_gather():
            (out,) = gather_rows(packed, jnp.asarray(idx_np), (jnp.float32,))
        np.testing.assert_array_equal(
            np.asarray(out), np.take(src, idx_np, axis=0)
        )

    def test_gather_batch_mixes_packed_and_plain(self):
        from scvae_tpu.models.step import gather_batch
        from scvae_tpu.ops.gather import pack_rows

        src = self._source(n=64, f=2048, dtype=np.float32)
        extra = np.arange(64, dtype=np.float32).reshape(64, 1)
        data = {"x": pack_rows(src), "count_sum": jnp.asarray(extra)}
        idx = jnp.asarray([5, 3, 60, 8, 1, 2, 9, 33], jnp.int32)
        with pltpu.force_tpu_interpret_mode():
            batch = gather_batch(data, idx)
        np.testing.assert_array_equal(
            np.asarray(batch["x"]), np.take(src, np.asarray(idx), axis=0)
        )
        np.testing.assert_array_equal(
            np.asarray(batch["count_sum"]),
            np.take(extra, np.asarray(idx), axis=0),
        )

    def test_gather_batch_fallback_odd_batch(self):
        from scvae_tpu.models.step import gather_batch
        from scvae_tpu.ops.gather import pack_rows

        src = self._source(n=64, f=2048, dtype=np.int16)
        data = {"x": pack_rows(src)}
        idx = jnp.asarray([5, 3, 60], jnp.int32)  # not divisible by 8
        batch = gather_batch(data, idx)
        np.testing.assert_array_equal(
            np.asarray(batch["x"]),
            np.take(src, np.asarray(idx), axis=0).astype(np.float32),
        )

    def test_logical_slice(self):
        from scvae_tpu.ops.gather import logical_slice, pack_rows

        src = self._source(n=64, f=2048, dtype=np.float32)
        packed = pack_rows(src)
        out = logical_slice(packed, 10, 17)
        np.testing.assert_array_equal(np.asarray(out), src[10:17])


class TestGroupedKernels:
    """Grouped fused likelihood (round 3): h (G, M, H) against t (M, F)
    shared across groups — the GMVAE cluster axis without the
    (G·M, F) target broadcast."""

    def _make(self, name="negative binomial", g=3, m=16, hidden=16, f=24,
              seed=0):
        rng = np.random.RandomState(seed)
        h = jnp.asarray(rng.randn(g, m, hidden).astype(np.float32) * 0.5)
        t = jnp.asarray(rng.poisson(2.0, (m, f)).astype(np.float32))
        keys = jax.random.split(
            jax.random.PRNGKey(seed), len(_HEAD_NAMES[name])
        )
        heads = {
            pname: networks.init_dense(key, hidden, f)
            for pname, key in zip(_HEAD_NAMES[name], keys)
        }
        return h, heads, t

    @pytest.mark.parametrize(
        "name",
        ["poisson", "negative binomial", "zero-inflated negative binomial"],
    )
    def test_forward_parity_interpret(self, name):
        from scvae_tpu.ops import fused_grouped_log_likelihood

        h, heads, t = self._make(name)
        with pltpu.force_tpu_interpret_mode():
            out = fused_grouped_log_likelihood(name, h, heads, t)
        assert out.shape == h.shape[:-1]
        for k in range(h.shape[0]):
            expected = reference_log_likelihood(name, h[k], heads, t)
            np.testing.assert_allclose(
                np.asarray(out[k]), np.asarray(expected),
                rtol=1e-4, atol=1e-3,
            )

    def test_gradient_parity_interpret(self):
        from scvae_tpu.ops import fused_grouped_log_likelihood

        name = "negative binomial"
        h, heads, t = self._make(name)
        # weight the per-group rows unevenly, like the GMVAE's q(y|x)
        w = jnp.asarray(
            np.random.RandomState(9).rand(h.shape[0], h.shape[1])
            .astype(np.float32)
        )

        def loss_grouped(h, heads):
            return jnp.sum(
                w * fused_grouped_log_likelihood(name, h, heads, t)
            )

        def loss_reference(h, heads):
            rows = jnp.stack(
                [
                    reference_log_likelihood(name, h[k], heads, t)
                    for k in range(h.shape[0])
                ]
            )
            return jnp.sum(w * rows)

        with pltpu.force_tpu_interpret_mode():
            g_fused = jax.grad(loss_grouped, argnums=(0, 1))(h, heads)
        g_ref = jax.grad(loss_reference, argnums=(0, 1))(h, heads)
        for a, b in zip(
            jax.tree_util.tree_leaves(g_fused),
            jax.tree_util.tree_leaves(g_ref),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3
            )

    def test_supports(self):
        from scvae_tpu.ops import supports_grouped_likelihood

        assert supports_grouped_likelihood("negative binomial", 10)
        assert supports_grouped_likelihood("poisson", 2)
        assert not supports_grouped_likelihood("negative binomial", 1)
        assert not supports_grouped_likelihood("negative binomial", 64)
        assert not supports_grouped_likelihood("constrained poisson", 10)
        assert not supports_grouped_likelihood(
            "negative binomial", 10, k_max=4
        )

    def test_gmvae_elbo_grouped_matches_flat(self, rng):
        """The GMVAE training loss through the grouped path must match the
        flat broadcast path (both in interpret mode)."""
        from scvae_tpu.models import gmvae
        from scvae_tpu.ops import (
            fused_grouped_log_likelihood,
            fused_log_likelihood,
        )

        np_rng = np.random.RandomState(4)
        h = jnp.asarray(np_rng.randn(4, 1, 8, 16).astype(np.float32) * 0.3)
        t = jnp.asarray(np_rng.poisson(1.5, (8, 24)).astype(np.float32))
        keys = jax.random.split(rng, 2)
        heads = {
            "p": networks.init_dense(keys[0], 16, 24),
            "log_r": networks.init_dense(keys[1], 16, 24),
        }
        with pltpu.force_tpu_interpret_mode():
            grouped = fused_grouped_log_likelihood(
                "negative binomial", h, heads, t
            )
            flat = fused_log_likelihood("negative binomial", h, heads, t)
        np.testing.assert_allclose(
            np.asarray(grouped), np.asarray(flat), rtol=1e-4, atol=1e-3
        )


class TestSharedTargetsFlatKernel:
    """Flat kernels with 2-D shared t under extra h lead axes (round 3):
    the t index map cycles instead of broadcasting, and the −lgamma(1+t)
    constant can be hoisted out (``include_lgamma_const=False``)."""

    def _make(self, g=3, b=16, hidden=16, f=24, seed=0):
        rng = np.random.RandomState(seed)
        h = jnp.asarray(rng.randn(g, b, hidden).astype(np.float32) * 0.5)
        t = jnp.asarray(rng.poisson(2.0, (b, f)).astype(np.float32))
        keys = jax.random.split(jax.random.PRNGKey(seed), 2)
        heads = {
            "p": networks.init_dense(keys[0], hidden, f),
            "log_r": networks.init_dense(keys[1], hidden, f),
        }
        return h, heads, t

    def test_shared_t_matches_broadcast(self):
        h, heads, t = self._make()
        name = "negative binomial"
        with pltpu.force_tpu_interpret_mode():
            shared = fused_log_likelihood(name, h, heads, t)
            broadcast = fused_log_likelihood(
                name, h, heads,
                jnp.broadcast_to(t, h.shape[:-1] + (t.shape[-1],)),
            )
        np.testing.assert_allclose(
            np.asarray(shared), np.asarray(broadcast), rtol=1e-5, atol=1e-4
        )

    def test_lgamma_const_hoisting(self):
        from scvae_tpu.ops import lgamma

        h, heads, t = self._make()
        name = "negative binomial"
        with pltpu.force_tpu_interpret_mode():
            full = fused_log_likelihood(name, h, heads, t)
            raw = fused_log_likelihood(
                name, h, heads, t, include_lgamma_const=False
            )
        hoisted = raw - jnp.sum(lgamma(1.0 + t), axis=-1)
        np.testing.assert_allclose(
            np.asarray(full), np.asarray(hoisted), rtol=1e-5, atol=1e-3
        )

    def test_shared_t_gradients(self):
        h, heads, t = self._make()
        name = "negative binomial"
        w = jnp.asarray(
            np.random.RandomState(3).rand(*h.shape[:-1]).astype(np.float32)
        )

        def loss_shared(h, heads):
            return jnp.sum(w * fused_log_likelihood(name, h, heads, t))

        def loss_ref(h, heads):
            rows = jnp.stack([
                reference_log_likelihood(name, h[k], heads, t)
                for k in range(h.shape[0])
            ])
            return jnp.sum(w * rows)

        with pltpu.force_tpu_interpret_mode():
            g_shared = jax.grad(loss_shared, argnums=(0, 1))(h, heads)
        g_ref = jax.grad(loss_ref, argnums=(0, 1))(h, heads)
        for a, b in zip(
            jax.tree_util.tree_leaves(g_shared),
            jax.tree_util.tree_leaves(g_ref),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3
            )

    def test_odd_rows_fall_back_to_broadcast(self):
        # b=10 rows don't tile evenly; the kernel broadcasts internally
        h, heads, t = self._make(g=2, b=10)
        name = "negative binomial"
        with pltpu.force_tpu_interpret_mode():
            shared = fused_log_likelihood(name, h, heads, t)
        for k in range(2):
            expected = reference_log_likelihood(name, h[k], heads, t)
            np.testing.assert_allclose(
                np.asarray(shared[k]), np.asarray(expected),
                rtol=1e-4, atol=1e-3,
            )

    def test_modulo_map_full_tiles(self):
        """b=256 = one full row tile per group: exercises the actual
        rem-index map (smaller b falls back to broadcast)."""
        h, heads, t = self._make(g=2, b=256)
        name = "negative binomial"

        def loss_shared(h, heads):
            return jnp.sum(fused_log_likelihood(name, h, heads, t))

        with pltpu.force_tpu_interpret_mode():
            shared = fused_log_likelihood(name, h, heads, t)
            g_shared = jax.grad(loss_shared, argnums=(0, 1))(h, heads)

        def loss_ref(h, heads):
            rows = jnp.stack([
                reference_log_likelihood(name, h[k], heads, t)
                for k in range(h.shape[0])
            ])
            return jnp.sum(rows)

        for k in range(2):
            expected = reference_log_likelihood(name, h[k], heads, t)
            np.testing.assert_allclose(
                np.asarray(shared[k]), np.asarray(expected),
                rtol=1e-4, atol=1e-3,
            )
        g_ref = jax.grad(loss_ref, argnums=(0, 1))(h, heads)
        for a, b in zip(
            jax.tree_util.tree_leaves(g_shared),
            jax.tree_util.tree_leaves(g_ref),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-2
            )

    def test_field_alias_shares_one_gather(self):
        from scvae_tpu.data.pipeline import device_resident_data
        from scvae_tpu.models.step import gather_batch
        from scvae_tpu.ops.gather import FieldAlias, PackedRows

        src = np.random.RandomState(0).poisson(
            1.0, size=(64, 2048)
        ).astype(np.int16)
        data = device_resident_data(
            {"x": src, "t": src}, count_dtype=np.int16, packed=True
        )
        assert isinstance(data["x"], PackedRows)
        assert isinstance(data["t"], FieldAlias)
        assert data["t"].target == "x"
        idx = jnp.asarray(np.arange(16, dtype=np.int32))
        with pltpu.force_tpu_interpret_mode():
            batch = gather_batch(data, idx)
        assert batch["x"] is batch["t"]
        np.testing.assert_array_equal(
            np.asarray(batch["t"]), src[:16].astype(np.float32)
        )
