"""Native C++ densifier tests: parity with scipy and speed sanity."""

import numpy as np
import pytest
import scipy.sparse

from scvae_tpu import native


@pytest.fixture(scope="module")
def csr():
    rng = np.random.RandomState(0)
    return scipy.sparse.random(
        500, 300, density=0.05, format="csr", random_state=rng,
        dtype=np.float32,
    )


def test_available():
    assert native.available(), "native library should build with g++"


def test_gather_parity(csr):
    rows = np.random.RandomState(1).permutation(500)[:64]
    out = native.csr_gather_dense(csr, rows)
    expected = np.asarray(csr[rows].todense(), np.float32)
    np.testing.assert_allclose(out, expected, rtol=1e-6)


def test_gather_repeated_and_empty_rows(csr):
    rows = np.array([0, 0, 499, 1], np.int64)
    out = native.csr_gather_dense(csr, rows)
    expected = np.asarray(csr[rows].todense(), np.float32)
    np.testing.assert_allclose(out, expected, rtol=1e-6)


def test_full_densify_parity(csr):
    out = native.csr_to_dense(csr)
    np.testing.assert_allclose(
        out, np.asarray(csr.todense(), np.float32), rtol=1e-6
    )


def test_pipeline_uses_native(csr):
    from scvae_tpu.data.pipeline import densify_rows

    rows = np.arange(10)
    out = densify_rows(csr, rows)
    np.testing.assert_allclose(
        out, np.asarray(csr[rows].todense(), np.float32), rtol=1e-6
    )


def test_int64_indptr():
    # matrices with int64 index arrays take the same path
    m = scipy.sparse.csr_matrix(
        (np.ones(3, np.float32), np.array([0, 2, 1]), np.array([0, 2, 3])),
        shape=(2, 3),
    )
    m.indptr = m.indptr.astype(np.int64)
    m.indices = m.indices.astype(np.int64)
    out = native.csr_gather_dense(m, np.array([1, 0]))
    np.testing.assert_allclose(
        out, np.asarray(m[[1, 0]].todense(), np.float32)
    )
