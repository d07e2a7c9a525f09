"""Host input-pipeline tests."""

import numpy as np
import scipy.sparse

from scvae_tpu.data.pipeline import BatchPipeline, build_model_arrays, densify_rows
from scvae_tpu.data.sparse import SparseRowMatrix


def _csr(n=50, f=8, seed=0):
    rng = np.random.RandomState(seed)
    return SparseRowMatrix(
        scipy.sparse.csr_matrix(rng.poisson(1, (n, f)).astype(np.float32))
    )


def test_densify_rows():
    m = _csr()
    out = densify_rows(m, np.array([3, 1]))
    assert out.shape == (2, 8)
    np.testing.assert_array_equal(out[0], np.asarray(m[3].todense()).squeeze())


def test_epoch_covers_all_rows():
    m = _csr()
    pipe = BatchPipeline({"x": m}, batch_size=16, seed=1)
    seen = 0
    for batch in pipe.epoch():
        seen += batch["x"].shape[0]
    assert seen == 50
    assert pipe.batches_per_epoch() == 4


def test_drop_remainder():
    pipe = BatchPipeline({"x": _csr()}, batch_size=16, drop_remainder=True)
    batches = list(pipe.epoch())
    assert len(batches) == 3
    assert all(b["x"].shape[0] == 16 for b in batches)


def test_fields_stay_aligned():
    m = _csr()
    ids = np.arange(50, dtype=np.float32).reshape(-1, 1)
    pipe = BatchPipeline({"x": m, "row_id": ids}, batch_size=10, seed=2)
    dense = np.asarray(m.todense())
    for batch in pipe.epoch():
        rows = np.asarray(batch["row_id"]).astype(int).squeeze(-1)
        np.testing.assert_array_equal(np.asarray(batch["x"]), dense[rows])


def test_shuffling_differs_between_epochs():
    ids = np.arange(50, dtype=np.float32).reshape(-1, 1)
    pipe = BatchPipeline({"row_id": ids}, batch_size=50, seed=3)
    first = np.asarray(next(iter(pipe.epoch()))["row_id"]).squeeze()
    second = np.asarray(next(iter(pipe.epoch()))["row_id"]).squeeze()
    assert not np.array_equal(first, second)
    assert sorted(first) == sorted(second)


def test_build_model_arrays(tmp_path):
    from scvae_tpu.data import DataSet

    ds = DataSet("development", directory=str(tmp_path))
    ds.load()
    arrays = build_model_arrays(
        ds,
        use_count_sum_as_parameter=True,
        use_count_sum_as_feature=True,
    )
    assert set(arrays) == {"x", "t", "count_sum", "count_sum_feature"}
    assert arrays["count_sum"].shape == (10000, 1)
    assert arrays["count_sum_feature"].max() <= 1.0


def test_narrowest_count_dtype():
    import scipy.sparse

    from scvae_tpu.data.pipeline import narrowest_count_dtype

    small = scipy.sparse.csr_matrix(
        np.array([[0.0, 3.0], [12.0, 0.0]], np.float32)
    )
    assert narrowest_count_dtype(small) == np.int16
    big = np.array([[0.0, 70000.0]], np.float32)  # > int16 range
    assert narrowest_count_dtype(big) == np.int32
    fractional = np.array([[0.5, 1.0]], np.float32)
    assert narrowest_count_dtype(fractional) is None
    huge = np.array([[3e9]], np.float64)  # > int32 range
    assert narrowest_count_dtype(huge) is None
    ints = np.array([[1, 2]], np.int64)
    assert narrowest_count_dtype(ints) == np.int16


def test_device_resident_data_uses_narrowest_dtype():
    from scvae_tpu.data.pipeline import device_resident_data

    x = np.array([[0.0, 3.0], [12.0, 0.0]], np.float32)
    data = device_resident_data(
        {"x": x, "t": x}, count_dtype=(np.int16, np.int32)
    )
    assert data["x"].dtype == np.int16
    assert data["x"] is data["t"]  # aliased, transferred once
    frac = np.array([[0.5, 1.0]], np.float32)
    data = device_resident_data(
        {"x": frac}, count_dtype=(np.int16, np.int32)
    )
    assert data["x"].dtype == np.float32


def test_placement_chooser_accounts_for_count_width(tmp_path):
    from scvae_tpu.data import DataSet
    from scvae_tpu.models import VariationalAutoencoder

    ds = DataSet("development", directory=str(tmp_path))
    ds.load()
    model = VariationalAutoencoder(
        feature_size=ds.number_of_features,
        latent_size=2,
        hidden_sizes=[8],
        reconstruction_distribution="poisson",
        log_directory=str(tmp_path / "models"),
    )
    assert model._choose_device_placement(ds, "auto") is True
    assert model._choose_device_placement(ds, "streaming") is False
    # int16-eligible counts: the budget is per 2-byte element, so the
    # dataset fits device memory up to twice the float32 row count.
    budget = model.DEVICE_DATA_BUDGET_BYTES
    n, f = ds.number_of_examples, ds.number_of_features
    assert n * f * 2 <= budget
