"""Test configuration: force an 8-virtual-device CPU JAX platform so
sharding/pjit paths are exercised without TPU hardware (SURVEY.md §4.4)."""

import os

# Must be set before the first backend initialisation.  Force (not
# setdefault): the surrounding environment may pre-select an experimental
# TPU platform whose transcendental precision would perturb the
# scipy-parity tolerances.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# A sitecustomize hook may have already re-pointed jax_platforms at a
# hardware backend via jax.config.update; undo that before any backend is
# instantiated so tests run on the 8-virtual-device CPU platform.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    import jax

    return jax.random.PRNGKey(0)


@pytest.fixture
def np_rng():
    return np.random.RandomState(1234)
