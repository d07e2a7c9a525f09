"""Two-process ``jax.distributed`` loopback test (SURVEY.md §7 hard part 5).

Launches two CPU processes (4 virtual devices each, gloo collectives) that
train the SAME model through the user-facing ``train()`` API over one
8-device global mesh, with per-process shard feeding
(``jax.make_array_from_process_local_data``) and process-0-gated
checkpoint/curve writes, then asserts the learning curve matches a
single-process 8-device run bit-for-tolerance.

The validation bound that drives early stopping is computed inside ``jit``
over globally-sharded arrays, so GSPMD inserts the cross-process
reductions and every process reaches the identical stopping decision — the
multi-host equivalent of the reference's host-side accumulation loops
(``variational_autoencoder.py:2016-2055``), which had no multi-process
story at all.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import json, os, sys

process_id = int(sys.argv[1])
port = sys.argv[2]
data_dir = sys.argv[3]
models_dir = sys.argv[4]
out_path = sys.argv[5]

os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}",
    num_processes=2,
    process_id=process_id,
)
assert jax.device_count() == 8, jax.device_count()
assert jax.local_device_count() == 4

from scvae_tpu.data import DataSet
from scvae_tpu.models import VariationalAutoencoder
from scvae_tpu.parallel import create_mesh

data_set = DataSet(
    "development", directory=data_dir, example_filter=["random", 512]
)
training_set, validation_set, _ = data_set.split(method="random", fraction=0.9)

model = VariationalAutoencoder(
    feature_size=25,
    latent_size=2,
    hidden_sizes=[16],
    reconstruction_distribution="negative binomial",
    log_directory=models_dir,
)
result = model.train(
    training_set,
    validation_set,
    number_of_epochs=3,
    minibatch_size=64,
    mesh=create_mesh(),  # all 8 global devices, pure DP
    verbose=False,
)
if process_id == 0:
    with open(out_path, "w") as f:
        json.dump(result.history, f)

# Round 4: multi-host PACKED staging (the real-pod fast path) — each
# process transfers only its row block of the DMA-aligned packed layout
# and the global array assembles with whole logical rows per device.
# Placement only: the gather kernel itself cannot run under the CPU
# interpreter across processes (its global barrier spans all manual
# devices, which live in different processes here); on a real pod it
# runs natively.
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec

from scvae_tpu import ops
from scvae_tpu.ops.gather import PackedRows, pack_rows

mesh2 = create_mesh()
vals = np.arange(64 * 1024, dtype=np.float32).reshape(64, 1024)
with ops.force_pallas():
    packed = pack_rows(
        vals, sharding=NamedSharding(mesh2, PartitionSpec("data"))
    )
assert isinstance(packed, PackedRows) and packed.mesh is mesh2
align = packed.align
expected = vals.reshape(64 * align, 1024 // align)
for shard in packed.data.addressable_shards:
    start = shard.index[0].start or 0
    rows = np.asarray(shard.data)
    np.testing.assert_array_equal(
        rows, expected[start:start + rows.shape[0]]
    )
    assert rows.shape[0] % align == 0  # whole logical rows per device
print(f"worker {process_id} packed staging ok", flush=True)
print(f"worker {process_id} done", flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


# Packed-layout NUMERIC verification across processes (VERDICT r04
# item 4 / round-4's row-34 partial): the Pallas interpreter cannot span
# processes, but the jnp REFERENCE gather (bit-identical outputs over
# the same packed per-process row blocks and shard-stratified
# permutations) can — so the flagship data layout's training curves are
# asserted numerically across a real 2-process gloo loopback, not just
# placement-checked.  F=1024 f32/int32 packs (1024 = 8·128); the
# development set's F=25 cannot.
PACKED_DATASET = r"""
import numpy as np

def make_packed_sets():
    from scvae_tpu.data import DataSet

    F = 1024
    rng = np.random.RandomState(0)
    counts = rng.poisson(1.5, size=(576, F)).astype(np.float32)
    labels = np.array([f"type {k % 3}" for k in range(576)])

    def subset(lo, hi, kind):
        return DataSet(
            "packedsynth", title="packed synth", specifications={},
            values=counts[lo:hi], labels=labels[lo:hi],
            example_names=np.array([f"cell {i}" for i in range(lo, hi)]),
            feature_names=np.array([f"gene {j}" for j in range(F)]),
            kind=kind, version="original",
        )

    return subset(0, 512, "training"), subset(512, 576, "validation")
"""

WORKER_PACKED = r"""
import json, os, sys

process_id = int(sys.argv[1])
port = sys.argv[2]
models_dir = sys.argv[3]
out_path = sys.argv[4]

os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}",
    num_processes=2,
    process_id=process_id,
)
assert jax.device_count() == 8

from scvae_tpu import ops
from scvae_tpu.models import VariationalAutoencoder
from scvae_tpu.ops import gather as gather_mod
from scvae_tpu.parallel import create_mesh

__PACKED_DATASET__

training_set, validation_set = make_packed_sets()

# Count reference-gather engagements so a silent fallback to the
# unpacked path cannot fake a pass.
calls = {"n": 0}
_orig = gather_mod._reference_gather
def counting(*a, **k):
    calls["n"] += 1
    return _orig(*a, **k)
gather_mod._reference_gather = counting

model = VariationalAutoencoder(
    feature_size=1024,
    latent_size=2,
    hidden_sizes=[16],
    reconstruction_distribution="negative binomial",
    log_directory=models_dir,
)
with ops.use_reference_gather():
    result = model.train(
        training_set,
        validation_set,
        number_of_epochs=3,
        minibatch_size=64,
        mesh=create_mesh(),
        verbose=False,
    )
assert calls["n"] > 0, "reference packed gather never engaged"
if process_id == 0:
    with open(out_path, "w") as f:
        json.dump(result.history, f)
print(f"worker {process_id} done", flush=True)
"""


@pytest.mark.slow
def test_two_process_packed_layout_curves_match(tmp_path):
    """2-process gloo loopback TRAINING CURVES on the packed layout
    (per-process row blocks + shard-stratified permutations + packed
    gather numerics) equal the single-process 8-device run."""
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    # Single-process 8-device run on the same packed-reference path.
    import scvae_tpu.ops.gather as gather_mod
    from scvae_tpu import ops
    from scvae_tpu.models import VariationalAutoencoder
    from scvae_tpu.parallel import create_mesh

    namespace = {}
    exec(PACKED_DATASET, namespace)
    training_set, validation_set = namespace["make_packed_sets"]()

    calls = {"n": 0}
    orig = gather_mod._reference_gather

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    gather_mod._reference_gather = counting
    try:
        single_model = VariationalAutoencoder(
            feature_size=1024,
            latent_size=2,
            hidden_sizes=[16],
            reconstruction_distribution="negative binomial",
            log_directory=str(tmp_path / "models_single"),
        )
        with ops.use_reference_gather():
            single = single_model.train(
                training_set,
                validation_set,
                number_of_epochs=3,
                minibatch_size=64,
                mesh=create_mesh(),
                verbose=False,
            )
    finally:
        gather_mod._reference_gather = orig
    assert calls["n"] > 0, "packed layout did not engage single-process"

    worker_path = tmp_path / "worker_packed.py"
    worker_path.write_text(
        WORKER_PACKED.replace("__PACKED_DATASET__", PACKED_DATASET)
    )
    port = _free_port()
    out_path = str(tmp_path / "history_packed.json")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                str(worker_path),
                str(process_id),
                str(port),
                str(tmp_path / "models_multi"),
                out_path,
            ],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for process_id in (0, 1)
    ]
    outputs = []
    for proc in procs:
        try:
            out, _ = proc.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for p in procs:
                p.kill()
            raise
        outputs.append(out.decode(errors="replace"))
    for process_id, (proc, out) in enumerate(zip(procs, outputs)):
        assert proc.returncode == 0, (
            f"packed worker {process_id} failed:\n{out[-4000:]}"
        )

    with open(out_path) as f:
        multi_history = json.load(f)
    for kind in ("training", "validation"):
        a = np.asarray(single.history[kind]["lower_bound"])
        b = np.asarray(multi_history[kind]["lower_bound"])
        assert a.shape == b.shape
        np.testing.assert_allclose(
            a, b, rtol=1e-3, atol=1e-2,
            err_msg=f"packed-layout {kind} curve diverged between "
            "1-process and 2-process execution",
        )


@pytest.mark.slow
def test_two_process_loopback_matches_single_process(tmp_path):
    data_dir = str(tmp_path / "data")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    # Pre-build the dataset + split caches so the workers only read.
    from scvae_tpu.data import DataSet

    data_set = DataSet(
        "development", directory=data_dir, example_filter=["random", 512]
    )
    training_set, validation_set, _ = data_set.split(
        method="random", fraction=0.9
    )

    # Single-process 8-device run (the pytest process already has 8
    # virtual CPU devices via conftest).
    from scvae_tpu.models import VariationalAutoencoder
    from scvae_tpu.parallel import create_mesh

    single_model = VariationalAutoencoder(
        feature_size=25,
        latent_size=2,
        hidden_sizes=[16],
        reconstruction_distribution="negative binomial",
        log_directory=str(tmp_path / "models_single"),
    )
    single = single_model.train(
        training_set,
        validation_set,
        number_of_epochs=3,
        minibatch_size=64,
        mesh=create_mesh(),
        verbose=False,
    )

    # Two-process run over the same 8-device logical mesh.
    worker_path = tmp_path / "worker.py"
    worker_path.write_text(WORKER)
    port = _free_port()
    out_path = str(tmp_path / "history.json")
    models_dir = str(tmp_path / "models_multi")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                str(worker_path),
                str(process_id),
                str(port),
                data_dir,
                models_dir,
                out_path,
            ],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for process_id in (0, 1)
    ]
    outputs = []
    for proc in procs:
        try:
            out, _ = proc.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for p in procs:
                p.kill()
            raise
        outputs.append(out.decode(errors="replace"))
    for process_id, (proc, out) in enumerate(zip(procs, outputs)):
        assert proc.returncode == 0, (
            f"worker {process_id} failed:\n{out[-4000:]}"
        )

    with open(out_path) as f:
        multi_history = json.load(f)

    for kind in ("training", "validation"):
        a = np.asarray(single.history[kind]["lower_bound"])
        b = np.asarray(multi_history[kind]["lower_bound"])
        assert a.shape == b.shape
        # gloo all-reduce ordering differs from the single-process
        # reduction; ~1e-4 relative agreement after 3 epochs is exact
        # modulo float summation order.
        np.testing.assert_allclose(
            a, b, rtol=1e-3, atol=1e-2,
            err_msg=f"{kind} curve diverged between 1-process and "
            f"2-process execution",
        )

    # Process-0-gated writes: exactly one consistent checkpoint tree.
    assert os.path.exists(
        os.path.join(models_dir, single_model.name, "checkpoint.npz")
    )
