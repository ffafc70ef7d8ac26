"""Multi-host bootstrap: 2 real OS processes, localhost coordinator, CPU
devices -- the same jax.distributed program path a TPU pod takes (VERDICT
item 3). Each process owns 4 virtual devices; the test proves

  * the (data, graph) global mesh constructs across processes,
  * per-process batch slices assemble into global arrays
    (make_array_from_process_local_data),
  * a jitted sharded computation produces the same global result on both
    processes (i.e. collectives crossed the process boundary).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import os, sys
import numpy as np

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

sys.path.insert(0, os.environ["REPO_ROOT"])

from gncde_tpu.parallel import multihost

multihost.initialize(
    coordinator_address=os.environ["COORDINATOR_ADDRESS"],
    num_processes=2,
    process_id=int(os.environ["PROCESS_ID"]),
)

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()

mesh = multihost.make_global_mesh(graph_axis=2)
assert mesh.devices.shape == (4, 2), mesh.devices.shape

B, n = 8, 6
rows = multihost.process_batch_slice(B)
full = np.arange(B * n, dtype=np.float32).reshape(B, n)
local = full[rows]

sharding = NamedSharding(mesh, P("data", None))
gbatch = multihost.distribute_batch(local, sharding)
assert gbatch.shape == (B, n), gbatch.shape

@jax.jit
def f(x):
    return jnp.sum(x * 2.0), jnp.mean(x, axis=0)

total, mean = f(gbatch)
expect_total = float(full.sum() * 2.0)
got = float(jax.device_get(total))
assert abs(got - expect_total) < 1e-3, (got, expect_total)
np.testing.assert_allclose(
    np.asarray(jax.device_get(mean)), full.mean(0), rtol=1e-6
)
print(f"OK process={jax.process_index()} total={got}")
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(tmp_path, repo_root, timeout):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    port = _free_port()

    procs = []
    for pid in (0, 1):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env.pop("JAX_PLATFORMS", None)
        env.update(
            COORDINATOR_ADDRESS=f"localhost:{port}",
            PROCESS_ID=str(pid),
            REPO_ROOT=repo_root,
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
                q.wait()
            return None
        outs.append(out)
    return list(zip(procs, outs))


def test_two_process_cpu_bootstrap(tmp_path):
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # One retry: under a loaded machine the coordinator handshake (fresh JAX
    # import per worker) can blow the first timeout, and the free-port probe
    # can race another test's bind.
    results = _run_workers(tmp_path, repo_root, timeout=300)
    if results is None:
        results = _run_workers(tmp_path, repo_root, timeout=600)
    if results is None:
        pytest.fail("multi-process worker timed out (after retry)")
    for pid, (p, out) in enumerate(results):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert "OK process=" in out, out


CACHE_WORKER = r"""
import os, sys, glob
import numpy as np

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

sys.path.insert(0, os.environ["REPO_ROOT"])

from gncde_tpu.parallel import multihost

multihost.initialize(
    coordinator_address=os.environ["COORDINATOR_ADDRESS"],
    num_processes=2,
    process_id=int(os.environ["PROCESS_ID"]),
)

import jax

from gncde_tpu.configs.dataset_configs import PGTDataSetCfg

cache_dir = os.environ["SHARED_CACHE"]
cfg = PGTDataSetCfg(
    name="england-covid", window_size=5, stride=5,
    interpolation="cubic", cache_dir=cache_dir,
    shard_train_windows=True,
)

pi = jax.process_index()
loader = cfg.get_training_data()          # MISS: computes + writes host shard
n_first = len(loader.windows)
files_mine = sorted(
    os.path.basename(f)
    for f in glob.glob(os.path.join(cache_dir, "*default_train*.pkl"))
    if f"host{pi}of2" in f
)
assert files_mine, "host-sharded cache file missing"
mtimes = {f: os.path.getmtime(os.path.join(cache_dir, f)) for f in files_mine}

loader2 = cfg.get_training_data()         # HIT: same file, not rewritten
assert len(loader2.windows) == n_first
for f in files_mine:
    assert os.path.getmtime(os.path.join(cache_dir, f)) == mtimes[f], (
        "cache hit rewrote the shard file"
    )

# Eval splits stay whole per host (host-keyed file, full content).
val = cfg.get_validation_data()
first_t = float(np.asarray(loader.windows[0]["x_t"]).sum()) if n_first else -1.0
print(f"CACHEOK process={pi} train_windows={n_first} "
      f"val_windows={len(val.windows)} first_t={first_t:.4f}")
"""


def test_two_process_shard_aware_cache(tmp_path):
    """Multi-host data caching (SURVEY section 5): each host writes its OWN
    md5+host-keyed cache file holding only its round-robin shard of the
    training windows; a second read is a hit (file not rewritten); eval
    splits stay whole. Shards must be disjoint and exhaustive across the 2
    hosts (counts sum to the single-process count)."""
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    # Single-process ground truth for the window counts.
    from gncde_tpu.configs.dataset_configs import PGTDataSetCfg

    solo_cache = tmp_path / "solo_cache"
    solo = PGTDataSetCfg(
        name="england-covid", window_size=5, stride=5,
        interpolation="cubic", cache_dir=str(solo_cache),
    )
    n_total = len(solo.get_training_data().windows)
    n_val = len(solo.get_validation_data().windows)

    shared = tmp_path / "shared_cache"
    shared.mkdir()
    script = tmp_path / "cache_worker.py"
    script.write_text(CACHE_WORKER)
    port = _free_port()
    procs = []
    for pid in (0, 1):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env.pop("JAX_PLATFORMS", None)
        env.update(
            COORDINATOR_ADDRESS=f"localhost:{port}",
            PROCESS_ID=str(pid),
            REPO_ROOT=repo_root,
            SHARED_CACHE=str(shared),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
                q.wait()
            pytest.fail("cache worker timed out")
        outs.append(out)

    counts = {}
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        for line in out.splitlines():
            if line.startswith("CACHEOK"):
                kv = dict(tok.split("=") for tok in line.split()[1:])
                counts[int(kv["process"])] = kv
    assert set(counts) == {0, 1}, outs
    n0 = int(counts[0]["train_windows"])
    n1 = int(counts[1]["train_windows"])
    assert n0 + n1 == n_total, (n0, n1, n_total)
    assert int(counts[0]["val_windows"]) == n_val
    assert int(counts[1]["val_windows"]) == n_val
    # Round-robin shards see different first windows (disjointness probe:
    # the first window's feature content differs between hosts).
    if n0 and n1:
        assert counts[0]["first_t"] != counts[1]["first_t"]
    # Host-keyed shard files for both hosts exist side by side.
    names = [f.name for f in shared.glob("*default_train*.pkl")]
    assert any("host0of2" in f for f in names), names
    assert any("host1of2" in f for f in names), names


TRAIN_WORKER = r"""
import os, sys
import numpy as np

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

sys.path.insert(0, os.environ["REPO_ROOT"])

from gncde_tpu.parallel import multihost

multihost.initialize(
    coordinator_address=os.environ["COORDINATOR_ADDRESS"],
    num_processes=2,
    process_id=int(os.environ["PROCESS_ID"]),
)

import jax
import jax.numpy as jnp
import jax.random as jr
import optax

from gncde_tpu.interp import backward_hermite_coefficients
from gncde_tpu.models import GraphNeuralCDE
from gncde_tpu.models.vector_fields import PermEquivGraphVectorField
from gncde_tpu.nn import partition, is_inexact_array
from gncde_tpu.train.sharded import make_sharded_step

mesh = multihost.make_global_mesh(graph_axis=2)

n, T, H, B = 16, 6, 4, 8
key = jr.PRNGKey(0)  # same seed on both processes -> identical model
k_vf, k_model, k_A, k_x0 = jr.split(key, 4)
vf = PermEquivGraphVectorField(
    input_dim=H, hidden_dim=H, output_dim=H, num_layers=2,
    data_embed_dim=1, num_nodes=n, key=k_vf,
)
model = GraphNeuralCDE(vf, hidden_dim=H, interpolation="cubic",
                       method="Tsit5", return_sequence=True, max_steps=32,
                       key=k_model)

ts = jnp.linspace(0.0, 1.0, T)
A_path = jr.uniform(k_A, (B, T, n, n)) * 0.1
t_idx = jnp.broadcast_to(ts[None, :, None, None], (B, T, n, n))
X = jnp.stack([t_idx, A_path], axis=-1)
coeffs = jax.vmap(lambda x: backward_hermite_coefficients(ts, x))(X)
ts_b = jnp.broadcast_to(ts, (B, T))
x0 = jr.normal(k_x0, (B, n, 1))
true_y = jnp.zeros((B, T, n))
data = (ts_b, coeffs, true_y, x0)

def loss(m, d):
    ts_, cf, label, x0_ = d
    pred = jax.vmap(m)(ts_, cf, x0_)
    return jnp.mean((jnp.squeeze(pred, -1) - label) ** 2)

optimiser = optax.adamw(1e-3)
params, _ = partition(model, is_inexact_array)
opt_state = optimiser.init(params)

# Each process feeds only ITS local batch rows; distribute_batch assembles
# the global array from per-process shards.
rows = multihost.process_batch_slice(B)
local = jax.tree_util.tree_map(lambda x: np.asarray(x)[rows], data)

with mesh:
    step, place = make_sharded_step(mesh, optimiser, loss, local)
    model_p, opt_state_p, data_p = place(model, opt_state, local)
    loss1, model_p, opt_state_p = step(model_p, opt_state_p, data_p)
    loss2, model_p, opt_state_p = step(model_p, opt_state_p, data_p)

l1 = float(jax.device_get(loss1))
l2 = float(jax.device_get(loss2))
params_after, _ = partition(model_p, is_inexact_array)
checksum = float(sum(
    jnp.sum(jnp.abs(p)) for p in jax.tree_util.tree_leaves(params_after)
    if p is not None
))
assert np.isfinite(l1) and np.isfinite(l2), (l1, l2)
assert l2 < l1, "second step did not reduce the loss"
print(f"TRAINOK process={jax.process_index()} loss1={l1:.9f} "
      f"loss2={l2:.9f} checksum={checksum:.9f}")
"""


def test_two_process_sharded_train_step(tmp_path):
    """FULL sharded training step across 2 OS processes (DP over the batch
    x graph partition over nodes): the loss decreases, and loss values AND
    the post-step parameter checksum agree bit-for-bit across processes
    (the psum'd gradients kept the replicated weights in sync)."""
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "train_worker.py"
    script.write_text(TRAIN_WORKER)
    port = _free_port()
    procs = []
    for pid in (0, 1):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env.pop("JAX_PLATFORMS", None)
        env.update(
            COORDINATOR_ADDRESS=f"localhost:{port}",
            PROCESS_ID=str(pid),
            REPO_ROOT=repo_root,
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
                q.wait()
            pytest.fail("train worker timed out")
        outs.append(out)

    lines = {}
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        for line in out.splitlines():
            if line.startswith("TRAINOK"):
                kv = dict(tok.split("=") for tok in line.split()[1:])
                lines[int(kv["process"])] = kv
    assert set(lines) == {0, 1}, outs
    for field in ("loss1", "loss2", "checksum"):
        assert lines[0][field] == lines[1][field], (field, lines)


PALLAS_TRAIN_WORKER = r"""
import os, sys
import numpy as np

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

sys.path.insert(0, os.environ["REPO_ROOT"])

from gncde_tpu.parallel import multihost

multihost.initialize(
    coordinator_address=os.environ["COORDINATOR_ADDRESS"],
    num_processes=2,
    process_id=int(os.environ["PROCESS_ID"]),
)

import jax
import jax.numpy as jnp
import jax.random as jr
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gncde_tpu.interp import backward_hermite_coefficients
from gncde_tpu.models.vector_fields import PermEquivGraphVectorField
from gncde_tpu.parallel.sharded_model import make_sharded_gncde_loss
from gncde_tpu.solve import ConstantStepSize

# GRAPH axis across ALL 8 global devices: the node partition spans the two
# OS processes, so the Pallas path's all_gather/psum_scatter ride the
# cross-process transport.
mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("graph",))

n, T, H = 32, 5, 4
key = jr.PRNGKey(0)  # same seed on both processes
vf = PermEquivGraphVectorField(
    input_dim=H, hidden_dim=H, output_dim=H, num_layers=2,
    data_embed_dim=1, num_nodes=n, key=key,
)
ts = jnp.linspace(0.0, 1.0, T)
A_path = jr.uniform(jr.PRNGKey(1), (T, n, n)) * 0.1
coeffs = tuple(backward_hermite_coefficients(ts, A_path))
y0 = jr.normal(jr.PRNGKey(2), (n, H)) * 0.1
labels = jnp.zeros((T, n, H))

loss_fn, params0 = make_sharded_gncde_loss(
    mesh, vf, backend="pallas", tile=4, max_steps=64,
    stepsize_controller=ConstantStepSize(), dt0=0.1,
)

def glob(x, spec):
    s = NamedSharding(mesh, spec)
    return jax.make_array_from_process_local_data(s, np.asarray(x))

# make_array_from_process_local_data consumes THIS process's rows of every
# sharded axis: the graph axis spans both processes, so each passes its
# half of the node dimension.
pid = jax.process_index()
half = slice(pid * (n // 2), (pid + 1) * (n // 2))
ts_g = glob(ts, P(None))
coeffs_g = tuple(glob(c[:, half], P(None, "graph", None)) for c in coeffs)
y0_g = glob(y0[half], P("graph", None))
labels_g = glob(labels[:, half], P(None, "graph", None))
params_g = jax.tree_util.tree_map(
    lambda p: glob(p, P()), params0,
)

step = jax.jit(jax.value_and_grad(loss_fn))
loss1, grads = step(params_g, ts_g, coeffs_g, y0_g, labels_g)
params2 = jax.tree_util.tree_map(
    lambda p, g: p if g is None else p - 1e-2 * g, params_g, grads,
    is_leaf=lambda x: x is None,
)
loss2, _ = step(params2, ts_g, coeffs_g, y0_g, labels_g)
l1 = float(jax.device_get(loss1))
l2 = float(jax.device_get(loss2))
checksum = float(sum(
    float(jnp.sum(jnp.abs(jax.device_get(g))))
    for g in jax.tree_util.tree_leaves(grads) if g is not None
))
assert np.isfinite(l1) and np.isfinite(l2), (l1, l2)
assert l2 < l1, "gradient step did not reduce the loss"
print(f"PTRAINOK process={jax.process_index()} loss1={l1:.9f} "
      f"loss2={l2:.9f} checksum={checksum:.9f}")
"""


def test_two_process_pallas_sharded_train(tmp_path):
    """The Pallas-kernel sharded training loss across 2 OS processes with
    the GRAPH axis spanning both: per-shard tiled pair kernels + cross-
    process all_gather/psum_scatter, gradients through the adjoint. Losses
    and gradient checksums must agree bit-for-bit across processes."""
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "pallas_train_worker.py"
    script.write_text(PALLAS_TRAIN_WORKER)
    port = _free_port()
    procs = []
    for pid in (0, 1):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env.pop("JAX_PLATFORMS", None)
        env.update(
            COORDINATOR_ADDRESS=f"localhost:{port}",
            PROCESS_ID=str(pid),
            REPO_ROOT=repo_root,
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
                q.wait()
            pytest.fail("pallas train worker timed out")
        outs.append(out)

    lines = {}
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        for line in out.splitlines():
            if line.startswith("PTRAINOK"):
                kv = dict(tok.split("=") for tok in line.split()[1:])
                lines[int(kv["process"])] = kv
    assert set(lines) == {0, 1}, outs
    for field in ("loss1", "loss2", "checksum"):
        assert lines[0][field] == lines[1][field], (field, lines)
