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
