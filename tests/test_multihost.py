"""Multi-host launcher test: two real processes over jax.distributed.

`initialize_multihost` (parallel/mesh.py) was previously a trusted wrapper;
this spawns TWO actual processes on localhost (CPU backend, 2 virtual
devices each), bootstraps the distributed runtime, builds a GLOBAL 4-device
mesh, and runs a cross-process collective plus a jitted global-array
reduction. New functionality — the reference has no distributed backend
(SURVEY.md §2.4)."""

import socket
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_WORKER = """
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
from iris_tts_tpu.config import MeshConfig
from iris_tts_tpu.parallel.mesh import build_mesh, initialize_multihost

pid = int(sys.argv[1])
initialize_multihost("localhost:{port}", 2, pid)

import jax.numpy as jnp
import numpy as np
from jax.experimental import multihost_utils
from jax.sharding import NamedSharding, PartitionSpec

assert jax.process_count() == 2, jax.process_count()
assert jax.local_device_count() == 2
assert jax.device_count() == 4

# Cross-process collective: every process must see every row.
x = jnp.arange(pid * 2, pid * 2 + 2, dtype=jnp.float32)
rows = multihost_utils.process_allgather(x)
assert rows.reshape(-1).tolist() == [0.0, 1.0, 2.0, 3.0], rows

# Global mesh + jitted reduction over a globally-sharded array.
mesh = build_mesh(MeshConfig(data_parallel=4, model_parallel=1))
local = np.arange(pid * 2, pid * 2 + 2, dtype=np.float32)
garr = multihost_utils.host_local_array_to_global_array(
    local, mesh, PartitionSpec("data")
)
total = jax.jit(
    lambda a: jnp.sum(a * 2.0),
    out_shardings=NamedSharding(mesh, PartitionSpec()),
)(garr)
assert float(total) == 12.0, float(total)  # 2 * (0+1+2+3)
print("WORKER", pid, "OK", flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_initialize_multihost_two_processes():
    port = _free_port()
    code = _WORKER.format(repo=str(REPO), port=port)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", code, str(i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-2000:]}"
        assert f"WORKER {i} OK" in out


def test_initialize_multihost_noop_single_process():
    # No coordinator configured → must not touch jax.distributed.
    from iris_tts_tpu.parallel.mesh import initialize_multihost

    initialize_multihost()  # no exception, no state change
