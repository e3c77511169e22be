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
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-2000:]}"
        assert f"WORKER {i} OK" in out


_TRAIN_WORKER = """
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
import numpy as np
import jax.numpy as jnp
from iris_tts_tpu.config import (
    DurationConfig, EncoderConfig, IrisConfig, MeshConfig, VAEConfig,
)
from iris_tts_tpu.models.encoder import PhonemeEncoder
from iris_tts_tpu.models.vae import TextConditionedVAE
from iris_tts_tpu.parallel.mesh import build_mesh, initialize_multihost
from iris_tts_tpu.parallel.sharding import (
    batch_sharding_tree, tp_param_sharding,
)
from iris_tts_tpu.train import TrainState, adam_clipped, make_vae_train_step

pid = int(sys.argv[1])
initialize_multihost("localhost:{port}", 2, pid)
assert jax.process_count() == 2 and jax.device_count() == 4

# Global 2x2 (data x model) mesh spanning BOTH processes: every train-step
# gradient psum crosses the host boundary, and the model axis TP-shards
# wide channel dims across hosts too.
mesh_cfg = MeshConfig(data_parallel=2, model_parallel=2)
mesh = build_mesh(mesh_cfg)
cfg = IrisConfig(
    encoder=EncoderConfig(vocab_size=41, embed_dim=32, num_blocks=1,
                          num_heads=2),
    duration=DurationConfig(hidden_dim=16),
    vae=VAEConfig(n_mels=16, cond_dim=32, model_channels=16, latent_dim=8,
                  num_wavenet_blocks=1, decoder_blocks=1, flow_layers=1,
                  flow_hidden=8),
    mesh=mesh_cfg,
)
B, P, T = 4, 8, 16
key = jax.random.PRNGKey(0)  # same on every process: identical host init
encoder = PhonemeEncoder(config=cfg.encoder)
vae = TextConditionedVAE(config=cfg.vae)
p_enc = encoder.init(key, jnp.zeros((1, P), jnp.int32))["params"]
p_vae = vae.init(
    {{"params": key, "sample": key}},
    jnp.zeros((1, T, cfg.vae.n_mels)), jnp.zeros((1, T, cfg.vae.cond_dim)),
)["params"]
# device_put with GLOBAL shardings: replicated-available host values place
# their local shards on each process (pinned by this test).
p_vae = tp_param_sharding(p_vae, mesh, mesh_cfg)
p_enc = tp_param_sharding(p_enc, mesh, mesh_cfg)
state = TrainState.create(
    p_vae, adam_clipped(1e-3), key, frozen={{"encoder": p_enc}}
)
rng = np.random.default_rng(5)  # same batch everywhere (global device_put)
batch = batch_sharding_tree(
    {{
        "phoneme_ids": np.ones((B, P), np.int32),
        "phoneme_mask": np.ones((B, P), np.float32),
        "durations": np.full((B, P), 2.0, np.float32),
        "mel": rng.standard_normal((B, T, cfg.vae.n_mels)).astype(
            np.float32
        ),
    }},
    mesh, mesh_cfg,
)
step = jax.jit(make_vae_train_step(cfg))
st1, m1 = step(state, batch, jnp.asarray(0.01))
st2, m2 = step(st1, batch, jnp.asarray(0.01))
from jax.experimental import multihost_utils
# float() of the fully-replicated global metric reads the local shard;
# allgather the HOST scalar so each controller checks cross-host agreement.
loss2 = multihost_utils.process_allgather(
    np.asarray([float(m2["total"])], np.float64)
).reshape(-1)
assert int(st2.step) == 2
assert np.isfinite(loss2).all(), loss2
# Every process computes the SAME global loss (one logical step, not two
# divergent single-host replicas).
assert abs(float(loss2[0]) - float(loss2[1])) < 1e-6, loss2
assert float(m2["total"]) < float(m1["total"]) + 1.0
print("TRAIN", pid, "OK loss", float(m2["total"]), flush=True)
"""


def test_multihost_vae_train_step():
    """A REAL training step spanning two processes: global 2x2 data x model
    mesh (2 virtual devices per process), TP-sharded params, data-sharded
    batch — the gradient reduction and TP collectives cross the host
    boundary, and both controllers agree on the global loss bit-for-bit.
    This is the pod-topology training path at miniature scale."""
    port = _free_port()
    code = _TRAIN_WORKER.format(repo=str(REPO), port=port)
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
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-2000:]}"
        assert f"TRAIN {i} OK" in out


def test_initialize_multihost_noop_single_process():
    # No coordinator configured → must not touch jax.distributed.
    from iris_tts_tpu.parallel.mesh import initialize_multihost

    initialize_multihost()  # no exception, no state change
