"""Device acquisition with retry, plus the tunnel-safe completion barrier.

Single-tenant TPU attachments (including tunneled dev chips) can refuse new
process claims for a while after another process exits; serving entry points
retry with backoff instead of crashing, and optionally fall back to CPU.
"""

from __future__ import annotations

import logging
import time

logger = logging.getLogger(__name__)


def _try_reregister_plugin() -> bool:
    """Best-effort late (re)registration of a tunneled PJRT plugin whose
    interpreter-start registration failed (e.g. the chip was held by another
    process at that moment and the site hook swallowed the error)."""
    import os
    import uuid

    if "axon" not in os.environ.get("JAX_PLATFORMS", ""):
        return False
    try:
        import jax.extend.backend as jeb

        jeb.clear_backends()
    except Exception:
        pass
    try:
        from axon.register import register

        gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
        register(
            None,
            f"{gen}:1x1x1",
            so_path="/opt/axon/libaxon_pjrt.so",
            session_id=str(uuid.uuid4()),
            remote_compile=os.environ.get("PALLAS_AXON_REMOTE_COMPILE")
            == "1",
        )
        return True
    except Exception as e:
        logger.debug("plugin re-registration failed: %s", e)
        return False


def wait_for_devices(
    max_wait_s: float = 300.0,
    fall_back_to_cpu: bool = True,
):
    """Return ``jax.devices()``, retrying the backend claim with backoff.

    Retries include a best-effort plugin re-registration (a failed claim at
    interpreter start is otherwise unrecoverable in-process). After
    ``max_wait_s`` without a successful claim, either switches the process
    to the CPU backend (default) or re-raises.
    """
    import jax

    deadline = time.time() + max_wait_s
    delay = 5.0
    while True:
        try:
            return jax.devices()
        except RuntimeError as e:
            if time.time() > deadline:
                if fall_back_to_cpu:
                    logger.warning(
                        "no accelerator after %.0fs (%s); using CPU",
                        max_wait_s, e,
                    )
                    jax.config.update("jax_platforms", "cpu")
                    return jax.devices()
                raise
            logger.info("waiting for accelerator claim (%s)", e)
            time.sleep(delay)
            delay = min(delay * 1.5, 30.0)
            _try_reregister_plugin()


def force_done(out) -> None:
    """Force execution AND completion of a dispatched computation.

    ``jax.block_until_ready`` returns before the computation finishes on
    tunneled PJRT backends (observed on axon), so any readiness barrier or
    timing that trusts it is wrong there — a warmup that "blocked" with it
    reported done while the device still ground through the queued
    executions, and the first live serving requests stalled minutes behind
    the backlog (measured: closed-loop p95 of 313 s right after a
    "finished" warmup). Fetching any output to the host is the only
    reliable barrier; the smallest leaf keeps the transfer negligible.

    This is the ONE canonical barrier — scripts/common.sync delegates here.
    """
    import jax
    import numpy as np

    leaves = jax.tree_util.tree_leaves(out)
    if leaves:
        np.asarray(min(leaves, key=lambda a: getattr(a, "size", 1)))
