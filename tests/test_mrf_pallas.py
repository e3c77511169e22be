"""Fused MRF Pallas kernel vs the flax ResBlock composition (interpret mode;
the real-chip timing comparison lives in scripts/bench_mrf.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iris_tts_tpu.models.hifigan import ResBlock
from iris_tts_tpu.ops.mrf_pallas import (
    mrf_halo,
    mrf_stage_pallas,
    stack_resblock_params,
)


def _reference_mrf(x, mods, params):
    acc = None
    for mod, p in zip(mods, params):
        out = mod.apply({"params": p}, x)
        acc = out if acc is None else acc + out
    return acc / len(mods)


def _build(key, c, kernel_sizes, dilations, t, b=2):
    x = jax.random.normal(key, (b, t, c), jnp.float32)
    mods, params = [], []
    tree = {}
    for j, (k, dils) in enumerate(zip(kernel_sizes, dilations)):
        m = ResBlock(c, k, dils)
        p = m.init(jax.random.fold_in(key, j), x)["params"]
        mods.append(m)
        params.append(p)
        tree[f"resblocks_{j}"] = p
    return x, mods, params, tree


@pytest.mark.parametrize(
    "c,kernel_sizes,dilations,t",
    [
        (32, (3, 7, 11), ((1, 3, 5),) * 3, 300),  # production MRF topology
        (64, (3, 5), ((1, 2), (2, 4)), 257),      # uneven tail tile
        (128, (3,), ((1, 3),), 64),               # t < tile
    ],
)
def test_mrf_pallas_matches_resblocks(c, kernel_sizes, dilations, t):
    key = jax.random.PRNGKey(0)
    x, mods, params, tree = _build(key, c, kernel_sizes, dilations, t)
    want = _reference_mrf(x, mods, params)

    weights, biases = stack_resblock_params(tree, 0, len(kernel_sizes))
    got = mrf_stage_pallas(
        x, weights, biases, kernel_sizes, dilations,
        tile=128, interpret=True,
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_mrf_halo_values():
    # raw margins 60 / 2, rounded up to the 8-row sublane boundary
    assert mrf_halo((3, 7, 11), ((1, 3, 5),) * 3) == 64
    assert mrf_halo((3,), ((1,),)) == 8


def test_mrf_pallas_bf16_close_to_f32():
    key = jax.random.PRNGKey(1)
    kernel_sizes, dilations = (3, 7), ((1, 3), (1, 3))
    x, mods, params, tree = _build(key, 64, kernel_sizes, dilations, 200)
    want = _reference_mrf(x, mods, params)
    weights, biases = stack_resblock_params(
        tree, 0, len(kernel_sizes), dtype=jnp.bfloat16
    )
    got = mrf_stage_pallas(
        x.astype(jnp.bfloat16), weights, biases, kernel_sizes, dilations,
        tile=128, interpret=True,
    )
    err = np.max(np.abs(np.asarray(got, np.float32) - np.asarray(want)))
    assert err < 0.15, err  # bf16 storage, f32 accumulation


def test_hifigan_apply_fused_matches_module():
    """hifigan_apply_fused == HiFiGANGenerator.apply (Pallas interpret mode
    for stages within the VMEM budget, XLA for the rest)."""
    from iris_tts_tpu.config import HiFiGANConfig
    from iris_tts_tpu.models.hifigan import (
        HiFiGANGenerator,
        hifigan_apply_fused,
    )

    cfg = HiFiGANConfig(
        in_channels=16,
        upsample_rates=(4, 2),
        upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=64,
        resblock_kernel_sizes=(3, 5),
        resblock_dilations=((1, 3), (1, 2)),
    )
    gen = HiFiGANGenerator(config=cfg)
    mel = jax.random.normal(jax.random.PRNGKey(0), (2, 40, 16))
    params = gen.init(jax.random.PRNGKey(1), mel)["params"]
    want = gen.apply({"params": params}, mel)

    got_xla = hifigan_apply_fused(params, mel, cfg, mrf_impl="xla")
    np.testing.assert_allclose(
        np.asarray(got_xla), np.asarray(want), atol=2e-5, rtol=2e-5
    )

    got_pl = hifigan_apply_fused(
        params, mel, cfg, mrf_impl="pallas", tile=128, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got_pl), np.asarray(want), atol=2e-5, rtol=2e-5
    )
