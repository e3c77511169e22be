"""Fused multi-receptive-field (MRF) vocoder stage as a Pallas TPU kernel.

One HiFiGAN upsample stage runs ``num_kernels`` ResBlocks — for the
production topology that is 18 dilated convolutions, each of which XLA
executes as its own HBM-resident op: ~36 full [T, C] reads+writes per stage
(reference torch structure: /root/reference/src/iris/hifigan_pretrained.py:
38-71,123-143). At the late stages (C = 128/64/32, T up to ~256x the mel
length) the arithmetic intensity is so low that HBM traffic, not FLOPs, sets
the speed — exactly the BASELINE north-star case for a fused kernel.

This kernel keeps the ENTIRE MRF stage resident in VMEM: each grid step
streams one time tile plus two small halo blocks in through the standard
Pallas pipeline (no manual DMA), runs every resblock's
(leaky-relu → dilated conv → leaky-relu → conv → residual) chain as
valid-mode shifted matmuls on the MXU (f32 accumulation), averages the
resblock outputs, and writes one [TILE, C] block back — ~1 HBM read + 1 HBM
write per stage instead of ~36.

VMEM budget: all stage weights are resident — 2·Σ_j 3·k_j·C² params. For the
production config (k = 3,7,11, 3 dilation pairs) that is 504·C² bytes in
f32: C=128 → 8.3 MB (fits), C=256 → 33 MB (does not; the C=256 stage keeps
the XLA path — its T is 64x smaller, so it was never the bottleneck).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LRELU_SLOPE = 0.1


def _lrelu(x):
    return jnp.where(x >= 0, x, _LRELU_SLOPE * x)


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def mrf_halo(
    kernel_sizes: Sequence[int], dilations: Sequence[Sequence[int]]
) -> int:
    """One-sided receptive-field margin of the deepest resblock,
    sublane-aligned (multiple of 8)."""
    halos = []
    for k, dils in zip(kernel_sizes, dilations):
        halos.append(sum((k - 1) * d // 2 + (k - 1) // 2 for d in dils))
    return _round_up(max(halos), 8)


def _conv_valid(a: jnp.ndarray, w: jnp.ndarray, d: int) -> jnp.ndarray:
    """Valid-mode dilated conv on VMEM-resident data as k shifted MXU
    matmuls.

    a [L, C], w [k, C, C] → [L − (k−1)·d, C] f32; output index i equals the
    'same'-padded conv at input position i + (k−1)·d/2.

    An in-kernel im2col variant (concatenate k slices → one [L, k·C]
    matmul) was tried for narrow channels and removed: the round-3 Mosaic
    compile helper consistently 500s on it, and the plain shifted-matmul
    form WINS against XLA at every narrow stage anyway (C=128 1.56x,
    C=64 1.48x, C=32 1.29x — scripts/bench_mrf.py, v5e, bf16, tile 2048).
    """
    k = w.shape[0]
    l_out = a.shape[0] - (k - 1) * d
    acc = None
    for j in range(k):
        s = jax.lax.slice_in_dim(a, j * d, j * d + l_out, axis=0)
        t = jnp.dot(s, w[j], preferred_element_type=jnp.float32)
        acc = t if acc is None else acc + t
    return acc


def _mrf_kernel(
    kernel_sizes: Tuple[int, ...],
    dilations: Tuple[Tuple[int, ...], ...],
    halo: int,
    tile: int,
    t_true: int,
    curr_ref,  # [1, tile, C]
    left_ref,  # [1, 1, halo, C]
    right_ref,  # [1, 1, halo, C]
    *refs,  # per-resblock (w_ref, b_ref) pairs, then out_ref
):
    n_rb = len(kernel_sizes)
    w_refs = [refs[2 * j] for j in range(n_rb)]
    b_refs = [refs[2 * j + 1] for j in range(n_rb)]
    out_ref = refs[2 * n_rb]

    i = pl.program_id(1)

    x0 = jnp.concatenate(
        [left_ref[0, 0], curr_ref[0], right_ref[0, 0]], axis=0
    ).astype(jnp.float32)  # [tile + 2·halo, C]

    # The flax/torch path zero-pads at EVERY conv layer, so positions beyond
    # the true sequence must read as exact zeros into each conv — otherwise
    # bias terms leak junk through the sequence edges. Row r of a buffer
    # whose left margin is `used` sits at original time
    # i·tile − halo + used + r; real data lives in [0, t_true).
    tile_origin = i * tile - halo

    def _mask(v, used):
        coord = tile_origin + used + jax.lax.broadcasted_iota(
            jnp.int32, v.shape, 0
        )
        ok = (coord >= 0) & (coord < t_true)
        return jnp.where(ok, v, 0.0)

    acc = None
    for j, (k, dils) in enumerate(zip(kernel_sizes, dilations)):
        w = w_refs[j]  # [2·n_pairs, k, C, C]
        bias = b_refs[j]  # [2·n_pairs, C]
        cur = x0
        used = 0  # one-sided margin consumed so far in this resblock
        for p, d in enumerate(dils):
            wd = w[2 * p].astype(jnp.float32)
            wu = w[2 * p + 1].astype(jnp.float32)
            h = _conv_valid(_lrelu(cur), wd, d) + bias[2 * p].astype(
                jnp.float32
            )
            h = _mask(h, used + (k - 1) * d // 2)
            h = _conv_valid(_lrelu(h), wu, 1) + bias[2 * p + 1].astype(
                jnp.float32
            )
            shift = (k - 1) * d // 2 + (k - 1) // 2
            used += shift
            cur = (
                jax.lax.slice_in_dim(
                    cur, shift, shift + h.shape[0], axis=0
                )
                + h
            )
            cur = _mask(cur, used)
        # Align this resblock's output (margin `used`) to the tile center.
        start = halo - used
        out = jax.lax.slice_in_dim(cur, start, start + tile, axis=0)
        acc = out if acc is None else acc + out

    # SUM of this group's resblocks; the caller applies the 1/num_kernels
    # MRF average across groups.
    out_ref[0] = acc.astype(out_ref.dtype)


# The Mosaic compile helper on this backend crashes on kernel bodies past
# roughly ~100 unrolled matmuls (the full 3-resblock MRF = 126; every <=66
# subset compiles). Groups are packed greedily under this tap budget, so
# the production (3,7,11)x(1,3,5) stage runs as two kernels — (k3+k7) and
# (k11) — i.e. 2 HBM read+write passes instead of ~36.
_GROUP_TAP_BUDGET = 66


def _group_resblocks(kernel_sizes, dilations):
    groups, cur, taps = [], [], 0
    for j, (k, dils) in enumerate(zip(kernel_sizes, dilations)):
        cost = 2 * k * len(dils)
        if cur and taps + cost > _GROUP_TAP_BUDGET:
            groups.append(cur)
            cur, taps = [], 0
        cur.append(j)
        taps += cost
    if cur:
        groups.append(cur)
    return groups


def mrf_stage_pallas(
    x: jnp.ndarray,
    weights: Sequence[jnp.ndarray],
    biases: Sequence[jnp.ndarray],
    kernel_sizes: Sequence[int],
    dilations: Sequence[Sequence[int]],
    *,
    tile: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused MRF stage: mean_j ResBlock_j(x).

    Args:
        x: [B, T, C].
        weights: per resblock j, [2·n_pairs_j, k_j, C, C] stacking
            (convs1_0, convs2_0, convs1_1, convs2_1, ...) kernels in flax
            [K, C_in, C_out] layout.
        biases: per resblock j, [2·n_pairs_j, C], same order.
        kernel_sizes / dilations: the MRF topology (e.g. (3, 7, 11) /
            ((1,3,5),)*3).
        tile: time-tile length (output rows per grid step).
    Returns:
        [B, T, C], same dtype as x.
    """
    kernel_sizes = tuple(int(k) for k in kernel_sizes)
    dilations = tuple(tuple(int(d) for d in ds) for ds in dilations)
    groups = _group_resblocks(kernel_sizes, dilations)
    acc = None
    for g in groups:
        out = _mrf_group_pallas(
            x,
            [weights[j] for j in g],
            [biases[j] for j in g],
            tuple(kernel_sizes[j] for j in g),
            tuple(dilations[j] for j in g),
            tile=tile,
            interpret=interpret,
        )
        acc = out if acc is None else acc + out
    return (acc / len(kernel_sizes)).astype(x.dtype)


def _mrf_group_pallas(
    x: jnp.ndarray,
    weights: Sequence[jnp.ndarray],
    biases: Sequence[jnp.ndarray],
    kernel_sizes: Tuple[int, ...],
    dilations: Tuple[Tuple[int, ...], ...],
    *,
    tile: int,
    interpret: bool,
) -> jnp.ndarray:
    """One Pallas call computing the SUM of a group of resblocks."""
    b, t, c = x.shape
    halo = mrf_halo(kernel_sizes, dilations)
    tile = max(tile, 2 * halo)
    n_tiles = pl.cdiv(t, tile)
    t_pad = n_tiles * tile

    # Main tiles: x right-padded to the tile grid. Halo blocks: for tile i,
    # rows [i·tile − halo, i·tile) and [(i+1)·tile, (i+1)·tile + halo) of x
    # (zeros outside), precomputed as [B, n_tiles, halo, C] gathers so the
    # pipeline streams tile + 2·halo rows per step (not 3 full tiles).
    xp = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
    xh = jnp.pad(x, ((0, 0), (halo, halo + t_pad - t), (0, 0)))
    starts = jnp.arange(n_tiles) * tile
    offs = jnp.arange(halo)
    idx_l = (starts[:, None] + offs[None, :]).reshape(-1)
    idx_r = (starts[:, None] + tile + halo + offs[None, :]).reshape(-1)
    left = jnp.take(xh, idx_l, axis=1).reshape(b, n_tiles, halo, c)
    right = jnp.take(xh, idx_r, axis=1).reshape(b, n_tiles, halo, c)

    kernel = functools.partial(
        _mrf_kernel, kernel_sizes, dilations, halo, tile, t
    )
    # interleave (w, b) operands in call order
    operands = []
    for w, bb in zip(weights, biases):
        operands.append(w)
        operands.append(bb)

    in_specs = [
        pl.BlockSpec((1, tile, c), lambda bb, ii: (bb, ii, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, halo, c), lambda bb, ii: (bb, ii, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, halo, c), lambda bb, ii: (bb, ii, 0, 0),
                     memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in operands]

    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, tile, c), lambda bb, ii: (bb, ii, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, c), x.dtype),
        interpret=interpret,
    )(xp, left, right, *operands)
    return out[:, :t, :]


def stack_resblock_params(
    params, stage: int, num_kernels: int, dtype=None
) -> Tuple[list, list]:
    """Stack a flax HiFiGANGenerator param tree's resblocks for stage
    ``stage`` into the (weights, biases) layout of :func:`mrf_stage_pallas`.

    Param naming contract: ``resblocks_{stage*num_kernels + j}`` with
    children ``convs1_{p}`` / ``convs2_{p}`` (models/hifigan.py).
    """
    weights, biases = [], []
    for j in range(num_kernels):
        rb = params[f"resblocks_{stage * num_kernels + j}"]
        n_pairs = len([k for k in rb if k.startswith("convs1_")])
        ws, bs = [], []
        for p in range(n_pairs):
            for name in (f"convs1_{p}", f"convs2_{p}"):
                ws.append(rb[name]["kernel"])
                bs.append(rb[name]["bias"])
        w = jnp.stack(ws)
        bb = jnp.stack(bs)
        if dtype is not None:
            w, bb = w.astype(dtype), bb.astype(dtype)
        weights.append(w)
        biases.append(bb)
    return weights, biases
