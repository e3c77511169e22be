"""Static-shape length regulation, padding masks, and padding helpers.

The reference's ``length_regulate`` (/root/reference/src/iris/encoder.py:379-
416) computes ``total_repeat_length`` from a traced value and therefore cannot
actually run under its own ``@jax.jit``; all of its scripts route around it
with host-side numpy (scripts/synthesize.py:48-61 "avoid JAX tracing issues"),
bouncing every batch device→host→device (SURVEY.md §3.3).

Here length regulation is a fixed-frame-budget **searchsorted gather**: fully
static shapes, O(T log P), vmappable, differentiable w.r.t. the gathered
values, and it never leaves the device. The pad-to-multiple-of-downsample
helper that the reference copy-pastes ~7× (SURVEY.md §1) is a single function.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def length_regulate(
    encoder_output: jnp.ndarray,
    durations: jnp.ndarray,
    total_frames: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Expand phoneme-level features to frame level with a static frame budget.

    Args:
        encoder_output: [B, P, E] phoneme-level features.
        durations: [B, P] integer frames per phoneme (0 for padding phonemes).
        total_frames: static output length T (frame budget). Frames beyond
            ``sum(durations)`` gather the last valid phoneme and are masked.

    Returns:
        frames: [B, T, E] frame-level features.
        frame_mask: [B, T] float mask, 1.0 where the frame is real.

    Example (reference contract, encoder.py:393-396): durations [[2, 3, 1]]
    maps phoneme features [e1, e2, e3] to [e1, e1, e2, e2, e2, e3, *pad].
    """
    durations = durations.astype(jnp.int32)
    # ends[b, p] = first frame index AFTER phoneme p.
    ends = jnp.cumsum(durations, axis=-1)  # [B, P]
    total = ends[..., -1:]  # [B, 1]
    frame_idx = jnp.arange(total_frames, dtype=jnp.int32)[None, :]  # [1, T]

    # phoneme index owning each frame: number of ends <= frame index.
    seg_ids = jax.vmap(
        lambda e, f: jnp.searchsorted(e, f, side="right")
    )(ends, jnp.broadcast_to(frame_idx, (ends.shape[0], total_frames)))
    seg_ids = jnp.minimum(seg_ids, encoder_output.shape[1] - 1)

    frames = jnp.take_along_axis(
        encoder_output, seg_ids[..., None], axis=1
    )  # [B, T, E]
    frame_mask = (frame_idx < total).astype(encoder_output.dtype)  # [B, T]
    return frames * frame_mask[..., None], frame_mask


def gaussian_upsample(
    encoder_output: jnp.ndarray,
    durations: jnp.ndarray,
    total_frames: int,
    temperature: float = 10.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Differentiable soft length regulation (Gaussian upsampling).

    A soft alternative to the hard gather that admits gradients through the
    *durations* as well as the values — useful for future end-to-end duration
    training. Not in the reference; new functionality.

    Args:
        encoder_output: [B, P, E].
        durations: [B, P] (float frames per phoneme).
        total_frames: static output length T.
        temperature: sharpness of the attention (higher → harder).

    Returns:
        frames [B, T, E], frame_mask [B, T].
    """
    ends = jnp.cumsum(durations.astype(jnp.float32), axis=-1)  # [B, P]
    centers = ends - durations / 2.0  # [B, P]
    total = ends[..., -1:]
    # Frame CENTERS (t + 0.5): comparing integer indices against segment
    # centers would bias every boundary frame half a frame left relative to
    # the hard length_regulate gather.
    t = (
        jnp.arange(total_frames, dtype=jnp.float32)[None, :, None] + 0.5
    )  # [1,T,1]
    # energy [B, T, P]
    energy = -temperature * jnp.square(t - centers[:, None, :])
    # Mask padding phonemes (duration 0) out of the softmax.
    energy = jnp.where(durations[:, None, :] > 0, energy, -1e9)
    attn = jax.nn.softmax(energy, axis=-1)
    frames = jnp.einsum("btp,bpe->bte", attn, encoder_output)
    frame_mask = (t[..., 0] < total).astype(encoder_output.dtype)
    return frames * frame_mask[..., None], frame_mask


def padding_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """Boolean mask [B, max_len], True where position < length.

    Reference: /root/reference/src/iris/encoder.py:419-434 (here ``max_len``
    is a plain Python int so jit specialisation is explicit at the bucket
    layer, not accidental per-batch recompilation — SURVEY.md §2.6).
    """
    positions = jnp.arange(max_len)[None, :]
    return positions < lengths[:, None]


def round_up_to_multiple(n: int, multiple: int) -> int:
    """Host-side shape arithmetic used by bucketing."""
    return ((n + multiple - 1) // multiple) * multiple


def pad_time_to_multiple(x: jnp.ndarray, multiple: int, axis: int = 1):
    """Zero-pad ``x`` along ``axis`` so that dim % multiple == 0.

    Replaces the reference's copy-pasted pad-to-multiple-of-downsample-factor
    blocks (e.g. /root/reference/scripts/train_vae.py:409-431,
    scripts/synthesize.py:116-122). Shape arithmetic is static.
    """
    t = x.shape[axis]
    target = round_up_to_multiple(t, multiple)
    if target == t:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, target - t)
    return jnp.pad(x, pads)


def durations_from_log(pred_log_durations: jnp.ndarray) -> jnp.ndarray:
    """Invert the duration head output into integer frame counts.

    Matches the reference composition exactly: head emits softplus(x) and the
    inverse is ``clip(round(exp(p) - 1), 1, 1e6)``
    (/root/reference/scripts/synthesize.py:41-45; see SURVEY.md §2.5 on why
    the softplus is self-consistent with this inversion).
    """
    frames = jnp.clip(jnp.round(jnp.exp(pred_log_durations) - 1.0), 1.0, 1e6)
    return frames.astype(jnp.int32)
