"""HiFi-GAN discriminators: multi-period (MPD) + multi-scale (MSD).

**New functionality** — the reference ships no GAN training at all
(demo_vocoder.py:110-111 acknowledges the Keras vocoder is untrained;
SURVEY.md §7 step 7 / BASELINE.json config 5 require the fine-tune story).
Architectures follow the published HiFi-GAN paper (arXiv:2010.05646 §2.3):

* MPD: one sub-discriminator per period p ∈ {2,3,5,7,11}; audio reshaped to
  [T/p, p] and processed by a ladder of 2-D convs with (5,1) kernels and
  (3,1) strides.
* MSD: three sub-discriminators on ×1 / ×2 / ×4 average-pooled audio, each a
  ladder of large-kernel grouped 1-D convs.

Both return (logits, feature_maps) for the LSGAN + feature-matching losses
in :mod:`iris_tts_tpu.ops.losses`. Layout: audio [B, T] in; convs run
channels-last for TPU.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from iris_tts_tpu.models.layers import Conv1d, Conv2dSmall

_LRELU = 0.1


def _lrelu(x):
    return jax.nn.leaky_relu(x, negative_slope=_LRELU)


class PeriodDiscriminator(nn.Module):
    """One MPD sub-discriminator for a fixed period.

    ``width`` scales every channel count (1.0 = the paper's sizes; smaller
    for CPU tests)."""

    period: int
    width: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, audio: jnp.ndarray):
        """audio [B, T] → (logits [B, L], features list)."""
        p = self.period
        b, t = audio.shape
        pad = (-t) % p
        x = jnp.pad(audio, ((0, 0), (0, pad)), mode="edge")
        x = x.reshape(b, (t + pad) // p, p, 1)  # [B, T/p, p, 1]

        chans = [max(4, int(c * self.width)) for c in (32, 128, 512, 1024)]
        feats: List[jnp.ndarray] = []
        for i, ch in enumerate(chans):
            x = Conv2dSmall(
                ch, (5, 1), strides=(3, 1), padding=((2, 2), (0, 0)),
                dtype=self.dtype, name=f"conv_{i}",
            )(x)
            x = _lrelu(x)
            feats.append(x)
        x = Conv2dSmall(
            chans[-1], (5, 1), padding=((2, 2), (0, 0)), dtype=self.dtype,
            name="conv_4",
        )(x)
        x = _lrelu(x)
        feats.append(x)
        x = Conv2dSmall(
            1, (3, 1), padding=((1, 1), (0, 0)), dtype=self.dtype,
            name="conv_post",
        )(x)
        feats.append(x)
        return x.reshape(b, -1), feats


class ScaleDiscriminator(nn.Module):
    """One MSD sub-discriminator (operates on a given audio scale).

    ``width`` scales every channel count (1.0 = the paper's sizes)."""

    width: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, audio: jnp.ndarray):
        """audio [B, T] → (logits [B, L], features list)."""
        x = audio[..., None]  # [B, T, 1]
        w = self.width

        def c(n):  # scaled channels, kept divisible by the largest group
            return max(16, int(n * w) // 16 * 16)

        specs = [
            # (features, kernel, stride, groups)
            (c(128), 15, 1, 1),
            (c(128), 41, 2, 4),
            (c(256), 41, 2, 16),
            (c(512), 41, 4, 16),
            (c(1024), 41, 4, 16),
            (c(1024), 41, 1, 16),
            (c(1024), 5, 1, 1),
        ]
        feats: List[jnp.ndarray] = []
        for i, (ch, k, s, g) in enumerate(specs):
            x = Conv1d(
                ch, k, stride=s, groups=g, dtype=self.dtype,
                name=f"conv_{i}",
            )(x)
            x = _lrelu(x)
            feats.append(x)
        x = Conv1d(1, 3, dtype=self.dtype, name="conv_post")(x)
        feats.append(x)
        return x[..., 0], feats


def _avg_pool2(x: jnp.ndarray) -> jnp.ndarray:
    """Stride-2 average pooling with k=4 (HiFi-GAN's AvgPool1d(4,2,2))."""
    return nn.avg_pool(
        x[..., None], window_shape=(4,), strides=(2,), padding=((2, 2),)
    )[..., 0]


class MultiPeriodDiscriminator(nn.Module):
    periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    width: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, audio: jnp.ndarray):
        logits, feats = [], []
        for p in self.periods:
            l, f = PeriodDiscriminator(
                period=p, width=self.width, dtype=self.dtype,
                name=f"period_{p}",
            )(audio)
            logits.append(l)
            feats.append(f)
        return logits, feats


class MultiScaleDiscriminator(nn.Module):
    num_scales: int = 3
    width: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, audio: jnp.ndarray):
        logits, feats = [], []
        x = audio
        for i in range(self.num_scales):
            if i > 0:
                x = _avg_pool2(x)
            l, f = ScaleDiscriminator(
                width=self.width, dtype=self.dtype, name=f"scale_{i}"
            )(x)
            logits.append(l)
            feats.append(f)
        return logits, feats


class HiFiGANDiscriminators(nn.Module):
    """MPD + MSD under one set of params (single optimizer, as in the
    paper's combined discriminator loss)."""

    periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    num_scales: int = 3
    width: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, audio: jnp.ndarray):
        mpd_logits, mpd_feats = MultiPeriodDiscriminator(
            periods=self.periods, width=self.width, dtype=self.dtype,
            name="mpd",
        )(audio)
        msd_logits, msd_feats = MultiScaleDiscriminator(
            num_scales=self.num_scales, width=self.width, dtype=self.dtype,
            name="msd",
        )(audio)
        return mpd_logits + msd_logits, mpd_feats + msd_feats
