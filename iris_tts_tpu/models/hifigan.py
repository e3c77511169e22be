"""HiFiGAN generator as stateless flax modules, TPU-first.

Re-implements the topology of the reference's production vocoder — the torch
``HiFiGANModel`` (/root/reference/src/iris/hifigan_pretrained.py:74-143) and
its Keras twin (/root/reference/src/iris/vocoder.py:52-142) — with **torch
padding semantics** so pretrained speechbrain checkpoints convert exactly:

* Conv1d with explicit same-padding ``(k*d - d) // 2`` (hifigan_pretrained.py
  :61-62),
* ConvTranspose1d with ``padding=(k - u) // 2`` output cropping
  (hifigan_pretrained.py:101-107) — NOT Keras ``'same'`` (the weight-transfer
  hazard called out in SURVEY.md §2.3).

Layout is time-major ``[B, T, C]`` (channels on the TPU lane dimension);
weight-norm is folded into plain kernels at conversion time
(:mod:`iris_tts_tpu.convert.hifigan_torch`). The whole generator is one pure
function of (params, mel) — jittable, shardable, differentiable (for the GAN
fine-tune stage).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from iris_tts_tpu.config import HiFiGANConfig
from iris_tts_tpu.ops.conv import conv1d_mm, conv_transpose1d_mm

_LRELU_SLOPE = 0.1


def leaky_relu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.leaky_relu(x, negative_slope=_LRELU_SLOPE)


class TorchConv1d(nn.Module):
    """1-D convolution with torch's explicit same-padding convention.

    Kernel layout is ``[K, C_in, C_out]`` (a transpose of torch's
    ``[C_out, C_in, K]``); torch Conv1d is cross-correlation, so no kernel
    flip is needed on conversion.
    """

    features: int
    kernel_size: int
    dilation: int = 1
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k, d = self.kernel_size, self.dilation
        pad = (k * d - d) // 2  # hifigan_pretrained.py:61-62
        kernel = self.param(
            "kernel",
            nn.initializers.normal(0.01),
            (k, x.shape[-1], self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        y = conv1d_mm(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            stride=self.stride,
            dilation=d,
            padding=(pad, pad),
        )
        return y + bias.astype(self.dtype)


class TorchConvTranspose1d(nn.Module):
    """Transposed 1-D convolution matching torch ConvTranspose1d with
    ``padding=(k - u) // 2``: output length is exactly ``T * u`` when
    ``k - u`` is even (the HiFiGAN upsampler contract).

    Implemented as per-phase shifted matmuls (:func:`conv_transpose1d_mm`).
    The stored kernel is the torch kernel transposed to ``[K, C_in, C_out]``
    in true-convolution orientation (NOT flipped); the converter only
    transposes.
    """

    features: int
    kernel_size: int
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k, u = self.kernel_size, self.stride
        kernel = self.param(
            "kernel",
            nn.initializers.normal(0.01),
            (k, x.shape[-1], self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        y = conv_transpose1d_mm(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            stride=u,  # crop defaults to (k-u)//2: hifigan_pretrained.py:105
        )
        return y + bias.astype(self.dtype)


class ResBlock(nn.Module):
    """HiFiGAN residual block: pairs of (dilated, plain) convs with
    leaky-relu pre-activations (hifigan_pretrained.py:38-71)."""

    channels: int
    kernel_size: int
    dilations: Tuple[int, ...]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, d in enumerate(self.dilations):
            h = leaky_relu(x)
            h = TorchConv1d(
                self.channels,
                self.kernel_size,
                dilation=d,
                dtype=self.dtype,
                name=f"convs1_{i}",
            )(h)
            h = leaky_relu(h)
            h = TorchConv1d(
                self.channels,
                self.kernel_size,
                dilation=1,
                dtype=self.dtype,
                name=f"convs2_{i}",
            )(h)
            x = x + h
        return x


class HiFiGANGenerator(nn.Module):
    """Full generator: conv_pre → N×(upsample → MRF resblock average) →
    conv_post → tanh (hifigan_pretrained.py:123-143).

    Input mel ``[B, T, n_mels]`` (time-major) → waveform ``[B, T * 256]``.
    """

    config: HiFiGANConfig = HiFiGANConfig()
    dtype: Any = jnp.float32
    # Rematerialize each MRF resblock in the backward pass
    # (jax.checkpoint): resblock activations live at the UPSAMPLED time
    # rate (up to 256x the mel rate at the last stage), so they dominate
    # GAN-training memory; remat recomputes them from each block's input
    # for one extra forward per block. Inference is unaffected.
    remat: bool = False

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        num_kernels = len(cfg.resblock_kernel_sizes)
        block_cls = nn.remat(ResBlock) if self.remat else ResBlock

        x = TorchConv1d(
            cfg.upsample_initial_channel, 7, dtype=self.dtype, name="conv_pre"
        )(mel)

        for i, (u, k) in enumerate(
            zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)
        ):
            ch = cfg.upsample_initial_channel // (2 ** (i + 1))
            x = leaky_relu(x)
            x = TorchConvTranspose1d(
                ch, k, u, dtype=self.dtype, name=f"ups_{i}"
            )(x)
            # Multi-receptive-field fusion: average of the resblock outputs.
            acc = None
            for j, (rk, rd) in enumerate(
                zip(cfg.resblock_kernel_sizes, cfg.resblock_dilations)
            ):
                out = block_cls(
                    ch,
                    rk,
                    rd,
                    dtype=self.dtype,
                    name=f"resblocks_{i * num_kernels + j}",
                )(x)
                acc = out if acc is None else acc + out
            x = acc / num_kernels

        x = leaky_relu(x)
        x = TorchConv1d(1, 7, dtype=self.dtype, name="conv_post")(x)
        x = jnp.tanh(x)
        return x[..., 0]  # [B, T_samples]


def receptive_radius_frames(config: HiFiGANConfig = HiFiGANConfig()) -> int:
    """Upper bound on the generator's receptive-field *radius*, in mel
    frames: an output sample at time t depends only on mel frames within
    ``radius`` of t / total_upsample.

    This is what makes exact chunked (streaming) vocoding possible: a chunk
    computed with ``radius`` frames of real context on each side is
    bit-identical to the same region of a full-utterance pass — the network
    is fully convolutional, so equality holds wherever every contributing
    input frame (and layer-padding position) matches
    (``TTSPipeline.vocode_streaming``).

    Walks the ladder accumulating each layer's radius in output-sample
    units: a dilated conv adds ``(k-1)//2 * d`` current-rate steps; a
    transposed conv adds at most ``ceil(k/u)`` *input*-rate steps; MRF
    branches run in parallel so their radius is the max over resblocks of
    the summed sequential pairs. Default topology → 15 frames.
    """
    total_up = config.total_upsample
    spu = total_up  # output samples per step at the current rate
    r = 3 * spu  # conv_pre k=7
    mrf = max(
        sum((k - 1) // 2 * d + (k - 1) // 2 for d in dils)
        for k, dils in zip(
            config.resblock_kernel_sizes, config.resblock_dilations
        )
    )
    for u, k in zip(config.upsample_rates, config.upsample_kernel_sizes):
        r += -(-k // u) * spu  # transposed conv, in input-rate steps
        spu //= u
        r += mrf * spu
    r += 3  # conv_post k=7 (spu == 1)
    return -(-r // total_up)


def iter_stream_windows(t: int, chunk_frames: int, context_frames: int):
    """The exact-streaming window plan shared by TTSPipeline.vocode_streaming
    and AotPipeline.vocode_streaming — ONE home for the clamping arithmetic
    that the bit-exactness contract depends on.

    Yields ``(a, b, w0, start_f, start_cl_f)`` per chunk: mel rows [a, b)
    are produced from window ``[w0, w0 + chunk + 2*context)``; the keep
    region starts ``start_f`` frames into the window, and ``start_cl_f`` is
    that start clamped so a fixed-size slice fits (the caller trims the
    difference, in samples, on the host). Windows touching the true mel
    boundaries align to them so layer zero-padding matches a full pass.
    Requires ``t > chunk_frames + 2*context_frames`` (shorter mels fit one
    whole-mel dispatch).
    """
    window = chunk_frames + 2 * context_frames
    for a in range(0, t, chunk_frames):
        b = min(a + chunk_frames, t)
        w0 = min(max(a - context_frames, 0), t - window)
        start_f = a - w0
        start_cl_f = min(start_f, window - chunk_frames)
        yield a, b, w0, start_f, start_cl_f


# ---------------------------------------------------------------------------
# Convenience wrappers (API parity with the reference)
# ---------------------------------------------------------------------------


class HiFiGANVocoder:
    """Stateful convenience wrapper bundling params + jitted apply.

    API parity with the reference's ``HiFiGANVocoder.infer`` shape adapter
    (/root/reference/src/iris/vocoder.py:145-213) and the torch wrapper's
    ``__call__`` contract (hifigan_pretrained.py:208-242): accepts mel as
    ``[n_mels, T]`` or ``[B, n_mels, T]`` (reference layout) and returns
    ``[samples]`` / ``[B, samples]``.
    """

    def __init__(
        self,
        params,
        config: HiFiGANConfig = HiFiGANConfig(),
        dtype: Any = jnp.float32,
    ):
        self.config = config
        self.params = params
        self.module = HiFiGANGenerator(config=config, dtype=dtype)
        self._apply = jax.jit(
            lambda p, m: self.module.apply({"params": p}, m)
        )

    def __call__(self, mel) -> jnp.ndarray:
        mel = jnp.asarray(mel)
        squeeze = mel.ndim == 2
        if squeeze:
            mel = mel[None]
        audio = self._apply(self.params, jnp.swapaxes(mel, -1, -2))
        return audio[0] if squeeze else audio

    infer = __call__


def create_vocoder(
    config: HiFiGANConfig = HiFiGANConfig(),
    seed: int = 0,
    dtype: Any = jnp.float32,
) -> HiFiGANVocoder:
    """Build a randomly-initialised vocoder (reference:
    src/iris/vocoder.py:216-227). Load pretrained weights with
    :func:`iris_tts_tpu.convert.hifigan_torch.load_pretrained_hifigan`."""
    module = HiFiGANGenerator(config=config, dtype=dtype)
    dummy = jnp.zeros((1, 8, config.in_channels), dtype=jnp.float32)
    params = module.init(jax.random.PRNGKey(seed), dummy)["params"]
    return HiFiGANVocoder(params, config, dtype)
