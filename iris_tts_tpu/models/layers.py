"""Conv layer modules built on the MXU matmul-conv primitives.

Drop-in replacements for ``flax.linen.Conv`` / torch conv layers with
identical parameter layouts (kernel ``[K, C_in/groups, C_out]``, bias
``[C_out]``), so checkpoints and converters are unaffected. All compute
routes through :mod:`iris_tts_tpu.ops.conv` — shifted matmuls the MXU tiles
natively — instead of XLA's 1-D conv lowering.
"""

from __future__ import annotations

from typing import Any, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn

from iris_tts_tpu.ops.conv import conv1d_mm, conv2d_mm, conv_transpose1d_mm


def _same_padding(
    t: int, k: int, stride: int, dilation: int
) -> Tuple[int, int]:
    """TF/XLA 'SAME': output ceil(T/s); extra pad goes on the right."""
    out = -(-t // stride)
    eff_k = (k - 1) * dilation + 1
    pad_total = max((out - 1) * stride + eff_k - t, 0)
    pl = pad_total // 2
    return pl, pad_total - pl


class Conv1d(nn.Module):
    """1-D conv, channels-last, 'SAME' (default) or explicit padding.

    Padding semantics match flax ``nn.Conv(padding='SAME')`` for the string
    form and torch explicit padding for the tuple form — the two conventions
    used across the model zoo.
    """

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    padding: Union[str, Tuple[int, int]] = "SAME"
    use_bias: bool = True
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (k, cin // self.groups, self.features)
        )
        if isinstance(self.padding, str):
            if self.padding.upper() != "SAME":
                raise ValueError(f"unsupported padding {self.padding!r}")
            pad = _same_padding(x.shape[1], k, self.stride, self.dilation)
        else:
            pad = tuple(self.padding)
        y = conv1d_mm(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            stride=self.stride,
            dilation=self.dilation,
            padding=pad,
            groups=self.groups,
        )
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,))
            y = y + bias.astype(self.dtype)
        return y


class ConvTranspose1d(nn.Module):
    """Transposed 1-D conv with torch semantics (crop = (K−u)//2 →
    T_out = T·u). Kernel stored in torch K-orientation ``[K, C_in, C_out]``
    (true-convolution taps; the converter does NOT flip)."""

    features: int
    kernel_size: int
    stride: int
    use_bias: bool = True
    kernel_init: Any = nn.initializers.lecun_normal()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel",
            self.kernel_init,
            (self.kernel_size, x.shape[-1], self.features),
        )
        y = conv_transpose1d_mm(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            stride=self.stride,
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,)
            )
            y = y + bias.astype(self.dtype)
        return y


class Conv2dSmall(nn.Module):
    """Small-kernel 2-D conv (MPD discriminator ladders), channels-last,
    explicit per-dim padding."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[Tuple[int, int], Tuple[int, int]] = ((0, 0), (0, 0))
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, x.shape[-1], self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        y = conv2d_mm(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            strides=self.strides,
            padding=self.padding,
        )
        return y + bias.astype(self.dtype)
