"""1-D convolutions as shifted matmuls — MXU-native conv primitives.

On TPU the systolic array (MXU) eats large matmuls; XLA's 1-D conv lowering
is both less portable and (on some PJRT backends) dramatically slower than
the equivalent matmul decomposition. Every convolution in this framework
therefore lowers to K shifted ``[B*T, C_in] @ [C_in, C_out]`` matmuls:

    y[t] = Σ_j  x[t + j·d − pad] @ W[j]          (direct / dilated)
    y[u·q + r] = Σ_m x[q − m] @ W[r + u·m]       (transposed, per residue r)

Same FLOPs as the direct convolution, zero im2col memory blowup, and XLA
fuses the shift-slices into the matmul operands. Supports stride, dilation,
groups, and torch ConvTranspose semantics (the HiFiGAN upsampler contract,
reference hifigan_pretrained.py:101-107).

All functions take ``x [B, T, C_in]`` (time-major, channels on the lane
dim) and kernels in flax layout ``[K, C_in/groups, C_out]``.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


# Below this input-channel count, direct convs switch from k shifted
# matmuls to a single im2col matmul (wider MXU contraction dim).
_IM2COL_MAX_CIN = 64

# Implementation selector. XLA's native conv lowering keeps the im2col
# buffer in VMEM and is ~3x faster than the explicit matmul decomposition on
# healthy TPU backends (measured: 4.0 vs 13.3 ms for a [8,65536,128] k=11
# conv on v5e). The matmul path remains for PJRT backends whose conv
# executables are broken (one tunneled backend ran a tiny conv1d for ~10
# minutes) — select with IRIS_CONV_IMPL=matmul|native (default native).
_IMPL = os.environ.get("IRIS_CONV_IMPL", "native")


def set_default_impl(impl: str) -> None:
    """Set the process-wide conv implementation ('native' or 'matmul').

    Call before tracing: jitted graphs bake in whichever path was active
    when they were traced.
    """
    global _IMPL
    if impl not in ("native", "matmul"):
        raise ValueError(f"unknown conv impl {impl!r}")
    _IMPL = impl


def _use_native(impl: Optional[str]) -> bool:
    return (impl or _IMPL) == "native"


# Transpose-conv-only override (IRIS_CONVT_IMPL=native|matmul|pair): the
# three formulations land very differently per stage shape on the tunneled
# backends (isolated at B=8: native 13x SLOWER than pair at the C512→256
# u=8 stage, but fastest at C128→64 u=2 — /tmp probe, 2026-08-18), and
# isolated wins do not compose inside the fused executable, so the knob
# exists to A/B end to end per backend generation. Default: follow
# IRIS_CONV_IMPL.
_CONVT_IMPL = os.environ.get("IRIS_CONVT_IMPL") or None


_CONVT_IMPLS = ("native", "matmul", "pair")


def _convt_impl(impl: Optional[str]) -> str:
    mode = impl or _CONVT_IMPL or _IMPL
    if mode not in _CONVT_IMPLS:
        # A typo'd IRIS_CONVT_IMPL silently falling through to a different
        # formulation would invalidate the e2e A/B this knob exists for.
        raise ValueError(
            f"unknown conv-transpose impl {mode!r} "
            f"(IRIS_CONVT_IMPL/impl must be one of {_CONVT_IMPLS})"
        )
    return mode


def _precision(x) -> Optional[jax.lax.Precision]:
    """Matmul/conv precision for operands of ``x``'s dtype.

    f32 operands request HIGHEST: the TPU MXU natively multiplies in bf16,
    and backend *default* precision may round f32 inputs to one bf16 pass
    (~4e-3 relative error — observed to vary across PJRT backend
    generations, which silently broke the ≤1e-3 vocoder parity contract).
    ``dtype=float32`` must mean f32 math on every backend; the fast path
    is selected by running the module in bf16 (the serving default), not
    by letting the backend degrade f32. bf16 operands keep the default
    (native single-pass MXU with f32 accumulate via preferred_element_type).
    """
    return jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None


def _matmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    # Accumulate in f32 even for bf16 operands: the MXU supports bf16-in/
    # f32-accumulate natively, and the K-tap sum would otherwise lose
    # precision. The final cast back to the input dtype happens once in the
    # callers.
    return jnp.matmul(
        a, b, preferred_element_type=jnp.float32, precision=_precision(a)
    )


def _conv_pet(x):
    """preferred_element_type for a conv on ``x``.

    f32 inputs keep the explicit f32 accumulate. For bf16 inputs return
    None (output in the input dtype): the TPU MXU accumulates in f32
    internally either way, so the result rounds identically — but jax's
    conv TRANSPOSE rule cannot differentiate a conv whose output dtype
    differs from its inputs (the f32 cotangent meets a bf16 kernel), which
    is exactly what bf16 mixed-precision training hits.
    """
    import jax.numpy as _jnp

    return _jnp.float32 if x.dtype == _jnp.float32 else None


def conv1d_mm(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    *,
    stride: int = 1,
    dilation: int = 1,
    padding: Optional[Tuple[int, int]] = None,
    groups: int = 1,
    impl: Optional[str] = None,
) -> jnp.ndarray:
    """Cross-correlation (torch/flax Conv semantics), MXU-native.

    Args:
        x: [B, T, C_in].
        kernel: [K, C_in // groups, C_out].
        padding: (left, right); default = torch same-padding
            ``((K·d − d) // 2,) * 2``.
        impl: 'native' (XLA conv) or 'matmul' (shifted matmuls); default =
            the module default (see :func:`set_default_impl`).
    Returns:
        [B, T_out, C_out] with T_out = (T + pl + pr − (K−1)·d − 1)//stride + 1.
    """
    k, cin_g, cout = kernel.shape
    if padding is None:
        p = (k * dilation - dilation) // 2
        padding = (p, p)
    pl, pr = padding

    if _use_native(impl):
        # kernel [K, C_in/g, C_out] IS "WIO"; x [B, T, C] IS "NWC".
        return jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(stride,),
            padding=((pl, pr),),
            rhs_dilation=(dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=groups,
            preferred_element_type=_conv_pet(x),
            precision=_precision(x),
        ).astype(x.dtype)
    xp = jnp.pad(x, ((0, 0), (pl, pr), (0, 0)))
    t_pad = xp.shape[1]
    t_out = (t_pad - (k - 1) * dilation - 1) // stride + 1

    if groups > 1:
        b = x.shape[0]
        xp = xp.reshape(b, t_pad, groups, cin_g)
        kg = kernel.reshape(k, cin_g, groups, cout // groups)
        y = None
        for j in range(k):
            start = j * dilation
            xs = jax.lax.slice_in_dim(
                xp, start, start + (t_out - 1) * stride + 1, stride, axis=1
            )
            contrib = jnp.einsum(
                "btgc,cgd->btgd", xs, kg[j],
                preferred_element_type=jnp.float32,
                precision=_precision(x),
            )
            y = contrib if y is None else y + contrib
        return y.reshape(x.shape[0], t_out, cout).astype(x.dtype)

    if k > 1 and cin_g <= _IM2COL_MAX_CIN:
        # Narrow-channel path: k taps concatenated into ONE [*, k·C_in]
        # matmul. For C_in ≪ 128 the shifted-sum underuses the 128-wide MXU
        # contraction dim; im2col widens it to k·C_in at k× input reads —
        # a good trade exactly when channels are small.
        cols = [
            jax.lax.slice_in_dim(
                xp,
                j * dilation,
                j * dilation + (t_out - 1) * stride + 1,
                stride,
                axis=1,
            )
            for j in range(k)
        ]
        stacked = jnp.concatenate(cols, axis=-1)  # [B, T_out, k*C_in]
        return _matmul(stacked, kernel.reshape(k * cin_g, cout)).astype(
            x.dtype
        )

    y = None
    for j in range(k):
        start = j * dilation
        xs = jax.lax.slice_in_dim(
            xp, start, start + (t_out - 1) * stride + 1, stride, axis=1
        )
        contrib = _matmul(xs, kernel[j])
        y = contrib if y is None else y + contrib
    return y.astype(x.dtype)


def conv_transpose1d_mm(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    *,
    stride: int,
    crop: Optional[int] = None,
    impl: Optional[str] = None,
) -> jnp.ndarray:
    """Torch ConvTranspose1d via per-residue shifted matmuls.

    Args:
        x: [B, T, C_in].
        kernel: [K, C_in, C_out] in **torch orientation along K** (i.e. the
            true-convolution kernel; NOT pre-flipped).
        stride: upsampling factor u.
        crop: output crop per side; default torch ``(K − u) // 2`` so that
            T_out == T·u when K − u is even (the HiFiGAN contract).
    Returns:
        [B, T·u, C_out] (for the default crop and even K−u).

    Derivation: the uncropped output is y[t] = Σ_i x[i]·W[t − i·u] (length
    (T−1)·u + K, x zero outside [0, T)). With the crop folded in, output
    index t' = u·j + c maps to t = t' + crop, so per output phase c:

        y_out[u·j + c] = Σ_m  x[j + base_c − m] @ W[r_c + u·m]

    with r_c = (c + crop) mod u and base_c = (c + crop) // u — K matmuls
    total across phases, then an interleave.
    """
    k, cin, cout = kernel.shape
    u = stride
    if crop is None:
        crop = (k - u) // 2
    b, t, _ = x.shape

    mode = _convt_impl(impl)
    if mode == "native":
        # True convolution == cross-correlation with the K axis flipped;
        # upsampling == lhs dilation. Padding (k-1-crop) per side yields
        # out length (T-1)·u + k - 2·crop (== T·u for the torch default).
        return jax.lax.conv_general_dilated(
            x,
            jnp.flip(kernel, 0),
            window_strides=(1,),
            padding=((k - 1 - crop, k - 1 - crop),),
            lhs_dilation=(u,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=_conv_pet(x),
            precision=_precision(x),
        ).astype(x.dtype)
    if mode == "pair":
        return _conv_transpose1d_pair(x, kernel, u, crop)

    m_max = (k - 1) // u + 1  # max taps in any phase
    base_max = (u - 1 + crop) // u
    # Left pad (m_max-1) so x[j − m] resolves; right pad base_max for the
    # forward offset.
    xp = jnp.pad(x, ((0, 0), (m_max - 1, base_max), (0, 0)))

    outs = []
    for c in range(u):
        r_c = (c + crop) % u
        base_c = (c + crop) // u
        y_c = None
        m = 0
        while r_c + u * m < k:
            start = base_c - m + (m_max - 1)
            xs = jax.lax.slice_in_dim(xp, start, start + t, axis=1)
            contrib = _matmul(xs, kernel[r_c + u * m])
            y_c = contrib if y_c is None else y_c + contrib
            m += 1
        if y_c is None:
            y_c = jnp.zeros((b, t, cout), jnp.float32)
        outs.append(y_c)

    # Interleave phases: [B, T, u, C] → [B, T·u, C].
    return (
        jnp.stack(outs, axis=2).reshape(b, t * u, cout).astype(x.dtype)
    )


def _conv_transpose1d_pair(
    x: jnp.ndarray, kernel: jnp.ndarray, u: int, crop: int
) -> jnp.ndarray:
    """Tap-major wide-matmul formulation of the transposed conv.

    The per-phase decomposition above runs K small [C_in, C_out] matmuls.
    Phases sharing the same (tap m, input offset) can instead share ONE
    [C_in, n_phases·C_out] matmul — for the HiFiGAN contract (K = 2u,
    crop = u/2) that is 4 matmuls of [C_in, u/2·C_out] regardless of K
    (K=16 → 4), a much wider MXU contraction per dispatch. Same math;
    measured 13x faster than the native lowering at the C512→256 u=8
    stage in isolation (B=8, bf16, v5e) — but LOSES inside the full
    fused synthesis executable (2097x vs native's 2570x RT at B=128;
    2026-08-18 backend), where XLA fuses the native convT with its
    neighbors. Isolated wins do not compose on this compiler; re-A/B
    end to end (IRIS_CONVT_IMPL=pair python bench.py) before changing
    the default."""
    k, cin, cout = kernel.shape
    b, t, _ = x.shape
    m_max = (k - 1) // u + 1
    base_max = (u - 1 + crop) // u
    xp = jnp.pad(x, ((0, 0), (m_max - 1, base_max), (0, 0)))

    groups: dict = {}  # (m, base) -> list of (phase, kernel_row)
    for c in range(u):
        r_c = (c + crop) % u
        base_c = (c + crop) // u
        m = 0
        while r_c + u * m < k:
            groups.setdefault((m, base_c - m), []).append((c, r_c + u * m))
            m += 1
    phase_acc: list = [None] * u
    for (m, base), members in groups.items():
        wm = jnp.concatenate([kernel[row] for _, row in members], axis=1)
        start = base + (m_max - 1)
        xs = jax.lax.slice_in_dim(xp, start, start + t, axis=1)
        # f32 accumulation ALWAYS (not _conv_pet): the cross-group and
        # cross-tap partial sums round once per add in bf16 otherwise,
        # while the matmul/native impls keep the K-tap sum in f32 — an
        # A/B knob must change scheduling, never numerics.
        yy = jnp.einsum(
            "btc,cd->btd", xs, wm,
            preferred_element_type=jnp.float32,
            precision=_precision(x),
        )
        for i, (c, _) in enumerate(members):
            part = yy[..., i * cout:(i + 1) * cout]
            phase_acc[c] = (
                part if phase_acc[c] is None else phase_acc[c] + part
            )
    zero = jnp.zeros((b, t, cout), jnp.float32)
    y = jnp.stack(
        [p if p is not None else zero for p in phase_acc], axis=2
    ).reshape(b, t * u, cout)
    return y.astype(x.dtype)


def conv2d_mm(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    *,
    strides: Tuple[int, int] = (1, 1),
    padding: Tuple[Tuple[int, int], Tuple[int, int]] = ((0, 0), (0, 0)),
    impl: Optional[str] = None,
) -> jnp.ndarray:
    """Small-kernel 2-D conv (for the MPD discriminator's (5,1)/(3,1)
    kernels). x [B, H, W, C_in], kernel [KH, KW, C_in, C_out]."""
    kh, kw, cin, cout = kernel.shape
    (pt, pb), (pl, pr) = padding

    if _use_native(impl):
        return jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=strides,
            padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=_conv_pet(x),
            precision=_precision(x),
        ).astype(x.dtype)
    xp = jnp.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
    sh, sw = strides
    h_out = (xp.shape[1] - kh) // sh + 1
    w_out = (xp.shape[2] - kw) // sw + 1
    y = None
    for i in range(kh):
        for j in range(kw):
            xs = xp[
                :,
                i : i + (h_out - 1) * sh + 1 : sh,
                j : j + (w_out - 1) * sw + 1 : sw,
                :,
            ]
            contrib = _matmul(xs, kernel[i, j])
            y = contrib if y is None else y + contrib
    return y.astype(x.dtype)
