"""Torch HiFiGAN checkpoint → flax params converter (weight-norm folding).

The reference runs the pretrained speechbrain ``tts-hifigan-ljspeech``
generator through PyTorch at inference time (/root/reference/src/iris/
hifigan_pretrained.py:146-242). Here the checkpoint is converted **once** into
the flax parameter tree of :class:`iris_tts_tpu.models.hifigan.HiFiGANGenerator`
so the hot path is pure JAX on TPU. The conversion handles the three weight-
transfer hazards called out in SURVEY.md §2.3 / §7:

1. **weight_norm folding** — torch stores ``weight_g``/``weight_v``
   (hifigan_pretrained.py:49-59); folded here as
   ``w = v * g / ||v||`` with the norm over all dims except dim 0.
2. **layout transposition** — torch Conv1d ``[C_out, C_in, K]`` →
   flax ``[K, C_in, C_out]``; ConvTranspose1d ``[C_in, C_out, K]``.
3. **transposed-conv orientation** — torch ConvTranspose is a true
   convolution; the matmul-based module consumes the kernel in that
   orientation directly (no flip), per-phase (ops/conv.py).

Supports plain ``weight_g/weight_v`` naming, new-style torch
``parametrizations.weight.original0/1``, and already-folded ``weight`` keys.
Tensors may be torch tensors or numpy arrays (torch is only needed for
``torch.load`` itself).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Mapping

import numpy as np

from iris_tts_tpu.config import HiFiGANConfig


def _to_numpy(t: Any) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor without importing torch at module scope
    return t.detach().cpu().numpy()


def _fold_weight(sd: Mapping[str, Any], prefix: str) -> np.ndarray:
    """Return the effective conv weight for ``prefix`` with weight-norm
    folded: ``w = g * v / ||v||`` (norm over all dims except dim 0)."""
    if f"{prefix}.weight_v" in sd:
        v = _to_numpy(sd[f"{prefix}.weight_v"]).astype(np.float64)
        g = _to_numpy(sd[f"{prefix}.weight_g"]).astype(np.float64)
    elif f"{prefix}.parametrizations.weight.original1" in sd:
        v = _to_numpy(
            sd[f"{prefix}.parametrizations.weight.original1"]
        ).astype(np.float64)
        g = _to_numpy(
            sd[f"{prefix}.parametrizations.weight.original0"]
        ).astype(np.float64)
    elif f"{prefix}.weight" in sd:
        return _to_numpy(sd[f"{prefix}.weight"]).astype(np.float64)
    else:
        raise KeyError(f"no weight found for '{prefix}'")
    norm = np.sqrt(
        np.sum(v**2, axis=tuple(range(1, v.ndim)), keepdims=True)
    )
    return v * (g / norm)


def _conv_kernel(sd: Mapping[str, Any], prefix: str) -> np.ndarray:
    """torch Conv1d weight [C_out, C_in, K] → flax [K, C_in, C_out]."""
    w = _fold_weight(sd, prefix)
    return np.ascontiguousarray(w.transpose(2, 1, 0)).astype(np.float32)


def _conv_transpose_kernel(sd: Mapping[str, Any], prefix: str) -> np.ndarray:
    """torch ConvTranspose1d weight [C_in, C_out, K] → [K, C_in, C_out].
    No flip: the matmul-based transpose conv consumes true-convolution
    orientation directly (ops/conv.py:conv_transpose1d_mm)."""
    w = _fold_weight(sd, prefix)
    return np.ascontiguousarray(w.transpose(2, 0, 1)).astype(np.float32)


def _bias(sd: Mapping[str, Any], prefix: str) -> np.ndarray:
    return _to_numpy(sd[f"{prefix}.bias"]).astype(np.float32)


def normalize_state_dict_keys(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Canonicalize generator state-dict key layouts to the reference
    naming (``conv_pre.*``, ``ups.{i}.*``, ``resblocks.{n}.convs{1,2}.{j}.*``,
    ``conv_post.*``):

    * ``module.`` prefix (torch DataParallel) — stripped when universal,
    * ``generator.`` prefix (combined GAN checkpoints with flat keys) —
      stripped when universal,
    * a ``.conv.`` wrapper level — speechbrain's ``nnet.CNN`` Conv1d/
      ConvTranspose1d modules hold the torch conv as ``self.conv``, so the
      real ``tts-hifigan-ljspeech`` ``generator.ckpt`` nests every
      parameter one level deeper than the reference's own module
      (hifigan_pretrained.py:165-200 loads it with ``strict=False``, which
      would silently skip such keys — a latent reference defect this
      converter refuses to inherit).
    """
    keys = list(sd.keys())
    for prefix in ("module.", "generator."):
        if keys and all(k.startswith(prefix) for k in keys):
            sd = {k[len(prefix):]: v for k, v in sd.items()}
            keys = list(sd.keys())
    return {k.replace(".conv.", "."): v for k, v in sd.items()}


def convert_hifigan_state_dict(
    state_dict: Mapping[str, Any],
    config: HiFiGANConfig = HiFiGANConfig(),
) -> Dict[str, Any]:
    """Torch generator state dict → flax params for ``HiFiGANGenerator``.

    Key naming follows the reference topology (hifigan_pretrained.py:92-121):
    ``conv_pre``, ``ups.{i}``, ``resblocks.{n}.convs{1,2}.{j}``, ``conv_post``;
    speechbrain/DataParallel/flat-GAN layouts are canonicalized first
    (:func:`normalize_state_dict_keys`).
    """
    state_dict = normalize_state_dict_keys(state_dict)
    params: Dict[str, Any] = {}

    params["conv_pre"] = {
        "kernel": _conv_kernel(state_dict, "conv_pre"),
        "bias": _bias(state_dict, "conv_pre"),
    }

    num_kernels = len(config.resblock_kernel_sizes)
    for i in range(len(config.upsample_rates)):
        params[f"ups_{i}"] = {
            "kernel": _conv_transpose_kernel(state_dict, f"ups.{i}"),
            "bias": _bias(state_dict, f"ups.{i}"),
        }
        for j in range(num_kernels):
            n = i * num_kernels + j
            block: Dict[str, Any] = {}
            n_convs = len(config.resblock_dilations[j])
            for c in range(n_convs):
                block[f"convs1_{c}"] = {
                    "kernel": _conv_kernel(
                        state_dict, f"resblocks.{n}.convs1.{c}"
                    ),
                    "bias": _bias(state_dict, f"resblocks.{n}.convs1.{c}"),
                }
                block[f"convs2_{c}"] = {
                    "kernel": _conv_kernel(
                        state_dict, f"resblocks.{n}.convs2.{c}"
                    ),
                    "bias": _bias(state_dict, f"resblocks.{n}.convs2.{c}"),
                }
            params[f"resblocks_{n}"] = block

    params["conv_post"] = {
        "kernel": _conv_kernel(state_dict, "conv_post"),
        "bias": _bias(state_dict, "conv_post"),
    }
    return params


def load_torch_checkpoint(path: str | Path) -> Mapping[str, Any]:
    """Load a torch checkpoint and unwrap nested state dicts (the formats
    the reference accepts: hifigan_pretrained.py:165-200)."""
    import torch

    ckpt = torch.load(str(path), map_location="cpu", weights_only=False)
    if hasattr(ckpt, "state_dict"):
        return ckpt.state_dict()
    if isinstance(ckpt, dict):
        for key in ("generator", "model", "state_dict"):
            if key in ckpt and isinstance(ckpt[key], dict):
                return ckpt[key]
        return ckpt
    raise ValueError(f"unsupported checkpoint type: {type(ckpt)}")


def load_pretrained_hifigan(
    checkpoint_path: str | Path,
    config: HiFiGANConfig = HiFiGANConfig(),
    dtype=None,
):
    """Checkpoint file → ready-to-run :class:`HiFiGANVocoder`.

    TPU-native replacement for ``get_pretrained_hifigan``
    (hifigan_pretrained.py:250-283).
    """
    import jax.numpy as jnp

    from iris_tts_tpu.models.hifigan import HiFiGANVocoder

    sd = load_torch_checkpoint(checkpoint_path)
    params = convert_hifigan_state_dict(sd, config)
    return HiFiGANVocoder(params, config, dtype or jnp.float32)


# ---------------------------------------------------------------------------
# Singleton convenience API (parity with hifigan_pretrained.py:245-317)
# ---------------------------------------------------------------------------

_vocoder_instance = None
_vocoder_checkpoint_path = None


def default_checkpoint_path() -> Path:
    """Default pretrained-checkpoint location. Overridable via the
    ``IRIS_HIFIGAN_CKPT`` environment variable; otherwise
    ``models/hifigan/generator.ckpt`` relative to the working directory
    (the speechbrain ``tts-hifigan-ljspeech`` generator file, as in
    hifigan_pretrained.py:270-273)."""
    import os

    env = os.environ.get("IRIS_HIFIGAN_CKPT")
    if env:
        return Path(env)
    return Path("models") / "hifigan" / "generator.ckpt"


def get_pretrained_hifigan(
    checkpoint_path: str | Path | None = None, force_reload: bool = False
):
    """Lazy singleton vocoder (reference: hifigan_pretrained.py:250-283)."""
    global _vocoder_instance, _vocoder_checkpoint_path
    path = Path(checkpoint_path or default_checkpoint_path())
    if (
        force_reload
        or _vocoder_instance is None
        or _vocoder_checkpoint_path != path
    ):
        if not path.exists():
            raise FileNotFoundError(
                f"HiFiGAN checkpoint not found: {path}. Set IRIS_HIFIGAN_CKPT "
                "or pass checkpoint_path."
            )
        _vocoder_instance = load_pretrained_hifigan(path)
        _vocoder_checkpoint_path = path
    return _vocoder_instance


def infer_hifigan(
    mel: np.ndarray,
    sample_rate: int | None = None,
    hop_length: int | None = None,
    checkpoint_path: str | Path | None = None,
) -> np.ndarray:
    """Mel [n_mels, T] or [B, n_mels, T] → waveform; plugin-entry parity
    with the reference (hifigan_pretrained.py:286-317)."""
    del sample_rate, hop_length  # accepted for signature parity
    vocoder = get_pretrained_hifigan(checkpoint_path)
    audio = np.asarray(vocoder(mel))
    if audio.ndim == 2 and audio.shape[0] == 1:
        audio = audio[0]
    return audio
