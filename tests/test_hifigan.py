"""HiFiGAN parity tests: flax modules + weight converter vs torch ground
truth (SURVEY.md §7 hard-part 1).

The torch models built here are *test fixtures* implementing the standard
published HiFi-GAN generator ops (weight-normed Conv1d / ConvTranspose1d with
torch padding), used only to produce golden outputs for conversion checks.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from iris_tts_tpu.config import HiFiGANConfig
from iris_tts_tpu.convert.hifigan_torch import (
    convert_hifigan_state_dict,
    _conv_kernel,
    _conv_transpose_kernel,
)
from iris_tts_tpu.models.hifigan import (
    HiFiGANGenerator,
    TorchConv1d,
    TorchConvTranspose1d,
    create_vocoder,
)


def _wn(mod):
    return tnn.utils.weight_norm(mod)


# ---------------------------------------------------------------------------
# Per-op parity
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("k,d", [(3, 1), (7, 3), (11, 5), (5, 2)])
def test_conv1d_parity(rng, k, d):
    torch.manual_seed(0)
    c_in, c_out, t = 6, 9, 32
    tconv = _wn(tnn.Conv1d(c_in, c_out, k, dilation=d, padding=(k * d - d) // 2))
    x = rng.standard_normal((2, t, c_in)).astype(np.float32)

    with torch.no_grad():
        want = (
            tconv(torch.from_numpy(x.transpose(0, 2, 1)))
            .numpy()
            .transpose(0, 2, 1)
        )

    sd = tconv.state_dict()
    sd = {f"layer.{k_}": v for k_, v in sd.items()}
    params = {
        "kernel": _conv_kernel(sd, "layer"),
        "bias": sd["layer.bias"].numpy(),
    }
    mod = TorchConv1d(c_out, k, dilation=d)
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("k,u", [(16, 8), (4, 2), (8, 4), (6, 2)])
def test_conv_transpose1d_parity(rng, k, u):
    torch.manual_seed(1)
    c_in, c_out, t = 8, 4, 16
    tconv = _wn(tnn.ConvTranspose1d(c_in, c_out, k, u, padding=(k - u) // 2))
    x = rng.standard_normal((2, t, c_in)).astype(np.float32)

    with torch.no_grad():
        want = (
            tconv(torch.from_numpy(x.transpose(0, 2, 1)))
            .numpy()
            .transpose(0, 2, 1)
        )
    assert want.shape[1] == t * u  # torch contract: exact Tu output

    sd = {f"layer.{k_}": v for k_, v in tconv.state_dict().items()}
    params = {
        "kernel": _conv_transpose_kernel(sd, "layer"),
        "bias": sd["layer.bias"].numpy(),
    }
    mod = TorchConvTranspose1d(c_out, k, u)
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5)


# ---------------------------------------------------------------------------
# Full-generator parity (small config for CPU speed)
# ---------------------------------------------------------------------------


from iris_tts_tpu.convert.torch_oracle import (  # noqa: E402
    TorchGenerator as _TorchGenerator,
)


_SMALL = HiFiGANConfig(
    in_channels=10,
    upsample_rates=(4, 2),
    upsample_kernel_sizes=(8, 4),
    upsample_initial_channel=32,
    resblock_kernel_sizes=(3, 5),
    resblock_dilations=((1, 3), (1, 3)),
)


def test_full_generator_parity(rng):
    torch.manual_seed(42)
    tgen = _TorchGenerator(_SMALL).eval()
    mel = rng.standard_normal((2, 17, _SMALL.in_channels)).astype(np.float32)

    with torch.no_grad():
        want = tgen(torch.from_numpy(mel.transpose(0, 2, 1))).numpy()[:, 0, :]

    params = convert_hifigan_state_dict(tgen.state_dict(), _SMALL)
    gen = HiFiGANGenerator(config=_SMALL)
    got = np.asarray(gen.apply({"params": params}, jnp.asarray(mel)))

    assert got.shape == want.shape == (2, 17 * 8)
    np.testing.assert_allclose(got, want, atol=1e-3)
    # Typical agreement should be far tighter than the 1e-3 contract.
    assert np.abs(got - want).max() < 2e-4


def test_full_generator_parity_production(rng):
    """BASELINE 1e-3 contract at PRODUCTION scale: the full 512-channel,
    (8,8,2,2)-upsample, (3,7,11)-MRF generator (the topology of the
    speechbrain checkpoint named at reference hifigan_pretrained.py:270-273)
    converted from a seeded torch fixture, over >1 s of audio. Catches
    production-shape-only layout bugs the reduced config cannot.
    (~45 s on CPU: torch forward + one large XLA compile, then cached.)
    """
    cfg = HiFiGANConfig()  # production defaults: 80-mel, 512-ch, x256
    torch.manual_seed(1234)
    tgen = _TorchGenerator(cfg).eval()
    T = 87  # 87 frames * 256 hop = 22272 samples > 1 s at 22050 Hz
    mel = rng.standard_normal((1, T, cfg.in_channels)).astype(np.float32)

    with torch.no_grad():
        want = tgen(torch.from_numpy(mel.transpose(0, 2, 1))).numpy()[:, 0, :]

    params = convert_hifigan_state_dict(tgen.state_dict(), cfg)
    gen = HiFiGANGenerator(config=cfg)
    got = np.asarray(
        jax.jit(lambda p, m: gen.apply({"params": p}, m))(
            params, jnp.asarray(mel)
        )
    )

    assert got.shape == want.shape == (1, T * 256)
    assert got.shape[1] >= 22050  # >= 1 s of audio
    max_abs = np.abs(got - want).max()
    print(f"production parity max|Δ| = {max_abs:.2e}")
    assert max_abs < 1e-3


def test_converted_params_match_init_structure():
    """Converted tree must be loadable into the module (same treedef)."""
    torch.manual_seed(0)
    tgen = _TorchGenerator(_SMALL)
    params = convert_hifigan_state_dict(tgen.state_dict(), _SMALL)
    gen = HiFiGANGenerator(config=_SMALL)
    init = gen.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 4, _SMALL.in_channels))
    )["params"]
    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(init)[0]
    paths_a = [p for p, _ in flat_a]
    paths_b = [p for p, _ in flat_b]
    assert paths_a == paths_b
    for (pa, va), (_, vb) in zip(flat_a, flat_b):
        assert va.shape == vb.shape, pa


def test_vocoder_wrapper_shapes():
    voc = create_vocoder(_SMALL)
    mel = np.zeros((_SMALL.in_channels, 11), np.float32)  # reference layout
    audio = np.asarray(voc(mel))
    assert audio.shape == (11 * 8,)
    batch = np.zeros((3, _SMALL.in_channels, 11), np.float32)
    audio_b = np.asarray(voc(batch))
    assert audio_b.shape == (3, 11 * 8)
    assert np.all(np.abs(audio_b) <= 1.0)  # tanh output range


def test_upsample_factor_is_hop_length():
    # System contract: total upsampling == hop_length (SURVEY.md §2.5).
    assert HiFiGANConfig().total_upsample == 256


# ---------------------------------------------------------------------------
# State-dict layout insurance (VERDICT r2 item 9)
# ---------------------------------------------------------------------------


def _speechbrainify(sd):
    """Re-key a generator state dict the way speechbrain's
    ``tts-hifigan-ljspeech`` ``generator.ckpt`` nests it: speechbrain's
    ``nnet.CNN`` wrappers hold the torch conv as ``self.conv``, so every
    parameter gains a ``.conv`` level (``conv_pre.conv.weight_g``,
    ``ups.0.conv.weight_v``, ``resblocks.2.convs1.0.conv.bias``, ...)."""
    out = {}
    for k, v in sd.items():
        stem, leaf = k.rsplit(".", 1)
        out[f"{stem}.conv.{leaf}"] = v
    return out


def test_speechbrain_nesting_converts_cleanly(rng):
    """The real speechbrain checkpoint layout (``.conv.`` wrapper level)
    must convert to the SAME params as the plain layout — the reference's
    own loader would silently drop these keys via ``strict=False``
    (hifigan_pretrained.py:190)."""
    torch.manual_seed(7)
    tgen = _TorchGenerator(_SMALL).eval()
    plain = convert_hifigan_state_dict(tgen.state_dict(), _SMALL)
    nested = convert_hifigan_state_dict(
        _speechbrainify(tgen.state_dict()), _SMALL
    )
    jax.tree_util.tree_map(np.testing.assert_array_equal, plain, nested)


def test_dataparallel_and_flat_gan_prefixes_convert(rng):
    """``module.``-prefixed (DataParallel) and flat ``generator.``-prefixed
    (combined GAN ckpt) layouts canonicalize to the same params."""
    torch.manual_seed(8)
    tgen = _TorchGenerator(_SMALL).eval()
    sd = tgen.state_dict()
    plain = convert_hifigan_state_dict(sd, _SMALL)
    for prefix in ("module.", "generator."):
        prefixed = {prefix + k: v for k, v in sd.items()}
        got = convert_hifigan_state_dict(prefixed, _SMALL)
        jax.tree_util.tree_map(np.testing.assert_array_equal, plain, got)


def test_speechbrain_nested_checkpoint_file_roundtrip(rng, tmp_path):
    """End-to-end: a torch-saved checkpoint file in speechbrain layout
    loads through load_pretrained_hifigan and vocode matches the torch
    fixture's waveform."""
    from iris_tts_tpu.convert.hifigan_torch import load_pretrained_hifigan

    torch.manual_seed(9)
    tgen = _TorchGenerator(_SMALL).eval()
    path = tmp_path / "generator.ckpt"
    torch.save(_speechbrainify(tgen.state_dict()), path)
    voc = load_pretrained_hifigan(path, _SMALL)
    mel = rng.standard_normal((1, 40, 10)).astype(np.float32)  # [B, T, C]
    with torch.no_grad():
        want = tgen(torch.from_numpy(mel.transpose(0, 2, 1))).numpy()[:, 0, :]
    got = np.asarray(voc(mel.transpose(0, 2, 1)))  # [B, n_mels, T] in
    np.testing.assert_allclose(got, want, atol=1e-4)
