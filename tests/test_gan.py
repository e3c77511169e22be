"""GAN fine-tune tests: discriminators, alternating steps, loop."""

import jax
import jax.numpy as jnp
import numpy as np

from iris_tts_tpu.config import AudioConfig, HiFiGANConfig, IrisConfig
from iris_tts_tpu.models.discriminators import (
    HiFiGANDiscriminators,
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
)
from iris_tts_tpu.models.hifigan import HiFiGANGenerator
from iris_tts_tpu.train import TrainState, adam_clipped
from iris_tts_tpu.train.gan import make_gan_steps

_CFG = IrisConfig(
    hifigan=HiFiGANConfig(
        in_channels=80,
        upsample_rates=(4, 2),
        upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=16,
        resblock_kernel_sizes=(3,),
        resblock_dilations=((1, 3),),
    ),
    # mel loss config must match the 8x upsample: use tiny n_fft for speed
    audio=AudioConfig(n_fft=64, hop_length=8, win_length=64, n_mels=16),
)


def test_mpd_shapes():
    mpd = MultiPeriodDiscriminator(periods=(2, 3), width=0.1)
    audio = jnp.zeros((2, 101))  # not divisible by periods → edge-pad
    params = jax.jit(mpd.init)(jax.random.PRNGKey(0), audio)["params"]
    logits, feats = jax.jit(mpd.apply)({"params": params}, audio)
    assert len(logits) == 2 and len(feats) == 2
    for l in logits:
        assert l.shape[0] == 2
    assert all(len(f) == 6 for f in feats)


def test_msd_shapes():
    msd = MultiScaleDiscriminator(num_scales=2, width=0.1)
    audio = jnp.zeros((2, 128))
    params = jax.jit(msd.init)(jax.random.PRNGKey(0), audio)["params"]
    logits, feats = jax.jit(msd.apply)({"params": params}, audio)
    assert len(logits) == 2
    # second scale sees pooled (half-length) audio
    assert logits[1].shape[1] <= logits[0].shape[1]


def test_gan_steps_run_and_update(rng):
    key = jax.random.PRNGKey(0)
    k_g, k_d = jax.random.split(key)
    T = 16  # mel frames; audio = 128 samples
    hop = _CFG.hifigan.total_upsample
    gen = HiFiGANGenerator(config=_CFG.hifigan)
    disc = HiFiGANDiscriminators(periods=(2, 3), num_scales=2, width=0.05)

    p_gen = jax.jit(gen.init)(
        k_g, jnp.zeros((1, T, _CFG.hifigan.in_channels))
    )["params"]
    p_disc = jax.jit(disc.init)(k_d, jnp.zeros((2, T * hop)))["params"]

    gen_state = TrainState.create(p_gen, adam_clipped(1e-3), k_g)
    disc_state = TrainState.create(p_disc, adam_clipped(1e-3), k_d)

    from iris_tts_tpu.ops.losses import (
        feature_matching_loss,
        lsgan_discriminator_loss,
        lsgan_generator_loss,
    )
    from iris_tts_tpu.ops.stft import log_mel_spectrogram

    def disc_loss(dp, gp, batch):
        fake = jax.lax.stop_gradient(
            gen.apply({"params": gp}, batch["mel"])
        )
        rl, _ = disc.apply({"params": dp}, batch["audio"])
        fl, _ = disc.apply({"params": dp}, fake)
        return lsgan_discriminator_loss(rl, fl)

    def gen_loss(gp, dp, batch):
        fake = gen.apply({"params": gp}, batch["mel"])
        fl, ff = disc.apply({"params": dp}, fake)
        _, rf = disc.apply({"params": dp}, batch["audio"])
        mel_l1 = jnp.mean(
            jnp.abs(
                log_mel_spectrogram(fake, _CFG.audio)
                - log_mel_spectrogram(batch["audio"], _CFG.audio)
            )
        )
        return (
            lsgan_generator_loss(fl)
            + 2.0 * feature_matching_loss(rf, ff)
            + 45.0 * mel_l1
        )

    batch = {
        "mel": jnp.asarray(
            rng.standard_normal((2, T, 80)).astype(np.float32)
        ),
        "audio": jnp.asarray(
            (0.1 * rng.standard_normal((2, T * hop))).astype(np.float32)
        ),
    }

    d0, dgrads = jax.jit(jax.value_and_grad(disc_loss))(
        disc_state.params, gen_state.params, batch
    )
    g0, ggrads = jax.jit(jax.value_and_grad(gen_loss))(
        gen_state.params, disc_state.params, batch
    )
    assert np.isfinite(float(d0)) and np.isfinite(float(g0))
    # gradients flow to both sides
    assert any(
        float(jnp.abs(x).max()) > 0
        for x in jax.tree_util.tree_leaves(dgrads)
    )
    assert any(
        float(jnp.abs(x).max()) > 0
        for x in jax.tree_util.tree_leaves(ggrads)
    )

    new_disc = disc_state.apply_gradients(dgrads)
    new_gen = gen_state.apply_gradients(ggrads)
    assert int(new_disc.step) == 1 and int(new_gen.step) == 1


def test_make_gan_steps_factory(rng):
    """The production factory with CPU-sized discriminators."""
    cfg = _CFG
    disc_step, gen_step = make_gan_steps(
        cfg, periods=(2,), num_scales=1, disc_width=0.05
    )
    key = jax.random.PRNGKey(1)
    k_g, k_d = jax.random.split(key)
    T = 16
    hop = cfg.hifigan.total_upsample
    gen = HiFiGANGenerator(config=cfg.hifigan)
    disc = HiFiGANDiscriminators(periods=(2,), num_scales=1, width=0.05)
    p_gen = jax.jit(gen.init)(
        k_g, jnp.zeros((1, T, cfg.hifigan.in_channels))
    )["params"]
    p_disc = jax.jit(disc.init)(k_d, jnp.zeros((1, T * hop)))["params"]
    gen_state = TrainState.create(p_gen, adam_clipped(1e-3), k_g)
    disc_state = TrainState.create(p_disc, adam_clipped(1e-3), k_d)
    batch = {
        "mel": jnp.zeros((1, T, cfg.hifigan.in_channels)),
        "audio": jnp.zeros((1, T * hop)),
    }
    disc_state, dm = jax.jit(disc_step)(gen_state, disc_state, batch)
    gen_state, gm = jax.jit(gen_step)(gen_state, disc_state, batch)
    for v in {**dm, **gm}.values():
        assert np.isfinite(float(v))


def test_gan_accumulation_matches_full_batch(rng):
    """accum_steps=2 over half-batches == one full-batch step on both GAN
    sides (SGD keeps the comparison linear in the identical grads, as in
    test_train_steps.py::test_grad_accumulation_matches_full_batch)."""
    import optax

    from iris_tts_tpu.train import split_microbatches

    cfg = _CFG
    key = jax.random.PRNGKey(5)
    k_g, k_d = jax.random.split(key)
    T = 16
    hop = cfg.hifigan.total_upsample
    gen = HiFiGANGenerator(config=cfg.hifigan)
    disc = HiFiGANDiscriminators(periods=(2,), num_scales=1, width=0.05)
    p_gen = jax.jit(gen.init)(
        k_g, jnp.zeros((1, T, cfg.hifigan.in_channels))
    )["params"]
    p_disc = jax.jit(disc.init)(k_d, jnp.zeros((1, T * hop)))["params"]
    batch = {
        "mel": jnp.asarray(
            rng.standard_normal((4, T, cfg.hifigan.in_channels)).astype(
                np.float32
            )
        ),
        "audio": jnp.asarray(
            (0.1 * rng.standard_normal((4, T * hop))).astype(np.float32)
        ),
    }

    def states():
        return (
            TrainState.create(p_gen, optax.sgd(1e-3), k_g),
            TrainState.create(p_disc, optax.sgd(1e-3), k_d),
        )

    full_d, full_g = make_gan_steps(
        cfg, periods=(2,), num_scales=1, disc_width=0.05
    )
    acc_d, acc_g = make_gan_steps(
        cfg, periods=(2,), num_scales=1, disc_width=0.05, accum_steps=2
    )

    gen_state, disc_state = states()
    disc_full, dm_full = jax.jit(full_d)(gen_state, disc_state, batch)
    gen_full, gm_full = jax.jit(full_g)(gen_state, disc_full, batch)

    mb = split_microbatches(batch, 2)
    gen_state, disc_state = states()
    disc_acc, dm_acc = jax.jit(acc_d)(gen_state, disc_state, mb)
    gen_acc, gm_acc = jax.jit(acc_g)(gen_state, disc_acc, mb)

    np.testing.assert_allclose(
        float(dm_acc["disc_loss"]), float(dm_full["disc_loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(gm_acc["gen_total"]), float(gm_full["gen_total"]), rtol=1e-4
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(disc_acc.params),
        jax.tree_util.tree_leaves(disc_full.params),
    ):
        np.testing.assert_allclose(a, b, atol=2e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(gen_acc.params),
        jax.tree_util.tree_leaves(gen_full.params),
    ):
        np.testing.assert_allclose(a, b, atol=2e-6)


def test_gan_remat_generator_matches_no_remat():
    """make_gan_steps(remat=True): MRF resblocks rematerialize in the
    generator's backward pass — SGD-updated generator params agree with the
    stored-activation path to float-reassociation tolerance."""
    import optax

    from iris_tts_tpu.train import TrainState
    from iris_tts_tpu.train.gan import make_gan_steps
    from iris_tts_tpu.models.discriminators import HiFiGANDiscriminators

    T = 16
    hop = _CFG.hifigan.total_upsample
    gen = HiFiGANGenerator(config=_CFG.hifigan)
    disc = HiFiGANDiscriminators(periods=(2,), num_scales=1, width=0.25)
    k_g, k_d = jax.random.split(jax.random.PRNGKey(0))
    p_gen = gen.init(
        k_g, jnp.zeros((1, T, _CFG.hifigan.in_channels))
    )["params"]
    p_disc = disc.init(k_d, jnp.zeros((2, T * hop)))["params"]
    rng = np.random.default_rng(0)
    batch = {
        "mel": jnp.asarray(rng.standard_normal(
            (2, T, _CFG.hifigan.in_channels)).astype(np.float32)),
        "audio": jnp.asarray(
            rng.standard_normal((2, T * hop)).astype(np.float32) * 0.1),
    }

    outs = {}
    for remat in (False, True):
        gs = TrainState.create(p_gen, optax.sgd(1e-3), k_g)
        ds = TrainState.create(p_disc, optax.sgd(1e-3), k_d)
        d_step, g_step = make_gan_steps(
            _CFG, periods=(2,), num_scales=1, disc_width=0.25, remat=remat
        )
        ds, _ = jax.jit(d_step)(gs, ds, batch)
        gs, gm = jax.jit(g_step)(gs, ds, batch)
        outs[remat] = (float(gm["gen_total"]), gs.params)
    assert outs[False][0] == outs[True][0]  # forward bit-identical
    for a, b in zip(
        jax.tree_util.tree_leaves(outs[False][1]),
        jax.tree_util.tree_leaves(outs[True][1]),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-8, rtol=1e-6
        )
