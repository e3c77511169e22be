"""Train-step tests: losses go down, state advances, batch stats update."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from iris_tts_tpu.config import (
    DurationConfig,
    EncoderConfig,
    IrisConfig,
    PostNetConfig,
    VAEConfig,
)
from iris_tts_tpu.models import (
    DurationPredictor,
    PhonemeEncoder,
    PostNet,
    TextConditionedVAE,
)
from iris_tts_tpu.train import (
    TrainState,
    adam_clipped,
    kl_weight_schedule,
    make_duration_eval_step,
    make_duration_train_step,
    make_postnet_train_step,
    make_vae_train_step,
    warmup_cosine,
)

CFG = IrisConfig(
    encoder=EncoderConfig(vocab_size=12, embed_dim=16, num_blocks=1, num_heads=2),
    duration=DurationConfig(hidden_dim=8, num_layers=1),
    vae=VAEConfig(
        n_mels=8, cond_dim=16, model_channels=8, latent_dim=4,
        num_wavenet_blocks=1, decoder_blocks=1, flow_layers=1, flow_hidden=8,
    ),
    postnet=PostNetConfig(n_mels=8, num_layers=2, channels=8),
)

B, P, T = 4, 6, 16


def _duration_batch(rng):
    return {
        "phoneme_ids": jnp.asarray(
            rng.integers(2, 12, size=(B, P)), jnp.int32
        ),
        "durations": jnp.asarray(
            rng.integers(1, 5, size=(B, P)).astype(np.float32)
        ),
        "phoneme_mask": jnp.ones((B, P), jnp.float32),
    }


def _vae_batch(rng):
    b = _duration_batch(rng)
    # durations summing within T
    b["durations"] = jnp.full((B, P), 2.0)
    b["mel"] = jnp.asarray(
        rng.standard_normal((B, T, CFG.vae.n_mels)).astype(np.float32)
    )
    return b


def _init_duration_state(key):
    enc = PhonemeEncoder(config=CFG.encoder)
    head = DurationPredictor(config=CFG.duration)
    ids = jnp.zeros((1, P), jnp.int32)
    p_enc = enc.init(key, ids)["params"]
    p_head = head.init(key, enc.apply({"params": p_enc}, ids))["params"]
    tx = adam_clipped(1e-2, clip_norm=1.0)
    return TrainState.create(
        {"encoder": p_enc, "duration": p_head}, tx, key
    )


def test_duration_training_reduces_loss(rng):
    key = jax.random.PRNGKey(0)
    state = _init_duration_state(key)
    step = jax.jit(make_duration_train_step(CFG))
    batch = _duration_batch(rng)
    losses = []
    for _ in range(30):
        state, metrics = step(state, batch)
        losses.append(float(metrics["duration_loss"]))
    assert int(state.step) == 30
    assert losses[-1] < losses[0] * 0.7, losses[::10]


def test_duration_eval_metrics(rng):
    key = jax.random.PRNGKey(0)
    state = _init_duration_state(key)
    ev = jax.jit(make_duration_eval_step(CFG))
    m = ev(state.params, _duration_batch(rng))
    assert set(m) == {"duration_loss", "duration_mae_frames"}
    assert np.isfinite(float(m["duration_mae_frames"]))


def test_vae_training_step(rng):
    key = jax.random.PRNGKey(1)
    enc = PhonemeEncoder(config=CFG.encoder)
    vae = TextConditionedVAE(config=CFG.vae)
    ids = jnp.zeros((1, P), jnp.int32)
    p_enc = enc.init(key, ids)["params"]
    p_vae = vae.init(
        {"params": key, "sample": key},
        jnp.zeros((1, T, CFG.vae.n_mels)),
        jnp.zeros((1, T, CFG.vae.cond_dim)),
    )["params"]
    state = TrainState.create(
        p_vae, adam_clipped(1e-3), key, frozen={"encoder": p_enc}
    )
    step = jax.jit(make_vae_train_step(CFG))
    batch = _vae_batch(rng)

    frozen_before = jax.tree_util.tree_leaves(state.frozen)[0].copy()
    losses = []
    for epoch in range(20):
        kl_w = kl_weight_schedule(epoch)
        state, metrics = step(state, batch, jnp.asarray(kl_w))
        losses.append(float(metrics["total"]))
    assert losses[-1] < losses[0], losses[::5]
    assert np.isfinite(losses).all()
    # Frozen encoder untouched.
    np.testing.assert_array_equal(
        jax.tree_util.tree_leaves(state.frozen)[0], frozen_before
    )


def test_postnet_training_step(rng):
    key = jax.random.PRNGKey(2)
    enc = PhonemeEncoder(config=CFG.encoder)
    vae = TextConditionedVAE(config=CFG.vae)
    pn = PostNet(config=CFG.postnet)
    ids = jnp.zeros((1, P), jnp.int32)
    p_enc = enc.init(key, ids)["params"]
    p_vae = vae.init(
        {"params": key, "sample": key},
        jnp.zeros((1, T, CFG.vae.n_mels)),
        jnp.zeros((1, T, CFG.vae.cond_dim)),
    )["params"]
    pn_vars = pn.init(key, jnp.zeros((1, T, CFG.postnet.n_mels)))
    state = TrainState.create(
        pn_vars["params"],
        adam_clipped(1e-3),
        key,
        batch_stats=pn_vars["batch_stats"],
        frozen={"encoder": p_enc, "vae": p_vae},
    )
    step = jax.jit(make_postnet_train_step(CFG))
    batch = _vae_batch(rng)
    stats_before = jax.tree_util.tree_leaves(state.batch_stats)[0].copy()
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["postnet_l1"]))
    stats_after = jax.tree_util.tree_leaves(state.batch_stats)[0]
    assert not np.allclose(stats_before, stats_after)  # BN stats moved


def test_warmup_cosine_shape():
    sched = warmup_cosine(1e-3, warmup_steps=10, total_steps=100)
    lrs = [float(sched(s)) for s in [0, 5, 10, 50, 99]]
    assert lrs[0] < lrs[1] < lrs[2]  # warmup rising
    assert abs(lrs[2] - 1e-3) < 1e-9  # peak
    assert lrs[3] < lrs[2] and lrs[4] < lrs[3]  # decaying


def test_kl_schedule_reference_shape():
    # train_vae.py:232-239: linear 0.001 → 0.01 over 20 epochs.
    assert kl_weight_schedule(0) == 0.001
    assert abs(kl_weight_schedule(10) - 0.0055) < 1e-9
    assert abs(kl_weight_schedule(20) - 0.01) < 1e-9
    assert abs(kl_weight_schedule(99) - 0.01) < 1e-9


def test_preemption_checkpoints_and_resumes(rng, tmp_path):
    """SIGTERM mid-epoch → TrainLoop writes a full-state checkpoint and
    returns cleanly; resume_if_available restores it (new capability —
    the reference's resume loses optimizer/RNG state, SURVEY.md §5)."""
    import os
    import signal

    from iris_tts_tpu.train import TrainLoop
    from iris_tts_tpu.train.checkpoint import CheckpointManager
    from iris_tts_tpu.train.loop import resume_if_available

    state = _init_duration_state(jax.random.PRNGKey(0))
    step = jax.jit(make_duration_train_step(CFG))

    class SignalingBatcher:
        """Sends SIGTERM to our own process after 2 batches of epoch 0."""

        def epoch(self, i):
            for n in range(50):
                if i == 0 and n == 2:
                    os.kill(os.getpid(), signal.SIGTERM)
                yield _duration_batch(rng)

    ckpt = CheckpointManager(tmp_path / "ckpt", CFG)
    loop = TrainLoop(
        state=state,
        train_step=step,
        batcher=SignalingBatcher(),
        num_epochs=10,
        checkpoints=ckpt,
        checkpoint_every=1000,  # only the preemption path may save
        # The SIGTERM-after-2-batches choreography needs the batcher
        # consumed synchronously; with lookahead the signal lands before
        # the consumer has applied batch 2 (still a correct preemption —
        # just an untestably loose step bound).
        prefetch=0,
    )
    out_state = loop.run()
    assert loop.preempted
    # Process-wide marker: the four-stage driver consults this to stop
    # instead of training the next stage on a half-trained upstream.
    from iris_tts_tpu.train.loop import was_preempted

    assert was_preempted()
    saved_step = int(out_state.step)
    assert 2 <= saved_step < 50  # stopped mid-epoch, not at the end
    assert ckpt.latest_step() == saved_step

    restored, start_epoch = resume_if_available(
        CheckpointManager(tmp_path / "ckpt", CFG), state
    )
    assert int(restored.step) == saved_step
    assert start_epoch == 0  # interrupted epoch re-runs

    # The loop restored its default signal disposition.
    assert signal.getsignal(signal.SIGTERM) == signal.SIG_DFL


def test_grad_accumulation_matches_full_batch(rng):
    """accum_steps=2 over two half-batches == one full-batch step, when
    dropout is off and masks weight each microbatch equally."""
    import dataclasses

    from iris_tts_tpu.train import split_microbatches

    import optax

    cfg = dataclasses.replace(
        CFG,
        encoder=dataclasses.replace(CFG.encoder, dropout=0.0),
        duration=dataclasses.replace(CFG.duration, dropout=0.0),
    )
    key = jax.random.PRNGKey(3)
    # SGD, not Adam: Adam's first-step update is ~lr·sign(g), which
    # amplifies float-ulp gradient differences into visible param deltas;
    # SGD keeps the comparison linear in the (identical) gradients.
    state0 = TrainState.create(
        _init_duration_state(key).params, optax.sgd(1e-2), key
    )
    batch = _duration_batch(rng)

    full_step = jax.jit(make_duration_train_step(cfg))
    state_full, m_full = full_step(state0, batch)

    accum_step = jax.jit(make_duration_train_step(cfg, accum_steps=2))
    state_acc, m_acc = accum_step(state0, split_microbatches(batch, 2))

    np.testing.assert_allclose(
        float(m_acc["duration_loss"]), float(m_full["duration_loss"]),
        rtol=1e-5,
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(state_acc.params),
        jax.tree_util.tree_leaves(state_full.params),
    ):
        np.testing.assert_allclose(a, b, atol=2e-6)


def test_split_microbatches_shape_and_validation(rng):
    from iris_tts_tpu.train import split_microbatches

    batch = _duration_batch(rng)
    mb = split_microbatches(batch, 2)
    assert mb["phoneme_ids"].shape == (2, B // 2, P)
    np.testing.assert_array_equal(
        mb["phoneme_ids"].reshape(B, P), batch["phoneme_ids"]
    )
    with np.testing.assert_raises(ValueError):
        split_microbatches(batch, 3)


def test_vae_accumulated_step_runs(rng):
    key = jax.random.PRNGKey(4)
    enc = PhonemeEncoder(config=CFG.encoder)
    vae = TextConditionedVAE(config=CFG.vae)
    ids = jnp.zeros((1, P), jnp.int32)
    p_enc = enc.init(key, ids)["params"]
    p_vae = vae.init(
        {"params": key, "sample": key},
        jnp.zeros((1, T, CFG.vae.n_mels)),
        jnp.zeros((1, T, CFG.vae.cond_dim)),
    )["params"]
    state = TrainState.create(
        p_vae, adam_clipped(1e-3), key, frozen={"encoder": p_enc}
    )
    from iris_tts_tpu.train import split_microbatches

    step = jax.jit(make_vae_train_step(CFG, accum_steps=2))
    batch = split_microbatches(_vae_batch(rng), 2)
    state, metrics = step(state, batch, jnp.asarray(0.01))
    assert int(state.step) == 1
    assert np.isfinite(float(metrics["total"]))


def test_ema_tracking_and_serving_params(rng):
    key = jax.random.PRNGKey(5)
    state = _init_duration_state(key)
    # No EMA by default: serving_params is just params.
    assert state.ema_params is None
    assert state.serving_params is state.params

    ema_state = TrainState.create(
        state.params, adam_clipped(1e-2), key, ema_decay=0.5
    )
    step = jax.jit(make_duration_train_step(CFG))
    batch = _duration_batch(rng)
    p0 = ema_state.params
    s1, _ = step(ema_state, batch)
    s2, _ = step(s1, batch)
    # ema after 2 steps = .5(.5 p0 + .5 p1) + .5 p2, leafwise.
    expect = jax.tree.map(
        lambda a, b, c: 0.5 * (0.5 * a + 0.5 * b) + 0.5 * c,
        p0, s1.params, s2.params,
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(s2.ema_params),
        jax.tree_util.tree_leaves(expect),
    ):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-7)
    assert s2.serving_params is s2.ema_params


def test_bf16_mixed_precision_training(rng):
    """compute_dtype=bf16: modules compute in bfloat16 while params, grads
    and the optimizer stay f32 — loss trajectory tracks the f32 step within
    bf16 tolerance, params remain f32, and loss still decreases."""
    key = jax.random.PRNGKey(3)
    batch = _duration_batch(rng)

    s32 = _init_duration_state(key)
    s16 = _init_duration_state(key)
    step32 = jax.jit(make_duration_train_step(CFG))
    step16 = jax.jit(
        make_duration_train_step(CFG, compute_dtype=jnp.bfloat16)
    )
    losses16 = []
    for _ in range(5):
        s32, m32 = step32(s32, batch)
        s16, m16 = step16(s16, batch)
        losses16.append(float(m16["duration_loss"]))
        # bf16 has ~3 decimal digits; the masked-mean loss must track f32.
        assert abs(float(m16["duration_loss"]) - float(m32["duration_loss"])
                   ) < 0.05 * max(1.0, float(m32["duration_loss"]))
    assert losses16[-1] < losses16[0]
    for leaf in jax.tree_util.tree_leaves(s16.params):
        assert leaf.dtype == jnp.float32  # mixed precision: f32 master copy

    # GAN sides accept the knob too (smoke: one finite bf16 round).
    from iris_tts_tpu.train.gan import make_gan_steps
    from iris_tts_tpu.models.hifigan import HiFiGANGenerator
    from iris_tts_tpu.models.discriminators import HiFiGANDiscriminators
    import dataclasses

    from iris_tts_tpu.config import AudioConfig

    hcfg = dataclasses.replace(
        CFG,
        hifigan=type(CFG.hifigan)(
            in_channels=CFG.vae.n_mels, upsample_rates=(4, 2),
            upsample_kernel_sizes=(8, 4), upsample_initial_channel=16,
            resblock_kernel_sizes=(3,), resblock_dilations=((1,),),
        ),
        # hop must equal the tiny generator's total upsample (8) so real
        # and generated audio lengths agree in the GAN losses.
        audio=AudioConfig(n_fft=64, hop_length=8, win_length=64, n_mels=8),
    )
    gen = HiFiGANGenerator(config=hcfg.hifigan)
    disc = HiFiGANDiscriminators(periods=(2,), num_scales=1, width=0.25)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    seg_t = 16
    hop = hcfg.audio.hop_length
    p_g = gen.init(k1, jnp.zeros((1, seg_t, hcfg.vae.n_mels)))["params"]
    p_d = disc.init(k2, jnp.zeros((2, seg_t * hop)))["params"]
    gs = TrainState.create(p_g, adam_clipped(1e-4), k1)
    ds_ = TrainState.create(p_d, adam_clipped(1e-4), k2)
    d_step, g_step = make_gan_steps(
        hcfg, periods=(2,), num_scales=1, disc_width=0.25,
        compute_dtype=jnp.bfloat16,
    )
    npr = np.random.default_rng(0)
    b = {
        "mel": jnp.asarray(npr.standard_normal(
            (2, seg_t, hcfg.vae.n_mels)).astype(np.float32)),
        "audio": jnp.asarray(npr.standard_normal(
            (2, seg_t * hop)).astype(np.float32) * 0.1),
    }
    ds_, dm = jax.jit(d_step)(gs, ds_, b)
    gs, gm = jax.jit(g_step)(gs, ds_, b)
    assert np.isfinite(float(dm["disc_loss"]))
    assert np.isfinite(float(gm["gen_total"]))


def test_remat_vae_step_matches_no_remat(rng):
    """remat=True (jax.checkpoint over the WaveNet blocks): forward loss is
    bit-identical (same rng threading through the lifted transform) and
    SGD-updated params agree to float-reassociation tolerance."""
    import optax

    key = jax.random.PRNGKey(1)
    enc = PhonemeEncoder(config=CFG.encoder)
    vae = TextConditionedVAE(config=CFG.vae)
    ids = jnp.zeros((1, P), jnp.int32)
    p_enc = enc.init(key, ids)["params"]
    p_vae = vae.init(
        {"params": key, "sample": key},
        jnp.zeros((1, T, CFG.vae.n_mels)),
        jnp.zeros((1, T, CFG.vae.cond_dim)),
    )["params"]
    batch = _vae_batch(rng)

    outs = {}
    for remat in (False, True):
        st = TrainState.create(
            p_vae, optax.sgd(1e-2), key, frozen={"encoder": p_enc}
        )
        step = jax.jit(make_vae_train_step(CFG, remat=remat))
        losses = []
        for _ in range(3):
            st, m = step(st, batch, jnp.asarray(0.01))
            losses.append(float(m["total"]))
        outs[remat] = (losses, st.params)
    assert outs[False][0] == outs[True][0]  # forward bit-identical
    for a, b in zip(
        jax.tree_util.tree_leaves(outs[False][1]),
        jax.tree_util.tree_leaves(outs[True][1]),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-8, rtol=1e-6
        )


def test_checkify_step_pinpoints_nan(rng):
    """scripts.common.jit_train_step(checkify_enabled=True): a NaN entering
    the step raises a located checkify error instead of silently poisoning
    the run; the clean path still trains."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from scripts.common import jit_train_step

    state = _init_duration_state(jax.random.PRNGKey(0))
    step = jit_train_step(
        make_duration_train_step(CFG), checkify_enabled=True
    )
    batch = _duration_batch(rng)
    state, m = step(state, batch)  # clean batch passes
    assert np.isfinite(float(m["duration_loss"]))

    bad = dict(batch)
    bad["durations"] = batch["durations"].at[0, 0].set(jnp.nan)
    from jax.experimental import checkify as _ck

    with pytest.raises(_ck.JaxRuntimeError, match="nan"):
        step(state, bad)
