"""Full-system integration: train all stages briefly → checkpoint →
assemble TTSPipeline.from_checkpoints → synthesize audio.

This is the cross-stage wiring test the reference never had (its stages are
glued by hand-copied architecture args — SURVEY.md §2.6)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iris_tts_tpu.config import (
    DurationConfig,
    EncoderConfig,
    HiFiGANConfig,
    IrisConfig,
    PostNetConfig,
    VAEConfig,
)
from iris_tts_tpu.data.ljspeech import Sample
from iris_tts_tpu.data.batching import BucketedBatcher
from iris_tts_tpu.models import (
    DurationPredictor,
    PhonemeEncoder,
    PostNet,
    TextConditionedVAE,
    TTSPipeline,
)
from iris_tts_tpu.train import (
    TrainLoop,
    TrainState,
    adam_clipped,
    make_duration_train_step,
    make_vae_train_step,
    make_postnet_train_step,
)
from iris_tts_tpu.train.checkpoint import CheckpointManager
from iris_tts_tpu.text.phonemes import PhonemeVocab


CFG = IrisConfig(
    encoder=EncoderConfig(vocab_size=8, embed_dim=16, num_blocks=1, num_heads=2),
    duration=DurationConfig(hidden_dim=8, num_layers=1),
    vae=VAEConfig(
        n_mels=8, cond_dim=16, model_channels=8, latent_dim=4,
        num_wavenet_blocks=1, decoder_blocks=1, flow_layers=1, flow_hidden=8,
    ),
    postnet=PostNetConfig(n_mels=8, num_layers=2, channels=8),
    hifigan=HiFiGANConfig(
        in_channels=8,
        upsample_rates=(4, 2),
        upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=16,
        resblock_kernel_sizes=(3,),
        resblock_dilations=((1,),),
    ),
)


def _synthetic_dataset(n=8):
    rng = np.random.default_rng(0)
    samples = []
    for i in range(n):
        p = 4 + i % 3
        durs = rng.integers(1, 4, p).astype(np.float32)
        t = int(durs.sum())
        samples.append(
            Sample(
                file_id=f"s{i}",
                text="",
                phoneme_ids=rng.integers(2, 8, p).astype(np.int32),
                durations=durs,
                mel=rng.standard_normal((t, 8)).astype(np.float32),
            )
        )
    return samples


@pytest.mark.integration
def test_three_stage_train_then_assemble_pipeline(tmp_path):
    key = jax.random.PRNGKey(0)
    data = _synthetic_dataset()
    dur_batcher = BucketedBatcher(
        data, 4, phoneme_buckets=(8,), with_mel=False
    )
    vae_batcher = BucketedBatcher(
        data, 4, phoneme_buckets=(8,), frame_buckets=(16,), with_mel=True
    )

    # Stage 1: encoder + duration
    enc = PhonemeEncoder(config=CFG.encoder)
    head = DurationPredictor(config=CFG.duration)
    ids0 = jnp.zeros((1, 8), jnp.int32)
    p_enc = enc.init(key, ids0)["params"]
    p_head = head.init(key, enc.apply({"params": p_enc}, ids0))["params"]
    enc_ckpt = CheckpointManager(tmp_path / "enc", CFG)
    loop = TrainLoop(
        state=TrainState.create(
            {"encoder": p_enc, "duration": p_head}, adam_clipped(1e-3), key
        ),
        train_step=jax.jit(make_duration_train_step(CFG)),
        batcher=dur_batcher,
        num_epochs=2,
        checkpoints=enc_ckpt,
        checkpoint_every=1,
        val_metric_key="duration_loss",
    )
    enc_state = loop.run()
    assert len(loop.history) == 2

    # Stage 2: VAE with frozen encoder
    vae = TextConditionedVAE(config=CFG.vae)
    p_vae = vae.init(
        {"params": key, "sample": key},
        jnp.zeros((1, 16, 8)), jnp.zeros((1, 16, 16)),
    )["params"]
    vae_ckpt = CheckpointManager(tmp_path / "vae", CFG)
    loop = TrainLoop(
        state=TrainState.create(
            p_vae, adam_clipped(1e-3), key,
            frozen={"encoder": enc_state.params["encoder"]},
        ),
        train_step=jax.jit(make_vae_train_step(CFG)),
        batcher=vae_batcher,
        num_epochs=1,
        checkpoints=vae_ckpt,
        checkpoint_every=1,
        epoch_extras=lambda e: (0.01,),
    )
    vae_state = loop.run()

    # Stage 3: PostNet over frozen encoder+VAE
    pn = PostNet(config=CFG.postnet)
    pn_vars = pn.init(key, jnp.zeros((1, 16, 8)))
    pn_ckpt = CheckpointManager(tmp_path / "pn", CFG)
    loop = TrainLoop(
        state=TrainState.create(
            pn_vars["params"], adam_clipped(1e-3), key,
            batch_stats=pn_vars["batch_stats"],
            frozen={
                "encoder": enc_state.params["encoder"],
                "vae": vae_state.params,
            },
        ),
        train_step=jax.jit(make_postnet_train_step(CFG)),
        batcher=vae_batcher,
        num_epochs=1,
        checkpoints=pn_ckpt,
        checkpoint_every=1,
        val_metric_key="postnet_l1",
    )
    loop.run()

    # Assemble the inference pipeline from the stage checkpoints.
    vocab = PhonemeVocab.build([f"P{i}" for i in range(6)])  # 8 with specials
    pipe = TTSPipeline.from_checkpoints(
        tmp_path / "enc",
        tmp_path / "vae",
        postnet_checkpoint=tmp_path / "pn",
        config=CFG,
        vocab=vocab,
    )
    pipe.phoneme_buckets = (8,)
    pipe.frame_buckets = (16, 32)

    # Trained encoder params actually made it into the pipeline.
    a = jax.tree_util.tree_leaves(enc_state.params["encoder"])[0]
    b = jax.tree_util.tree_leaves(pipe.params["encoder"])[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    audio = pipe.synthesize("p one p two", seed=0)
    assert audio.ndim == 1 and len(audio) > 0
    assert np.isfinite(audio).all()

    # Stage 4 (GAN fine-tune consumption): a generator checkpoint with an
    # EMA average deploys the AVERAGE via hifigan_gan_checkpoint
    # (TrainState.serving_params semantics).
    gan_state = TrainState.create(
        pipe.params["hifigan"], adam_clipped(1e-3), key, ema_decay=0.5
    )
    grads = jax.tree_util.tree_map(
        jnp.ones_like, gan_state.params
    )
    gan_state = gan_state.apply_gradients(grads)  # ema != params now
    gan_ckpt = CheckpointManager(tmp_path / "gan_gen", CFG)
    gan_ckpt.save(1, gan_state)
    gan_ckpt.close()

    pipe2 = TTSPipeline.from_checkpoints(
        tmp_path / "enc",
        tmp_path / "vae",
        postnet_checkpoint=tmp_path / "pn",
        hifigan_gan_checkpoint=tmp_path / "gan_gen",
        config=CFG,
        vocab=vocab,
    )
    want = jax.tree_util.tree_leaves(gan_state.ema_params)[0]
    got = jax.tree_util.tree_leaves(pipe2.params["hifigan"])[0]
    raw = jax.tree_util.tree_leaves(gan_state.params)[0]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert np.abs(np.asarray(got) - np.asarray(raw)).max() > 0

    with pytest.raises(ValueError, match="not both"):
        TTSPipeline.from_checkpoints(
            tmp_path / "enc", tmp_path / "vae", config=CFG, vocab=vocab,
            hifigan_checkpoint="x.ckpt",
            hifigan_gan_checkpoint=tmp_path / "gan_gen",
        )
