"""Training layer: train states, schedules, jitted steps, checkpoints."""

from iris_tts_tpu.train.schedules import (
    kl_weight_schedule,
    warmup_cosine,
    warmup_exponential,
)
from iris_tts_tpu.train.gan import make_gan_steps
from iris_tts_tpu.train.loop import TrainLoop, resume_if_available
from iris_tts_tpu.train.state import TrainState, adam_clipped
from iris_tts_tpu.train.steps import (
    make_duration_eval_step,
    make_duration_train_step,
    make_postnet_train_step,
    make_vae_eval_step,
    make_vae_recon_step,
    make_vae_train_step,
    split_microbatches,
)

__all__ = [
    "split_microbatches",
    "make_gan_steps",
    "TrainLoop",
    "resume_if_available",
    "kl_weight_schedule",
    "warmup_cosine",
    "warmup_exponential",
    "TrainState",
    "adam_clipped",
    "make_duration_eval_step",
    "make_duration_train_step",
    "make_postnet_train_step",
    "make_vae_eval_step",
    "make_vae_recon_step",
    "make_vae_train_step",
]
