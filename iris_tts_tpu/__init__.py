"""iris_tts_tpu — a TPU-native text-to-speech framework in JAX/XLA/Pallas.

A from-scratch rebuild of the capabilities of the reference ``iris-tts``
project (PortaSpeech-style acoustic model + HiFiGAN vocoder on LJSpeech),
redesigned TPU-first: stateless flax modules, jit-compiled end-to-end
synthesis with static shapes and length bucketing, device-side length
regulation, optax/orbax training, and mesh-sharded batched inference.
See SURVEY.md for the reference analysis this implements.
"""

from iris_tts_tpu.config import (
    AudioConfig,
    DurationConfig,
    EncoderConfig,
    HiFiGANConfig,
    IrisConfig,
    MeshConfig,
    PostNetConfig,
    TrainConfig,
    VAEConfig,
    load_config,
    save_config,
)
from iris_tts_tpu.version import __version__

__all__ = [
    "__version__",
    "AudioConfig",
    "DurationConfig",
    "EncoderConfig",
    "HiFiGANConfig",
    "IrisConfig",
    "MeshConfig",
    "PostNetConfig",
    "TrainConfig",
    "VAEConfig",
    "load_config",
    "save_config",
]
