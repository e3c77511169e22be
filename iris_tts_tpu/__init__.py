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


def __getattr__(name):
    """Lazy top-level API (parity with the reference's public names:
    BASELINE.json north star — TTSPipeline, create_text_processor,
    create_vocoder, infer_hifigan) without importing jax at package-import
    time for host-only users."""
    if name == "TTSPipeline":
        from iris_tts_tpu.models.pipeline import TTSPipeline

        return TTSPipeline
    if name == "create_text_processor":
        from iris_tts_tpu.text.frontend import create_text_processor

        return create_text_processor
    if name == "create_vocoder":
        from iris_tts_tpu.models.hifigan import create_vocoder

        return create_vocoder
    if name in ("infer_hifigan", "get_pretrained_hifigan"):
        from iris_tts_tpu.convert import hifigan_torch

        return getattr(hifigan_torch, name)
    if name in ("TTSServer", "DynamicBatcher", "serve_forever",
                "AotPipeline", "ExportedSynthesizer", "export_pipeline"):
        from iris_tts_tpu import serve

        return getattr(serve, name)
    raise AttributeError(f"module 'iris_tts_tpu' has no attribute {name!r}")

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
