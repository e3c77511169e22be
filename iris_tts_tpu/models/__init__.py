"""Model zoo: phoneme encoder, duration predictor, VAE, PostNet, HiFiGAN."""

from iris_tts_tpu.models.encoder import (
    DurationPredictor,
    PhonemeEncoder,
    TransformerBlock,
)
from iris_tts_tpu.models.hifigan import (
    HiFiGANGenerator,
    HiFiGANVocoder,
    ResBlock,
    TorchConv1d,
    TorchConvTranspose1d,
    create_vocoder,
)
from iris_tts_tpu.models.pipeline import (
    FRAME_BUCKETS,
    PHONEME_BUCKETS,
    TTSPipeline,
    pick_bucket,
)
from iris_tts_tpu.models.postnet import PostNet
from iris_tts_tpu.models.vae import (
    APCoupling,
    FiLM,
    TemporalDownsample,
    TemporalUpsample,
    TextConditionedVAE,
    VolumePreservingFlow,
    WaveNetResBlock,
)

__all__ = [
    "DurationPredictor",
    "PhonemeEncoder",
    "TransformerBlock",
    "HiFiGANGenerator",
    "HiFiGANVocoder",
    "ResBlock",
    "TorchConv1d",
    "TorchConvTranspose1d",
    "create_vocoder",
    "TTSPipeline",
    "pick_bucket",
    "PHONEME_BUCKETS",
    "FRAME_BUCKETS",
    "PostNet",
    "APCoupling",
    "FiLM",
    "TemporalDownsample",
    "TemporalUpsample",
    "TextConditionedVAE",
    "VolumePreservingFlow",
    "WaveNetResBlock",
]
