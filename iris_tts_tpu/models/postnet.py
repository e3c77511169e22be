"""Tacotron2-style PostNet for mel refinement.

TPU-native rebuild of /root/reference/src/iris/postnet.py:8-67: (L-1) ×
[Conv1D + BatchNorm + tanh + dropout] then Conv1D→n_mels + BatchNorm, output
added residually to the input mel. This is the only batch-statistics module
in the system (SURVEY.md §2.1); flax keeps the running stats in a separate
``batch_stats`` collection instead of the reference's fragile
build-with-training=True dance (scripts/synthesize.py:159-162).

Mel layout is time-major [B, T, n_mels]. BatchNorm matches Keras defaults
(momentum 0.99, epsilon 1e-3).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from iris_tts_tpu.config import PostNetConfig
from iris_tts_tpu.models.layers import Conv1d


class PostNet(nn.Module):
    config: PostNetConfig = PostNetConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        mel: jnp.ndarray,
        deterministic: bool = True,
        use_running_average: bool = True,
    ) -> jnp.ndarray:
        """
        Args:
            mel: [B, T, n_mels].
            deterministic: disables dropout when True.
            use_running_average: True at inference; False during training
                (updates the ``batch_stats`` collection).
        Returns:
            refined mel [B, T, n_mels] (input + residual).
        """
        cfg = self.config
        h = mel
        for i in range(cfg.num_layers - 1):
            h = Conv1d(
                cfg.channels,
                cfg.kernel_size,
                dtype=self.dtype,
                name=f"conv_{i}",
            )(h)
            h = nn.BatchNorm(
                use_running_average=use_running_average,
                momentum=0.99,
                epsilon=1e-3,
                dtype=self.dtype,
                name=f"bn_{i}",
            )(h)
            h = jnp.tanh(h)
            h = nn.Dropout(cfg.dropout, deterministic=deterministic)(h)
        res = Conv1d(
            cfg.n_mels,
            cfg.kernel_size,
            dtype=self.dtype,
            name="conv_out",
        )(h)
        res = nn.BatchNorm(
            use_running_average=use_running_average,
            momentum=0.99,
            epsilon=1e-3,
            dtype=self.dtype,
            name="bn_out",
        )(res)
        return mel + res
