"""Transformer phoneme encoder + convolutional duration predictor.

TPU-native rebuild of /root/reference/src/iris/encoder.py:12-325 as stateless
flax modules: learned positional embeddings, post-LN transformer blocks
(LN eps 1e-6, ReLU FFN), and a softplus conv duration head. Unlike the
reference — which never passes padding masks into attention
(train_encoder.py:227-230; SURVEY.md §7 step 5) — attention here is properly
masked, and padding masking is applied to the output so padded positions
cannot leak through the duration head.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from iris_tts_tpu.config import DurationConfig, EncoderConfig
from iris_tts_tpu.models.layers import Conv1d


class TransformerBlock(nn.Module):
    """Post-LN encoder block (reference: encoder.py:47-112): self-attention
    with residual + LN, then ReLU FFN with residual + LN."""

    embed_dim: int
    num_heads: int
    ffn_dim: int
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        attn_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            qkv_features=self.embed_dim,
            out_features=self.embed_dim,
            dropout_rate=self.dropout,
            dtype=self.dtype,
            name="attention",
        )(x, x, mask=attn_mask, deterministic=deterministic)
        attn = nn.Dropout(self.dropout, deterministic=deterministic)(attn)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="attn_norm")(
            x + attn
        )

        h = nn.Dense(self.ffn_dim, dtype=self.dtype, name="ffn_in")(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Dense(self.embed_dim, dtype=self.dtype, name="ffn_out")(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ffn_norm")(
            x + h
        )


class PhonemeEncoder(nn.Module):
    """Phoneme IDs → contextual representations [B, P, E]
    (reference: encoder.py:115-225)."""

    config: EncoderConfig = EncoderConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        phoneme_ids: jnp.ndarray,
        padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """
        Args:
            phoneme_ids: [B, P] int32.
            padding_mask: optional [B, P] bool/float, True (1) = valid.
            deterministic: disables dropout when True.
        """
        cfg = self.config
        seq_len = phoneme_ids.shape[1]

        x = nn.Embed(
            cfg.vocab_size, cfg.embed_dim, dtype=self.dtype,
            name="phoneme_embedding",
        )(phoneme_ids)
        positions = jnp.arange(seq_len)[None, :]
        x = x + nn.Embed(
            cfg.max_length, cfg.embed_dim, dtype=self.dtype,
            name="position_embedding",
        )(positions)
        x = nn.Dropout(cfg.dropout, deterministic=deterministic)(x)

        attn_mask = None
        if padding_mask is not None:
            valid = padding_mask.astype(bool)
            attn_mask = nn.make_attention_mask(valid, valid)

        for i in range(cfg.num_blocks):
            x = TransformerBlock(
                cfg.embed_dim,
                cfg.num_heads,
                cfg.ffn_hidden,
                cfg.dropout,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, attn_mask=attn_mask, deterministic=deterministic)

        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="output_norm")(x)
        if padding_mask is not None:
            x = x * padding_mask.astype(x.dtype)[..., None]
        return x


class DurationPredictor(nn.Module):
    """Encoder output → per-phoneme log-durations [B, P]
    (reference: encoder.py:228-325).

    Head composition matches the reference exactly: conv stack (ReLU + LN
    eps 1e-6 + dropout) → 1×1 conv → **softplus**; outputs are interpreted
    downstream as log(d+1) and inverted with ``exp(p) - 1``
    (SURVEY.md §2.5 duration convention).
    """

    config: DurationConfig = DurationConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, encoder_output: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        cfg = self.config
        x = encoder_output
        for i in range(cfg.num_layers):
            x = Conv1d(
                cfg.hidden_dim,
                cfg.kernel_size,
                dtype=self.dtype,
                name=f"conv_{i}",
            )(x)
            x = nn.relu(x)
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=f"norm_{i}")(x)
            x = nn.Dropout(cfg.dropout, deterministic=deterministic)(x)
        x = Conv1d(1, 1, dtype=self.dtype, name="output_proj")(x)
        return nn.softplus(x[..., 0])  # [B, P]
