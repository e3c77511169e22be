"""Neural grapheme-to-phoneme model (transformer encoder-decoder).

The reference falls back to the *neural* g2p_en package for out-of-lexicon
words (/root/reference/src/iris/text.py:186-190). The rule engine in
:mod:`iris_tts_tpu.text.g2p` replaces it dependency-free at PER ~0.23; this
module restores neural-grade quality: a small seq2seq transformer trained on
the shipped CMUdict by ``scripts/train_g2p.py`` (dogfooding this framework's
own training loop on TPU) and shipped as a checkpoint the frontend loads
lazily for true OOV words only.

TPU-native design notes:
- the whole training epoch runs as ONE ``lax.scan`` over steps with the
  dataset resident on device (one dispatch per epoch — the per-dispatch
  tunnel round trip never multiplies across the ~260 steps/epoch);
- greedy decoding is a ``lax.scan`` over output positions with a static
  token buffer (no dynamic shapes, jit-compiled once per batch bucket).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from iris_tts_tpu.models.encoder import TransformerBlock

# Character inventory: PAD + a-z + apostrophe (CMUdict headwords).
G2P_CHARS = "abcdefghijklmnopqrstuvwxyz'"
CHAR_PAD = 0
CHAR_VOCAB = 1 + len(G2P_CHARS)  # 28
_CHAR_TO_ID = {c: i + 1 for i, c in enumerate(G2P_CHARS)}

# Phone inventory: PAD/BOS/EOS + the 39 stress-stripped ARPABET symbols
# (iris_tts_tpu.text.lexicon.ARPABET order is the contract).
PHONE_PAD, PHONE_BOS, PHONE_EOS = 0, 1, 2
N_SPECIAL = 3


def encode_word(word: str, max_len: int) -> Optional[list]:
    """Word → padded char-ID list, or None if it doesn't fit/clean."""
    ids = [_CHAR_TO_ID.get(c) for c in word]
    if not ids or any(i is None for i in ids) or len(ids) > max_len:
        return None
    return ids + [CHAR_PAD] * (max_len - len(ids))


@dataclass(frozen=True)
class G2PConfig:
    """Self-contained config (persisted inside the checkpoint manifest)."""

    char_vocab: int = CHAR_VOCAB
    phone_vocab: int = N_SPECIAL + 39
    embed_dim: int = 192
    num_heads: int = 4
    enc_blocks: int = 3
    dec_blocks: int = 3
    ffn_mult: int = 4
    dropout: float = 0.1
    max_word_len: int = 32   # characters
    max_phone_len: int = 36  # phonemes incl. BOS/EOS


class DecoderBlock(nn.Module):
    """Post-LN decoder block: causal self-attention, cross-attention over
    the character encoding, ReLU FFN — mirrors the encoder-side
    :class:`TransformerBlock` conventions (LN eps 1e-6)."""

    embed_dim: int
    num_heads: int
    ffn_dim: int
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        y: jnp.ndarray,
        enc: jnp.ndarray,
        self_mask: jnp.ndarray,
        cross_mask: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            qkv_features=self.embed_dim,
            out_features=self.embed_dim,
            dropout_rate=self.dropout,
            dtype=self.dtype,
            name="self_attention",
        )(y, y, mask=self_mask, deterministic=deterministic)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="self_norm")(
            y + nn.Dropout(self.dropout, deterministic=deterministic)(attn)
        )

        cross = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            qkv_features=self.embed_dim,
            out_features=self.embed_dim,
            dropout_rate=self.dropout,
            dtype=self.dtype,
            name="cross_attention",
        )(y, enc, mask=cross_mask, deterministic=deterministic)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="cross_norm")(
            y + nn.Dropout(self.dropout, deterministic=deterministic)(cross)
        )

        h = nn.Dense(self.ffn_dim, dtype=self.dtype, name="ffn_in")(y)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Dense(self.embed_dim, dtype=self.dtype, name="ffn_out")(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ffn_norm")(
            y + h
        )


class G2PTransformer(nn.Module):
    """Characters → phoneme logits (teacher-forced decoder).

    ``__call__(char_ids [B,W], phone_in [B,T])`` returns logits [B,T,V].
    Padding is inferred from PAD ids; the decoder self-attention is causal.
    """

    config: G2PConfig = G2PConfig()
    dtype: Any = jnp.float32

    def setup(self) -> None:
        cfg = self.config
        ffn = cfg.ffn_mult * cfg.embed_dim
        self.char_embed = nn.Embed(
            cfg.char_vocab, cfg.embed_dim, dtype=self.dtype,
            name="char_embedding",
        )
        self.char_pos = nn.Embed(
            cfg.max_word_len, cfg.embed_dim, dtype=self.dtype,
            name="char_position",
        )
        self.phone_embed = nn.Embed(
            cfg.phone_vocab, cfg.embed_dim, dtype=self.dtype,
            name="phone_embedding",
        )
        self.phone_pos = nn.Embed(
            cfg.max_phone_len, cfg.embed_dim, dtype=self.dtype,
            name="phone_position",
        )
        self.enc_blocks_ = [
            TransformerBlock(
                cfg.embed_dim, cfg.num_heads, ffn, cfg.dropout,
                dtype=self.dtype, name=f"enc_{i}",
            )
            for i in range(cfg.enc_blocks)
        ]
        self.dec_blocks_ = [
            DecoderBlock(
                cfg.embed_dim, cfg.num_heads, ffn, cfg.dropout,
                dtype=self.dtype, name=f"dec_{i}",
            )
            for i in range(cfg.dec_blocks)
        ]
        self.enc_norm = nn.LayerNorm(
            epsilon=1e-6, dtype=self.dtype, name="enc_norm"
        )
        self.out_proj = nn.Dense(
            cfg.phone_vocab, dtype=self.dtype, name="out_proj"
        )

    def encode(
        self, char_ids: jnp.ndarray, deterministic: bool = True
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """[B, W] int32 → (encoding [B, W, E], char validity [B, W])."""
        valid = char_ids != CHAR_PAD
        w = char_ids.shape[1]
        x = self.char_embed(char_ids) + self.char_pos(
            jnp.arange(w)[None, :]
        )
        attn_mask = nn.make_attention_mask(valid, valid)
        for blk in self.enc_blocks_:
            x = blk(x, attn_mask=attn_mask, deterministic=deterministic)
        x = self.enc_norm(x)
        return x * valid[..., None].astype(x.dtype), valid

    def decode(
        self,
        phone_in: jnp.ndarray,
        enc: jnp.ndarray,
        char_valid: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Teacher-forced decode: [B, T] tokens → [B, T, V] logits."""
        t = phone_in.shape[1]
        y = self.phone_embed(phone_in) + self.phone_pos(
            jnp.arange(t)[None, :]
        )
        # Causal mask only: PAD positions attend causally too, but their
        # logits are masked out of the loss and never read by the greedy
        # decoder (it only consumes position t at step t).
        self_mask = nn.make_causal_mask(phone_in)
        cross_mask = nn.make_attention_mask(
            jnp.ones_like(phone_in, dtype=bool), char_valid
        )
        for blk in self.dec_blocks_:
            y = blk(
                y, enc, self_mask, cross_mask, deterministic=deterministic
            )
        return self.out_proj(y)

    def __call__(
        self,
        char_ids: jnp.ndarray,
        phone_in: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        enc, valid = self.encode(char_ids, deterministic=deterministic)
        return self.decode(
            phone_in, enc, valid, deterministic=deterministic
        )


def greedy_decode(
    model: G2PTransformer, params, char_ids: jnp.ndarray
) -> jnp.ndarray:
    """Batched greedy decoding with a static token buffer.

    Returns [B, max_phone_len] int32: BOS, predicted phones, EOS, then PAD.
    A ``lax.scan`` over output positions re-runs the (tiny) decoder on the
    whole buffer each step — O(T²) attention over T≤36 positions is
    negligible and keeps every shape static for XLA.
    """
    cfg = model.config
    b = char_ids.shape[0]
    t_max = cfg.max_phone_len

    enc, valid = model.apply(
        params, char_ids, deterministic=True, method=G2PTransformer.encode
    )

    tokens0 = jnp.full((b, t_max), PHONE_PAD, jnp.int32)
    tokens0 = tokens0.at[:, 0].set(PHONE_BOS)
    done0 = jnp.zeros((b,), bool)

    def step(carry, t):
        tokens, done = carry
        logits = model.apply(
            params, tokens, enc, valid, deterministic=True,
            method=G2PTransformer.decode,
        )
        nxt = jnp.argmax(logits[:, t], axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, PHONE_PAD, nxt)
        tokens = jax.lax.dynamic_update_slice(
            tokens, nxt[:, None], (0, t + 1)
        )
        done = done | (nxt == PHONE_EOS)
        return (tokens, done), None

    (tokens, _), _ = jax.lax.scan(
        step, (tokens0, done0), jnp.arange(t_max - 1)
    )
    return tokens
