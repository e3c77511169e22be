"""Lazy-loading neural G2P for out-of-lexicon words.

The reference's OOV fallback is the neural g2p_en package
(/root/reference/src/iris/text.py:186-190). This is its replacement: a
transformer trained on the shipped CMUdict by ``scripts/train_g2p.py``
(:mod:`iris_tts_tpu.models.g2p`), stored as an fp16 npz inside the package.

Host-side by design — G2P runs on words, not audio tensors — so inference
is a pure-NumPy forward pass (:class:`_NumpyG2P`): no jit, no device
dispatch, no compile cost at request time. Everything is lazy: importing
this module, or constructing :class:`NeuralG2P`, loads nothing; the first
out-of-lexicon word pays the one-time checkpoint load, and per-word results
are memoized. The jax :class:`~iris_tts_tpu.models.g2p.G2PTransformer` is
the training/eval side of the same checkpoint.
"""

from __future__ import annotations

import json
import logging
import os
import threading
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)

DEFAULT_CHECKPOINT = (
    Path(__file__).resolve().parent / "data" / "g2p_transformer.npz"
)

def save_g2p(path: str | Path, params, cfg, meta: Optional[dict] = None):
    """Serialize params (fp16) + config + metadata into one npz."""
    import jax.numpy as jnp
    from flax import traverse_util

    flat = traverse_util.flatten_dict(params, sep="/")
    arrays = {
        k: np.asarray(v, np.float16)
        if jnp.issubdtype(v.dtype, jnp.floating) else np.asarray(v)
        for k, v in flat.items()
    }
    manifest = {"config": vars(cfg) if not hasattr(cfg, "__dataclass_fields__")
                else {f: getattr(cfg, f) for f in cfg.__dataclass_fields__},
                "meta": meta or {}}
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(
        path, __manifest__=json.dumps(manifest), **arrays
    )


def load_g2p(path: str | Path):
    """Inverse of :func:`save_g2p` → (params fp32, G2PConfig, meta)."""
    import jax.numpy as jnp
    from flax import traverse_util

    from iris_tts_tpu.models.g2p import G2PConfig

    with np.load(path, allow_pickle=False) as z:
        manifest = json.loads(str(z["__manifest__"]))
        flat = {
            k: jnp.asarray(
                z[k],
                jnp.float32 if z[k].dtype == np.float16 else z[k].dtype,
            )
            for k in z.files if k != "__manifest__"
        }
    params = traverse_util.unflatten_dict(flat, sep="/")
    return params, G2PConfig(**manifest["config"]), manifest.get("meta", {})


class _NumpyG2P:
    """Pure-NumPy forward pass over the checkpoint's flat param dict.

    The serving environment pins ``JAX_PLATFORMS`` to the hardware plugin
    (no CPU backend), so a jax decode would ride the TPU tunnel: ~27 ms
    round trip per OOV batch plus a request-time jit compile per batch
    bucket. A 3M-param seq2seq needs none of that — host NumPy decodes a
    word in single-digit ms, keeps the text frontend fully host-side, and
    leaves the device to the synthesis executables. Mirrors
    :class:`iris_tts_tpu.models.g2p.G2PTransformer` exactly (flax
    MultiHeadDotProductAttention conventions; parity pinned by
    ``tests/test_neural_g2p.py::test_numpy_decode_matches_jax``).
    """

    def __init__(self, flat: Dict[str, np.ndarray], cfg):
        self.p = flat
        self.cfg = cfg
        self.head_dim = cfg.embed_dim // cfg.num_heads

    @staticmethod
    def _ln(x, scale, bias, eps=1e-6):
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) / np.sqrt(var + eps) * scale + bias

    def _dense(self, x, prefix):
        return x @ self.p[f"{prefix}/kernel"] + self.p[f"{prefix}/bias"]

    def _mha(self, q_in, kv_in, prefix, mask):
        """Flax MultiHeadDotProductAttention: kernels [E,H,D], out [H,D,E];
        mask [B,Tq,Tk] boolean (True = attend)."""
        p = self.p

        def proj(x, name):
            return (
                np.einsum("bte,ehd->bthd", x, p[f"{prefix}/{name}/kernel"])
                + p[f"{prefix}/{name}/bias"]
            )

        q = proj(q_in, "query") / np.sqrt(self.head_dim).astype(np.float32)
        k = proj(kv_in, "key")
        v = proj(kv_in, "value")
        logits = np.einsum("bqhd,bkhd->bhqk", q, k)
        logits = np.where(mask[:, None, :, :], logits, np.float32(-1e10))
        w = np.exp(logits - logits.max(-1, keepdims=True))
        w = w / w.sum(-1, keepdims=True)
        out = np.einsum("bhqk,bkhd->bqhd", w, v)
        return (
            np.einsum("bqhd,hde->bqe", out, p[f"{prefix}/out/kernel"])
            + p[f"{prefix}/out/bias"]
        )

    def _ffn(self, x, prefix):
        h = np.maximum(self._dense(x, f"{prefix}/ffn_in"), 0.0)
        return self._dense(h, f"{prefix}/ffn_out")

    def _block_ln(self, x, prefix):
        return self._ln(
            x, self.p[f"{prefix}/scale"], self.p[f"{prefix}/bias"]
        )

    def encode(self, char_ids: np.ndarray):
        p, cfg = self.p, self.cfg
        valid = char_ids != 0
        x = (
            p["params/char_embedding/embedding"][char_ids]
            + p["params/char_position/embedding"][None, : char_ids.shape[1]]
        )
        mask = valid[:, :, None] & valid[:, None, :]
        for i in range(cfg.enc_blocks):
            pre = f"params/enc_{i}"
            x = self._block_ln(
                x + self._mha(x, x, f"{pre}/attention", mask),
                f"{pre}/attn_norm",
            )
            x = self._block_ln(x + self._ffn(x, pre), f"{pre}/ffn_norm")
        x = self._block_ln(x, "params/enc_norm")
        return x * valid[..., None], valid

    def decode_step(self, tokens: np.ndarray, enc, char_valid):
        """Teacher-forced logits for the full buffer (numpy mirror of
        G2PTransformer.decode)."""
        p, cfg = self.p, self.cfg
        t = tokens.shape[1]
        y = (
            p["params/phone_embedding/embedding"][tokens]
            + p["params/phone_position/embedding"][None, :t]
        )
        causal = np.tril(np.ones((t, t), bool))[None]
        causal = np.broadcast_to(causal, (tokens.shape[0], t, t))
        cross = np.broadcast_to(
            char_valid[:, None, :],
            (tokens.shape[0], t, char_valid.shape[1]),
        )
        for i in range(cfg.dec_blocks):
            pre = f"params/dec_{i}"
            y = self._block_ln(
                y + self._mha(y, y, f"{pre}/self_attention", causal),
                f"{pre}/self_norm",
            )
            y = self._block_ln(
                y + self._mha(y, enc, f"{pre}/cross_attention", cross),
                f"{pre}/cross_norm",
            )
            y = self._block_ln(y + self._ffn(y, pre), f"{pre}/ffn_norm")
        return self._dense(y, "params/out_proj")

    def _proj_heads(self, x, prefix):
        """[B, E] (or [B, T, E]) → per-head projection via [E,H,D] kernel."""
        p = self.p
        return (
            np.einsum("...e,ehd->...hd", x, p[f"{prefix}/kernel"])
            + p[f"{prefix}/bias"]
        )

    def greedy_decode(self, char_ids: np.ndarray) -> np.ndarray:
        """[B, W] int → [B, max_phone_len] tokens (BOS, phones, EOS, PAD).

        Incremental K/V-cache decode: each step projects only the NEW
        position (post-LN causality guarantees earlier positions' activations
        never change — pinned by test_model_shapes_and_masking), so the whole
        word costs O(T) small matmuls instead of O(T²) full-buffer passes.
        Early-exits once every row has emitted EOS."""
        p, cfg = self.p, self.cfg
        b = char_ids.shape[0]
        t_max = cfg.max_phone_len
        enc, valid = self.encode(char_ids)
        scale = np.sqrt(self.head_dim).astype(np.float32)

        # Cross-attention K/V depend only on the encoder output.
        cross_kv = [
            (
                self._proj_heads(enc, f"params/dec_{i}/cross_attention/key"),
                self._proj_heads(enc, f"params/dec_{i}/cross_attention/value"),
            )
            for i in range(cfg.dec_blocks)
        ]
        neg = np.float32(-1e10)
        self_k = [
            np.zeros((b, t_max, cfg.num_heads, self.head_dim), np.float32)
            for _ in range(cfg.dec_blocks)
        ]
        self_v = [np.zeros_like(k) for k in self_k]

        tokens = np.zeros((b, t_max), np.int64)
        tokens[:, 0] = 1  # PHONE_BOS
        done = np.zeros((b,), bool)
        for t in range(t_max - 1):
            y = (
                p["params/phone_embedding/embedding"][tokens[:, t]]
                + p["params/phone_position/embedding"][t]
            )  # [B, E]
            for i in range(cfg.dec_blocks):
                pre = f"params/dec_{i}"
                # Causal self-attention over cached positions 0..t.
                self_k[i][:, t] = self._proj_heads(
                    y, f"{pre}/self_attention/key"
                )
                self_v[i][:, t] = self._proj_heads(
                    y, f"{pre}/self_attention/value"
                )
                q = self._proj_heads(y, f"{pre}/self_attention/query") / scale
                att = np.einsum("bhd,bkhd->bhk", q, self_k[i][:, : t + 1])
                att = att - att.max(-1, keepdims=True)
                w = np.exp(att)
                w /= w.sum(-1, keepdims=True)
                o = np.einsum("bhk,bkhd->bhd", w, self_v[i][:, : t + 1])
                o = (
                    np.einsum(
                        "bhd,hde->be", o,
                        p[f"{pre}/self_attention/out/kernel"],
                    )
                    + p[f"{pre}/self_attention/out/bias"]
                )
                y = self._ln(
                    y + o, p[f"{pre}/self_norm/scale"],
                    p[f"{pre}/self_norm/bias"],
                )
                # Cross-attention over the (fixed) character encoding.
                ck, cv = cross_kv[i]
                q = (
                    self._proj_heads(y, f"{pre}/cross_attention/query")
                    / scale
                )
                att = np.einsum("bhd,bkhd->bhk", q, ck)
                att = np.where(valid[:, None, :], att, neg)
                att = att - att.max(-1, keepdims=True)
                w = np.exp(att)
                w /= w.sum(-1, keepdims=True)
                o = np.einsum("bhk,bkhd->bhd", w, cv)
                o = (
                    np.einsum(
                        "bhd,hde->be", o,
                        p[f"{pre}/cross_attention/out/kernel"],
                    )
                    + p[f"{pre}/cross_attention/out/bias"]
                )
                y = self._ln(
                    y + o, p[f"{pre}/cross_norm/scale"],
                    p[f"{pre}/cross_norm/bias"],
                )
                h = np.maximum(self._dense(y, f"{pre}/ffn_in"), 0.0)
                y = self._ln(
                    y + self._dense(h, f"{pre}/ffn_out"),
                    p[f"{pre}/ffn_norm/scale"], p[f"{pre}/ffn_norm/bias"],
                )
            nxt = self._dense(y, "params/out_proj").argmax(-1)
            nxt = np.where(done, 0, nxt)
            tokens[:, t + 1] = nxt
            done |= nxt == 2  # PHONE_EOS
            if done.all():
                break
        return tokens


class NeuralG2P:
    """Word → ARPABET phonemes via the shipped transformer checkpoint.

    ``NeuralG2P()(word)`` returns a phone list, or ``[]`` when the model is
    unavailable (no checkpoint / load failure) or produces nothing — the
    caller falls back to the rule engine either way, so this class can never
    make the frontend worse than rules-only.
    """

    # Bounded memo (FIFO): the serving path feeds every OOV token from
    # request traffic through here, so a hostile stream of distinct words
    # must not grow memory unboundedly (same cap policy as
    # TTSPipeline._ids_cache).
    _CACHE_MAX = 4096

    def __init__(self, checkpoint: str | Path = DEFAULT_CHECKPOINT):
        self.checkpoint = Path(checkpoint)
        self._lock = threading.Lock()
        self._loaded = False
        self._failed = False
        self._cache: Dict[str, List[str]] = {}

    @staticmethod
    def available(checkpoint: str | Path = DEFAULT_CHECKPOINT) -> bool:
        return (
            os.environ.get("IRIS_NEURAL_G2P", "1") != "0"
            and Path(checkpoint).exists()
        )

    # -- lazy init -----------------------------------------------------------

    def _load(self) -> bool:
        if self._loaded:
            return True
        if self._failed:
            return False
        with self._lock:
            if self._loaded or self._failed:
                return self._loaded
            try:
                from iris_tts_tpu.models.g2p import G2PConfig, N_SPECIAL
                from iris_tts_tpu.text.lexicon import ARPABET

                # Host-only load: flat numpy fp32 params, no jax involved —
                # see :class:`_NumpyG2P` for why the decode stays off device.
                with np.load(self.checkpoint, allow_pickle=False) as z:
                    manifest = json.loads(str(z["__manifest__"]))
                    flat = {
                        k: np.asarray(z[k], np.float32)
                        if z[k].dtype == np.float16 else z[k]
                        for k in z.files if k != "__manifest__"
                    }
                cfg = G2PConfig(**manifest["config"])
                meta = manifest.get("meta", {})
                self._net = _NumpyG2P(flat, cfg)
                self._cfg = cfg
                self._id_to_phone = {
                    i + N_SPECIAL: p for i, p in enumerate(ARPABET)
                }
                self._loaded = True
                logger.info(
                    "neural G2P loaded (%s, val PER %s)", self.checkpoint,
                    meta.get("val_per", "?"),
                )
            except Exception as e:  # noqa: BLE001 — frontend must survive
                logger.warning("neural G2P unavailable (%s); falling back "
                               "to rule G2P", e)
                self._failed = True
        return self._loaded

    # -- inference -----------------------------------------------------------

    def predict_batch(self, words: Sequence[str]) -> List[List[str]]:
        """Batched decode; unknown-character or over-long words → []."""
        from iris_tts_tpu.models.g2p import (
            N_SPECIAL, PHONE_EOS, encode_word,
        )

        out: List[List[str]] = [[] for _ in words]
        if not words or not self._load():
            return out
        todo = []  # (position, char-ids)
        for i, w in enumerate(words):
            w = w.lower()
            if w in self._cache:
                out[i] = list(self._cache[w])
                continue
            cid = encode_word(w, self._cfg.max_word_len)
            if cid is not None:
                todo.append((i, w, cid))
        if not todo:
            return out
        arr = np.asarray([cid for (_, _, cid) in todo], np.int32)
        toks = self._net.greedy_decode(arr)
        for row, (i, w, _) in enumerate(todo):
            phones = []
            for t in toks[row, 1:]:
                if t == PHONE_EOS or t < N_SPECIAL:
                    break
                phones.append(self._id_to_phone[int(t)])
            if len(self._cache) >= self._CACHE_MAX:
                self._cache.pop(next(iter(self._cache)))
            self._cache[w] = phones
            out[i] = list(phones)
        return out

    def __call__(self, word: str) -> List[str]:
        return self.predict_batch([word])[0]
