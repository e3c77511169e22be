"""Lazy-loading neural G2P for out-of-lexicon words.

The reference's OOV fallback is the neural g2p_en package
(/root/reference/src/iris/text.py:186-190). This is its replacement: a
transformer trained on the shipped CMUdict by ``scripts/train_g2p.py``
(:mod:`iris_tts_tpu.models.g2p`), stored as an fp16 npz inside the package.

Host-side by design — G2P runs on words, not audio tensors — so the decode
prefers the CPU backend when one is registered (a tunneled-TPU dispatch
costs a fixed ~27 ms round trip that a 3M-param model never earns back). Everything is lazy: importing this module, or constructing
:class:`NeuralG2P`, loads nothing; the first out-of-lexicon word pays the
one-time checkpoint load + jit, and per-word results are memoized.
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

# Batch buckets for the decode jit (words per dispatch). Word lookups arrive
# one or a few at a time; the ladder keeps the compile-cache small.
_BATCH_BUCKETS = (1, 4, 16, 64)


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


class NeuralG2P:
    """Word → ARPABET phonemes via the shipped transformer checkpoint.

    ``NeuralG2P()(word)`` returns a phone list, or ``[]`` when the model is
    unavailable (no checkpoint / load failure) or produces nothing — the
    caller falls back to the rule engine either way, so this class can never
    make the frontend worse than rules-only.
    """

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
                import jax

                from iris_tts_tpu.models.g2p import (
                    G2PTransformer, N_SPECIAL, greedy_decode,
                )
                from iris_tts_tpu.text.lexicon import ARPABET

                params, cfg, meta = load_g2p(self.checkpoint)
                model = G2PTransformer(cfg)
                try:
                    device = jax.local_devices(backend="cpu")[0]
                except Exception:  # no cpu backend registered — use default
                    device = None

                def decode_fn(p, c):
                    return greedy_decode(model, p, c)

                # jit follows its committed inputs' device: putting params
                # (and, below, each input batch) on CPU pins the decode there.
                self._decode = jax.jit(decode_fn)
                self._device = device
                self._params = (
                    jax.device_put(params, device) if device else params
                )
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
        bucket = next(
            (b for b in _BATCH_BUCKETS if b >= len(todo)), _BATCH_BUCKETS[-1]
        )
        for start in range(0, len(todo), bucket):
            chunk = todo[start : start + bucket]
            arr = np.zeros((bucket, self._cfg.max_word_len), np.int32)
            for row, (_, _, cid) in enumerate(chunk):
                arr[row] = cid
            if self._device is not None:
                import jax

                arr = jax.device_put(arr, self._device)
            toks = np.asarray(self._decode(self._params, arr))
            for row, (i, w, _) in enumerate(chunk):
                phones = []
                for t in toks[row, 1:]:
                    if t == PHONE_EOS or t < N_SPECIAL:
                        break
                    phones.append(self._id_to_phone[int(t)])
                self._cache[w] = phones
                out[i] = list(phones)
        return out

    def __call__(self, word: str) -> List[str]:
        return self.predict_batch([word])[0]
