"""AOT serving artifacts: the jitted synthesis function as StableHLO.

``jax.export`` serializes a lowered (bucket-shaped) synthesis executable —
parameters baked in as constants — so production serving needs no Python
model code at all: any PJRT-based runtime (C++ serving stack, another
process, a later jax version) deserializes the artifact and calls it with
phoneme IDs. The host text frontend stays host-side by design (it is
string processing); the exported vocab maps text → IDs at the edge.

Artifact layout (one directory):
    synth_b{B}_p{P}.shlo   exported fused synth fn per (batch, phoneme)
                           bucket: (ids [B,P] i32, lengths [B] i32,
                           seed [] i32) → (audio [B,S] f32, mel, n_frames)
    vocab.json             phoneme → id table for the host frontend
    manifest.json          shapes, sample rate, frame budget per bucket

New capability beyond the reference (which cannot even run its stub
pipeline, model.py:10-27).
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def export_pipeline(
    pipe,
    path: str | Path,
    batch_sizes: Sequence[int] = (1, 8),
    phoneme_buckets: Optional[Sequence[int]] = None,
    platforms: Optional[Sequence[str]] = None,
) -> Path:
    """Serialize the pipeline's fused synthesis path per (B, P) bucket.

    Args:
        pipe: a ready TTSPipeline (params are baked into the artifacts).
        batch_sizes / phoneme_buckets: the shape grid to export (each pair
            becomes one self-contained executable; the frame budget is the
            pipeline's fused estimate for the FULL bucket — ≥ the live
            path's length-based estimate. Because jax's counter-based PRNG
            makes prefix noise shape-stable, trimmed outputs still match
            the live path exactly whenever the predicted frames fit the
            live budget; when they don't, the live path compresses
            durations earlier and the artifact — with more headroom —
            simply truncates less).
        platforms: lowering platforms (default: current backend). Pass
            ``["tpu"]`` on a CPU host to cross-lower for TPU serving.
    Returns:
        the artifact directory.
    """
    from jax import export as jax_export

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    phoneme_buckets = tuple(phoneme_buckets or pipe.phoneme_buckets)

    manifest: Dict = {
        "sample_rate": pipe.config.audio.sample_rate,
        "samples_per_frame": pipe.config.hifigan.total_upsample,
        "entries": [],
    }
    for b in batch_sizes:
        for p_bucket in phoneme_buckets:
            t_bucket = pipe._fused_frame_budget(
                np.full((b,), p_bucket, np.int32)
            )

            def fn(ids, lengths, seed, _t=t_bucket):
                return pipe._fused_fn(
                    pipe.params, ids, lengths, seed, total_frames=_t,
                    use_postnet=pipe.use_postnet, upsample=pipe.upsample,
                    mrf_impl=pipe.mrf_impl,
                )

            args = (
                jax.ShapeDtypeStruct((b, p_bucket), jnp.int32),
                jax.ShapeDtypeStruct((b,), jnp.int32),
                jax.ShapeDtypeStruct((), jnp.int32),
            )
            exp = jax_export.export(
                jax.jit(fn),
                platforms=list(platforms) if platforms else None,
            )(*args)
            name = f"synth_b{b}_p{p_bucket}.shlo"
            (path / name).write_bytes(exp.serialize())
            manifest["entries"].append({
                "file": name,
                "batch": b,
                "phoneme_bucket": p_bucket,
                "frame_bucket": int(t_bucket),
                "platforms": list(exp.platforms),
            })
            logger.info("exported %s (T=%d, platforms=%s)",
                        name, t_bucket, exp.platforms)

    pipe.vocab.save(path / "vocab.json")
    (path / "manifest.json").write_text(json.dumps(manifest, indent=2))
    return path


class ExportedSynthesizer:
    """Host-side driver for an exported artifact directory.

    Pairs the serialized executables with the text frontend: picks the
    smallest exported (B, P) bucket that fits, pads, calls, trims. This is
    the same bucketing contract as TTSPipeline.synthesize, reconstructed
    purely from the artifact — no model code, no params files.
    """

    def __init__(self, path: str | Path, text_processor=None):
        from jax import export as jax_export

        from iris_tts_tpu.text.frontend import create_text_processor
        from iris_tts_tpu.text.phonemes import PhonemeVocab

        path = Path(path)
        self.manifest = json.loads((path / "manifest.json").read_text())
        self.vocab = PhonemeVocab.load(path / "vocab.json")
        self.text_processor = text_processor or create_text_processor()
        self._fns: Dict[Tuple[int, int], Tuple] = {}
        for e in self.manifest["entries"]:
            exp = jax_export.deserialize(
                (path / e["file"]).read_bytes()
            )
            self._fns[(e["batch"], e["phoneme_bucket"])] = (exp, e)

    def synthesize(self, text: str, seed: int = 0) -> np.ndarray:
        ids = self.text_processor.text_to_ids(text, self.vocab)
        n = len(ids)
        candidates = sorted(
            (p, b) for (b, p) in self._fns if p >= n and b >= 1
        )
        if not candidates:
            raise ValueError(
                f"{n} phonemes exceeds every exported bucket "
                f"{sorted(set(p for _, p in self._fns))}"
            )
        p_bucket = candidates[0][0]
        b = min(bb for (bb, pp) in self._fns if pp == p_bucket)
        exp, entry = self._fns[(b, p_bucket)]
        ids_arr = np.zeros((b, p_bucket), np.int32)
        ids_arr[0, :n] = ids
        lengths = np.zeros((b,), np.int32)
        lengths[0] = n
        audio, _mel, n_frames = exp.call(
            jnp.asarray(ids_arr), jnp.asarray(lengths),
            jnp.asarray(seed, jnp.int32),
        )
        hop = self.manifest["samples_per_frame"]
        n_f = int(np.asarray(n_frames)[0])
        return np.asarray(audio, np.float32)[0, : n_f * hop]
