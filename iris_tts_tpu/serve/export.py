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
                           seed [] i32, temperature [] f32) →
                           (audio [B,S] f32, mel, n_frames,
                           overflow_deficit [B] i32)
    vocab.json             phoneme → id table for the host frontend
    manifest.json          shapes, sample rate, frame budget per bucket

:class:`AotPipeline` drives these artifacts behind the SAME serving stack
(DynamicBatcher/TTSServer) as a live pipeline — production serving without
compiling any Python model code, killing the cold-start problem.

New capability beyond the reference (which cannot even run its stub
pipeline, model.py:10-27).
"""

from __future__ import annotations

import json
import logging
import threading
from pathlib import Path
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

# Executable calling convention version. Bump whenever the exported fn's
# inputs/outputs change; loaders refuse mismatched artifacts with a clear
# re-export message instead of an opaque arity error at dispatch time.
# v2: inputs (ids, lengths, seed, temperature), outputs (audio, mel,
#     n_frames, deficit).
AOT_FORMAT_VERSION = 2


def _check_format_version(manifest: Dict, path: Path) -> None:
    got = manifest.get("format_version", 1)
    if got != AOT_FORMAT_VERSION:
        raise ValueError(
            f"AOT artifact {path} has format_version={got}, this runtime "
            f"expects {AOT_FORMAT_VERSION} — re-export with "
            "scripts/export_serving.py"
        )


def export_pipeline(
    pipe,
    path: str | Path,
    batch_sizes: Sequence[int] = (1, 8),
    phoneme_buckets: Optional[Sequence[int]] = None,
    platforms: Optional[Sequence[str]] = None,
    vocode_chunk_frames: Optional[int] = None,
    vocode_context_frames: Optional[int] = None,
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
        vocode_chunk_frames: also export ONE streaming-vocoder window
            executable (TTSPipeline.vocode_streaming's device stage) so the
            artifact can turn arbitrarily long mels into audio in O(chunk)
            memory with no Python model code
            (:meth:`AotPipeline.vocode_streaming`). ``vocode_context_frames``
            defaults to the generator's receptive-field radius.
    Returns:
        the artifact directory.
    """
    from jax import export as jax_export

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    phoneme_buckets = tuple(phoneme_buckets or pipe.phoneme_buckets)

    manifest: Dict = {
        "format_version": AOT_FORMAT_VERSION,
        "sample_rate": pipe.config.audio.sample_rate,
        "samples_per_frame": pipe.config.hifigan.total_upsample,
        "n_mels": pipe.config.hifigan.in_channels,
        "entries": [],
    }
    for b in batch_sizes:
        for p_bucket in phoneme_buckets:
            t_bucket = pipe._fused_frame_budget(
                np.full((b,), p_bucket, np.int32)
            )

            def fn(ids, lengths, seed, temperature, _t=t_bucket):
                return pipe._fused_fn(
                    pipe.params, ids, lengths, seed, total_frames=_t,
                    temperature=temperature,
                    use_postnet=pipe.use_postnet, upsample=pipe.upsample,
                )

            args = (
                jax.ShapeDtypeStruct((b, p_bucket), jnp.int32),
                jax.ShapeDtypeStruct((b,), jnp.int32),
                jax.ShapeDtypeStruct((), jnp.int32),
                jax.ShapeDtypeStruct((), jnp.float32),
            )
            exp = jax_export.export(
                jax.jit(fn),
                platforms=list(platforms) if platforms else None,
            )(*args)
            name = f"synth_b{b}_p{p_bucket}.shlo"
            (path / name).write_bytes(exp.serialize())
            # Raw StableHLO bytecode beside the jax.export envelope: what a
            # bare PJRT host (native/pjrt_runner.cpp) feeds straight to
            # PJRT_Client_Compile (format "mlir") — serving with no Python
            # at all.
            raw = name.replace(".shlo", ".mlir.bc")
            (path / raw).write_bytes(exp.mlir_module_serialized)
            manifest["entries"].append({
                "file": name,
                "mlir_file": raw,
                "batch": b,
                "phoneme_bucket": p_bucket,
                "frame_bucket": int(t_bucket),
                "platforms": list(exp.platforms),
            })
            logger.info("exported %s (T=%d, platforms=%s)",
                        name, t_bucket, exp.platforms)

    if vocode_chunk_frames:
        from iris_tts_tpu.models.hifigan import receptive_radius_frames

        ctx = (
            vocode_context_frames
            if vocode_context_frames is not None
            else receptive_radius_frames(pipe.config.hifigan)
        )
        window = int(vocode_chunk_frames) + 2 * int(ctx)
        up = pipe.config.hifigan.total_upsample
        chunk_samples = int(vocode_chunk_frames) * up

        def vfn(mel, start):
            return pipe._vocode_window_fn(
                pipe.params, mel, start,
                chunk_samples=chunk_samples,
            )

        vexp = jax_export.export(
            jax.jit(vfn),
            platforms=list(platforms) if platforms else None,
        )(
            jax.ShapeDtypeStruct(
                (1, window, pipe.config.hifigan.in_channels), jnp.float32
            ),
            jax.ShapeDtypeStruct((), jnp.int32),
        )
        vname = f"vocwin_c{int(vocode_chunk_frames)}_x{int(ctx)}.shlo"
        (path / vname).write_bytes(vexp.serialize())
        vraw = vname.replace(".shlo", ".mlir.bc")
        (path / vraw).write_bytes(vexp.mlir_module_serialized)
        manifest["vocode_window"] = {
            "file": vname,
            "mlir_file": vraw,
            "chunk_frames": int(vocode_chunk_frames),
            "context_frames": int(ctx),
            "window_frames": window,
            "platforms": list(vexp.platforms),
        }
        logger.info("exported %s (window=%d frames)", vname, window)

    # Default XLA compile options for the bare-PJRT host (1 replica / 1
    # partition — the artifact executables are single-device programs).
    try:
        from jaxlib import xla_client

        (path / "compile_options.pb").write_bytes(
            xla_client.CompileOptions().SerializeAsString()
        )
        manifest["compile_options"] = "compile_options.pb"
    except Exception as e:  # noqa: BLE001 — python serving works without it
        logger.warning("compile-options proto not written: %s", e)

    pipe.vocab.save(path / "vocab.json")
    (path / "manifest.json").write_text(json.dumps(manifest, indent=2))
    return path


def _load_artifact(path, text_processor=None, defer_frontend=False):
    """Shared artifact loader for the two drivers: manifest (format
    checked), vocab, text processor, and deserialized per-(B, P)-bucket
    executables. One copy so the format contract cannot drift between
    ExportedSynthesizer and AotPipeline.

    ``defer_frontend=True`` returns ``tp=None`` so the caller can overlap
    the (seconds-long) frontend construction with the first backend
    compile — the AotPipeline ``warmup_async`` cold-start path."""
    from jax import export as jax_export

    from iris_tts_tpu.text.frontend import create_text_processor
    from iris_tts_tpu.text.phonemes import PhonemeVocab

    path = Path(path)
    manifest = json.loads((path / "manifest.json").read_text())
    _check_format_version(manifest, path)
    vocab = PhonemeVocab.load(path / "vocab.json")
    tp = (
        None if (defer_frontend and text_processor is None)
        else text_processor or create_text_processor()
    )
    fns = {}
    for e in manifest["entries"]:
        exp = jax_export.deserialize((path / e["file"]).read_bytes())
        fns[(e["batch"], e["phoneme_bucket"])] = (exp, e)
    return path, manifest, vocab, tp, fns


def _pick_bucket(fns, n_rows: int, max_len: int):
    """Smallest exported (B, P) bucket covering the request (shared by
    both artifact drivers)."""
    fits = sorted(
        (p, b) for (b, p) in fns if p >= max_len and b >= n_rows
    )
    if not fits:
        raise ValueError(
            f"request ({n_rows} rows, {max_len} phonemes) exceeds every "
            f"exported bucket {sorted(fns)}"
        )
    p_bucket = fits[0][0]
    b_bucket = min(
        bb for (bb, pp) in fns if pp == p_bucket and bb >= n_rows
    )
    return b_bucket, p_bucket


class ExportedSynthesizer:
    """Host-side driver for an exported artifact directory.

    Pairs the serialized executables with the text frontend: picks the
    smallest exported (B, P) bucket that fits, pads, calls, trims. This is
    the same bucketing contract as TTSPipeline.synthesize, reconstructed
    purely from the artifact — no model code, no params files.
    """

    def __init__(self, path: str | Path, text_processor=None):
        (_, self.manifest, self.vocab, self.text_processor,
         self._fns) = _load_artifact(path, text_processor)

    def synthesize(
        self, text: str, seed: int = 0, temperature: float = 1.0
    ) -> np.ndarray:
        ids = self.text_processor.text_to_ids(text, self.vocab)
        n = len(ids)
        b, p_bucket = _pick_bucket(self._fns, 1, n)
        exp, entry = self._fns[(b, p_bucket)]
        # Same unused-row convention as AotPipeline: pad_id / length 1
        # (the conventions had drifted — zeros vs pad — before the shared
        # loader unified them; both rows are trimmed away regardless).
        ids_arr = np.full((b, p_bucket), self.vocab.pad_id, np.int32)
        ids_arr[0, :n] = ids
        lengths = np.ones((b,), np.int32)
        lengths[0] = n
        audio, _mel, n_frames, _deficit = exp.call(
            jnp.asarray(ids_arr), jnp.asarray(lengths),
            jnp.asarray(seed, jnp.int32),
            jnp.asarray(temperature, jnp.float32),
        )
        hop = self.manifest["samples_per_frame"]
        n_f = int(np.asarray(n_frames)[0])
        return np.asarray(audio, np.float32)[0, : n_f * hop]


class AotPipeline:
    """Serving-stack adapter over an AOT artifact directory.

    Implements the surface :class:`iris_tts_tpu.serve.DynamicBatcher` and
    :class:`iris_tts_tpu.serve.TTSServer` drive — ``synthesize(texts)``,
    ``_chunk_long_text``, ``join_chunks``, ``phoneme_buckets``, ``config``
    — purely from deserialized executables + the manifest, so the serving
    daemon never traces or compiles Python model code. This is the
    cold-start path: process start → first audio is deserialize + one
    backend compile of pre-lowered StableHLO + one dispatch
    (``scripts/serve.py --aot``).
    """

    def __init__(self, path: str | Path, text_processor=None,
                 base_seed: int = 1337, warmup_async: bool = False):
        from types import SimpleNamespace

        from jax import export as jax_export

        (path, self.manifest, self.vocab, self.text_processor,
         self._fns) = _load_artifact(
            path, text_processor, defer_frontend=warmup_async)
        self.hop = int(self.manifest["samples_per_frame"])
        # Duck-typed config: the serving stack reads only the sample rate.
        self.config = SimpleNamespace(
            audio=SimpleNamespace(
                sample_rate=int(self.manifest["sample_rate"])
            ),
            hifigan=SimpleNamespace(total_upsample=self.hop),
        )
        self._vocwin = None
        vw = self.manifest.get("vocode_window")
        if vw:
            self._vocwin = (
                jax_export.deserialize((path / vw["file"]).read_bytes()),
                vw,
            )
        self.phoneme_buckets = tuple(sorted(
            {p for (_, p) in self._fns}
        ))
        self.batch_buckets = tuple(sorted({b for (b, _) in self._fns}))
        self.seed = base_seed
        self._seed_counter = 0
        self.fused_overflow_count = 0
        if warmup_async:
            # Cold-start overlap: kick the first backend compile on the
            # warmup thread NOW, then build the text frontend (CMUdict +
            # G2P load, seconds of host work) while the chip compiles.
            self.warmup(block=False, sync_first=False)
            if self.text_processor is None:
                from iris_tts_tpu.text.frontend import create_text_processor

                self.text_processor = create_text_processor()

    # -- the DynamicBatcher surface -----------------------------------------

    def _chunk_long_text(self, text: str, max_phonemes: int) -> list:
        from iris_tts_tpu.text.frontend import chunk_text_by_phonemes

        return chunk_text_by_phonemes(
            self.text_processor, self.vocab, text,
            min(max_phonemes, self.phoneme_buckets[-1]),
        )

    def join_chunks(self, outs: Sequence[np.ndarray],
                    gap_ms: float = 120.0) -> np.ndarray:
        from iris_tts_tpu.data.audio_io import join_wave_chunks

        return join_wave_chunks(
            outs, gap_ms, self.config.audio.sample_rate
        )

    def _pick(self, n_rows: int, max_len: int) -> Tuple[int, int]:
        """Smallest exported (B, P) bucket covering the request."""
        return _pick_bucket(self._fns, n_rows, max_len)

    def _warm_one(self, key) -> None:
        if key == "vocwin":
            exp, meta = self._vocwin
            mel = np.zeros(
                (1, int(meta["window_frames"]), int(self.manifest["n_mels"])),
                np.float32,
            )
            out = exp.call(jnp.asarray(mel), jnp.asarray(0, jnp.int32))
            jax.device_get(out)
            return
        b, p = key
        exp, _e = self._fns[key]
        ids = np.zeros((b, p), np.int32)
        lengths = np.ones((b,), np.int32)
        out = exp.call(
            jnp.asarray(ids), jnp.asarray(lengths),
            jnp.asarray(0, jnp.int32), jnp.asarray(1.0, jnp.float32),
        )
        jax.device_get(out[2])

    def warmup(self, block: bool = True, sync_first: bool = True) -> None:
        """Backend-compile the exported executables before traffic.

        ``block=True``: one dispatch per executable, serially (boot cost =
        sum of compiles). ``block=False`` (progressive): compile the
        smallest bucket synchronously — the server can accept traffic the
        moment one executable is live — and the rest on a daemon thread in
        ascending size order; a request needing a not-yet-warm bucket just
        pays that compile inline, exactly as it would with no warmup.
        ``sync_first=False`` moves even the first compile to the thread
        (the ``warmup_async`` constructor overlap: host init continues
        while the chip compiles). ``warm_all_done()`` reports completion
        (e.g. for /stats).
        """
        keys = list(sorted(self._fns))
        if self._vocwin is not None:
            keys.append("vocwin")
        self._warm_all = threading.Event()
        if not keys:
            self._warm_all.set()
            return
        if block or sync_first:
            self._warm_one(keys[0])
            rest = keys[1:]
        else:
            rest = keys
        if block:
            for k in rest:
                self._warm_one(k)
            self._warm_all.set()
            return

        def _bg():
            for k in rest:
                try:
                    self._warm_one(k)
                except Exception:  # noqa: BLE001 — requests retry inline
                    logger.exception("background warmup of %s failed", k)
            self._warm_all.set()

        threading.Thread(
            target=_bg, name="aot-warmup", daemon=True
        ).start()

    def warm_all_done(self) -> bool:
        ev = getattr(self, "_warm_all", None)
        return bool(ev.is_set()) if ev is not None else False

    def synthesize(self, text, seed=None, temperature: float = 1.0,
                   fused=None, return_mel: bool = False,
                   pcm16: bool = False):
        """Text(s) → trimmed waveform(s); the TTSPipeline.synthesize
        contract restricted to what serving uses. Artifacts carry float32
        audio, so ``pcm16`` quantizes host-side (same truncation as the
        HTTP layer)."""
        del fused  # every exported executable IS the fused path
        if seed is None:
            self._seed_counter += 1
            seed = self.seed + self._seed_counter
        single = isinstance(text, str)
        texts = [text] if single else list(text)
        id_lists = [
            self.text_processor.text_to_ids(t, self.vocab) for t in texts
        ]
        max_len = max(len(i) for i in id_lists)
        b_bucket, p_bucket = self._pick(len(texts), max_len)
        if max_len > p_bucket:  # unreachable: _pick raised already
            raise ValueError("bucket selection underflow")
        ids = np.full((b_bucket, p_bucket), self.vocab.pad_id, np.int32)
        lengths = np.ones((b_bucket,), np.int32)
        for row, seq in enumerate(id_lists):
            ids[row, : len(seq)] = seq
            lengths[row] = len(seq)
        exp, _entry = self._fns[(b_bucket, p_bucket)]
        audio, mel, n_frames, deficit = exp.call(
            jnp.asarray(ids), jnp.asarray(lengths),
            jnp.asarray(int(seed), jnp.int32),
            jnp.asarray(float(temperature), jnp.float32),
        )
        audio_np, n_np, d_np = jax.device_get((audio, n_frames, deficit))
        self.fused_overflow_count += int(
            (np.asarray(d_np)[: len(texts)] > 0).sum()
        )
        outs = [
            np.asarray(a, np.float32)[: int(n) * self.hop]
            for a, n in zip(audio_np[: len(texts)], n_np)
        ]
        if pcm16:
            from iris_tts_tpu.models.pipeline import host_pcm16

            outs = [host_pcm16(a) for a in outs]
        if return_mel:
            mel_np = jax.device_get(mel)
            mels = [
                m[: int(n)] for m, n in zip(mel_np[: len(texts)], n_np)
            ]
            return (outs[0], mels[0]) if single else (outs, mels)
        return outs[0] if single else outs

    def vocode_streaming(self, mel, pcm16: bool = False):
        """Long log-mel → waveform chunks from the exported window
        executable — TTSPipeline.vocode_streaming reconstructed purely from
        the artifact (exact: same windowing contract, so chunks concatenate
        to the full vocoder pass). The chunk/context sizes are baked at
        export time (``manifest["vocode_window"]``); mels must be longer
        than one window (shorter ones fit a single synthesize() dispatch
        anyway)."""
        if self._vocwin is None:
            raise RuntimeError(
                "artifact was exported without a streaming-vocoder window "
                "— re-export with vocode_chunk_frames="
            )
        exp, meta = self._vocwin
        chunk = int(meta["chunk_frames"])
        ctx = int(meta["context_frames"])
        window = int(meta["window_frames"])
        up = self.hop
        n_mels = int(self.manifest["n_mels"])
        mel = np.asarray(mel, np.float32)
        if mel.ndim != 2:
            raise ValueError("vocode_streaming takes one [T, n_mels] mel")
        from iris_tts_tpu.models.pipeline import host_pcm16, mel_time_major

        mel = mel_time_major(mel, n_mels)
        t = mel.shape[0]
        if t <= window:
            raise ValueError(
                f"mel has {t} frames <= the exported window ({window}); "
                "short mels fit one synthesize() dispatch"
            )
        from iris_tts_tpu.models.hifigan import iter_stream_windows

        for a, b, w0, start_f, start_cl_f in iter_stream_windows(
            t, chunk, ctx
        ):
            block = exp.call(
                jnp.asarray(mel[w0 : w0 + window])[None],
                jnp.asarray(start_cl_f * up, jnp.int32),
            )
            block_np = np.asarray(jax.device_get(block))[0]
            off = (start_f - start_cl_f) * up
            out = block_np[off : off + (b - a) * up]
            yield host_pcm16(out) if pcm16 else out
