"""TTSPipeline — the real, working public synthesis API.

The reference's nominal top-level API raises ``NotImplementedError``
(/root/reference/src/iris/model.py:10-27); its real entry point is a script
(scripts/synthesize.py:64-220) that bounces between device and host (numpy
length regulation, per-shape recompiles). Here the whole path

    text → phoneme IDs → encoder → durations → length-regulate →
    VAE.generate → PostNet → HiFiGAN → waveform

is **two jit-compiled device stages** with a small set of static bucket
shapes (SURVEY.md §7 step 7, BASELINE.json config 4):

* stage A (per phoneme-bucket P): encoder + duration head. One scalar
  (total predicted frames) returns to host to pick the frame bucket.
* stage B (per (P, T) bucket): device-side length regulation, VAE prior
  sample + inverse flow + decode, PostNet refinement, HiFiGAN vocoding.

Batches shard over a ``(data, model)`` mesh when one is provided; the jit
cache is keyed by bucket shape so steady-state synthesis never recompiles.
"""

from __future__ import annotations

import json
import logging
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from iris_tts_tpu.config import IrisConfig
from iris_tts_tpu.models.encoder import DurationPredictor, PhonemeEncoder
from iris_tts_tpu.models.hifigan import HiFiGANGenerator
from iris_tts_tpu.models.postnet import PostNet
from iris_tts_tpu.models.vae import TextConditionedVAE
from iris_tts_tpu.ops.length import (
    gaussian_upsample,
    durations_from_log,
    length_regulate,
    padding_mask,
    round_up_to_multiple,
)
from iris_tts_tpu.text.frontend import TextProcessor, create_text_processor
from iris_tts_tpu.text.phonemes import PhonemeVocab

logger = logging.getLogger(__name__)

# Default bucket ladders. Phoneme buckets are powers of two; frame buckets
# include the 1.5x midpoints — a frame bucket directly scales the vocoder
# compute AND the audio transfer, so halving the worst-case padding waste
# (2x → 1.33x) measurably cuts single-utterance p50 (~4 ms on the v5e
# tunnel: a 44-phoneme sentence lands in 768 instead of 1024). Steady-state
# still never recompiles; the cache just has a few more (cheap) entries.
PHONEME_BUCKETS = (16, 32, 64, 128, 256, 512)
FRAME_BUCKETS = (128, 192, 256, 384, 512, 768, 1024, 1536, 2048, 3072, 4096)


def pick_bucket(n: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= n (clamps to the largest bucket)."""
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def _force_done(out) -> None:
    """Completion barrier for warmup dispatches — see
    :func:`iris_tts_tpu.utils.tpu.force_done` (block_until_ready is not a
    barrier on tunneled backends)."""
    from iris_tts_tpu.utils.tpu import force_done

    force_done(out)


def mel_time_major(mel, n_mels: int):
    """Normalize a mel to time-major ``[..., T, n_mels]``, accepting the
    reference layout ``[..., n_mels, T]`` (data.py:121 emits channel-major).
    Raises when neither of the two trailing axes is ``n_mels``-sized.

    A SQUARE mel (``T == n_mels``) is ambiguous by shape alone and is
    taken as already time-major — callers holding a channel-major mel of
    exactly ``n_mels`` frames must transpose before calling (there is no
    signal in the data to auto-detect it).

    Works on numpy AND jax arrays without converting between them (the
    ``.swapaxes`` method dispatches per type) — a device-resident mel must
    not bounce through the host just to fix its layout."""
    if mel.shape[-1] != n_mels:
        if mel.ndim < 2 or mel.shape[-2] != n_mels:
            raise ValueError(
                f"mel shape {mel.shape} has no {n_mels}-sized axis"
            )
        mel = mel.swapaxes(-1, -2)
    return mel


def host_pcm16(audio: np.ndarray) -> np.ndarray:
    """float waveform → int16 PCM on the host (same truncation semantics
    as the on-device ``_maybe_pcm16`` path — contracts must not diverge)."""
    return (np.clip(audio, -1.0, 1.0) * 32767.0).astype(np.int16)


def pack_fused_request(ids_np: np.ndarray, lengths_np: np.ndarray,
                       seed: int, temperature: float) -> np.ndarray:
    """[B, P] ids + [B] lengths + scalar seed/temperature → ONE [B, P+3]
    int32 array (the fused path's single host→device transfer; see
    ``TTSPipeline._fused_packed_fn``)."""
    b, p = ids_np.shape
    packed = np.empty((b, p + 3), np.int32)
    packed[:, :p] = ids_np
    packed[:, p] = lengths_np
    packed[:, p + 1] = np.int32(int(seed) & 0x7FFFFFFF)
    packed[:, p + 2] = np.array(temperature, np.float32).view(np.int32)
    return packed


def unpack_fused_reply(packed_np, pcm16: bool = False) -> tuple:
    """The fused reply's single device→host array → (audio rows [B, S],
    frame counts [B] int32, overflow deficits [B] int32).

    The wire is INTEGER-typed (int32 carrying bitcast float32 audio, or
    int16 carrying PCM16 / bitcast bfloat16 audio): the audio samples are
    bitcast into it on device and viewed back here. Carrying the int32
    meta as float bit patterns instead would be unsafe — XLA makes no
    guarantee that denormal/NaN payloads survive a float-typed copy, and
    TPU canonicalization was observed to zero small frame counts (they
    are denormal f32 patterns) in exactly one output layout. The meta
    tail is 2 int32 per row (2 trailing wire columns for int32, 4 for
    int16)."""
    arr = np.asarray(packed_np)
    tail = 8 // arr.dtype.itemsize
    meta = np.ascontiguousarray(arr[:, -tail:])
    if arr.dtype.itemsize == 2:
        meta = meta.view(np.int32)
    audio = arr[:, :-tail]
    if arr.dtype.itemsize == 2:
        audio = audio if pcm16 else audio.view(jnp.bfloat16)
    else:
        audio = audio.view(np.float32)
    return audio, meta[:, 0], meta[:, 1]


@dataclass
class TTSPipeline:
    """End-to-end text-to-speech pipeline (public API parity with the
    reference's ``TTSPipeline`` name, model.py:10-27 — but functional).

    Build with :meth:`initialize` (random weights) or assemble from trained
    checkpoints via :mod:`iris_tts_tpu.train.checkpoint` loaders plus
    :func:`iris_tts_tpu.convert.hifigan_torch.load_pretrained_hifigan`.
    """

    config: IrisConfig
    params: Dict[str, Any]  # encoder / duration / vae / postnet? / hifigan
    vocab: PhonemeVocab
    text_processor: TextProcessor
    use_postnet: bool = True
    seed: int = 1337
    dtype: Any = jnp.float32
    phoneme_buckets: Tuple[int, ...] = PHONEME_BUCKETS
    frame_buckets: Tuple[int, ...] = FRAME_BUCKETS
    # Frame budget per phoneme for the fused single-dispatch serving path
    # (LJSpeech averages ~6-7 mel frames per phoneme; 12 leaves headroom —
    # rare overflows compress durations proportionally instead of truncating).
    fused_frames_per_phoneme: int = 12
    # Quality guard on that compression: a fused row whose predicted frames
    # exceed the budget by more than this FRACTION of the prediction is
    # transparently re-synthesized on the two-stage bucketed path (true
    # durations, no compression) instead of shipping rate-distorted speech.
    # Small overflows (≤ tolerance) still compress — inaudible and cheaper
    # than a second dispatch. None disables the fallback (observability
    # counters still fire).
    fused_overflow_tolerance: Optional[float] = 0.1
    # Length regulator: "hard" (searchsorted gather, the reference contract)
    # or "gaussian" (soft Gaussian upsampling — smooths phoneme boundaries in
    # the frame conditioning; new functionality, ops/length.py).
    upsample: str = "hard"
    # Single-transfer wire format for the fused path (default on): tunneled
    # backends pay a fixed per-array cost each way, so the request rides as
    # ONE [B, P+3] int32 array (ids + length + seed + temperature bits) and
    # the reply as ONE array with the frame counts / overflow deficits
    # bit-packed after the audio samples — 2 transfers per call instead of
    # 5 (ids, lengths, seed up; audio, n_frames, deficit down). Equality
    # with the unpacked path is pinned by tests/test_pipeline.py. Off-mesh,
    # waveform-only calls only; anything else falls back transparently.
    packed_fetch: bool = True
    # Optional data-parallel serving mesh (set via use_mesh(); None =
    # single-device). When set, every synthesis entry point pads the batch
    # to the data-axis multiple and shards the batch dim — GSPMD propagates
    # the sharding through both jitted stages.
    _mesh: Any = field(default=None, init=False, repr=False)
    _mesh_cfg: Any = field(default=None, init=False, repr=False)

    def __post_init__(self):
        cfg = self.config
        self._encoder = PhonemeEncoder(config=cfg.encoder, dtype=self.dtype)
        self._duration = DurationPredictor(
            config=cfg.duration, dtype=self.dtype
        )
        self._vae = TextConditionedVAE(config=cfg.vae, dtype=self.dtype)
        self._postnet = PostNet(config=cfg.postnet, dtype=self.dtype)
        self._hifigan = HiFiGANGenerator(config=cfg.hifigan, dtype=self.dtype)
        self._seed_counter = 0
        self._stage_a = jax.jit(self._stage_a_fn)
        # use_postnet is part of the jit cache key: toggling the attribute
        # after a trace would otherwise be silently ignored.
        self._stage_b = jax.jit(
            self._stage_b_fn,
            static_argnames=("total_frames", "use_postnet", "upsample",
                             "pcm16"),
        )
        self._stage_b_mel = jax.jit(
            self._stage_b_mel_fn,
            static_argnames=("total_frames", "use_postnet", "upsample"),
        )
        self._fused = jax.jit(
            self._fused_fn,
            static_argnames=("total_frames", "use_postnet", "upsample",
                             "pcm16"),
        )
        self._fused_packed = jax.jit(
            self._fused_packed_fn,
            static_argnames=("total_frames", "use_postnet", "upsample",
                             "pcm16"),
        )
        self._vocode = jax.jit(self._vocode_fn)
        self._vocode_window = jax.jit(
            self._vocode_window_fn,
            static_argnames=("chunk_samples", "pcm16"),
        )
        self._vocode_sp = jax.jit(
            self._vocode_sp_fn,
            static_argnames=("mesh", "chunk_frames", "window_frames",
                             "pcm16"),
        )
        # Fused-path overflow observability (VERDICT r2 item 6): rows whose
        # predicted frames exceeded the phoneme-count budget (speech-rate
        # compression applied). Read by DynamicBatcher.stats().
        self.fused_overflow_count = 0
        self.fused_overflow_frames = 0  # total frames compressed away
        self.fused_fallback_count = 0  # rows redone on the two-stage path
        self._overflow_log_t = 0.0
        # Frontend memo: text → phoneme ids. Serving traffic repeats
        # phrases (and every call pays G2P/lexicon lookups otherwise);
        # bounded FIFO so a hostile stream cannot grow it unboundedly.
        self._ids_cache: Dict[str, np.ndarray] = {}
        self._ids_cache_max = 4096

    # ------------------------------------------------------------------
    # constructors
    # ------------------------------------------------------------------

    @classmethod
    def initialize(
        cls,
        config: Optional[IrisConfig] = None,
        vocab: Optional[PhonemeVocab] = None,
        text_processor: Optional[TextProcessor] = None,
        lexicon_path: Optional[str | Path] = None,
        seed: int = 1337,
        use_postnet: bool = True,
        dtype: Any = jnp.float32,
    ) -> "TTSPipeline":
        """Random-weight pipeline (for tests, benchmarks, and as the target
        structure for checkpoint loading)."""
        config = config or IrisConfig()
        vocab = vocab or PhonemeVocab.default_arpabet()
        if len(vocab) != config.encoder.vocab_size:
            from dataclasses import replace

            config = replace(
                config,
                encoder=replace(config.encoder, vocab_size=len(vocab)),
            )
        text_processor = text_processor or create_text_processor(
            lexicon_path=lexicon_path
        )

        key = jax.random.PRNGKey(seed)
        k_enc, k_dur, k_vae, k_pn, k_hg = jax.random.split(key, 5)
        enc = PhonemeEncoder(config=config.encoder, dtype=dtype)
        dur = DurationPredictor(config=config.duration, dtype=dtype)
        vae = TextConditionedVAE(config=config.vae, dtype=dtype)
        pn = PostNet(config=config.postnet, dtype=dtype)
        hg = HiFiGANGenerator(config=config.hifigan, dtype=dtype)

        # All inits under jit: on tunneled backends eager execution pays a
        # fixed per-primitive round trip, turning init into minutes.
        ids = jnp.zeros((1, 8), jnp.int32)
        p_enc = jax.jit(enc.init)(k_enc, ids)["params"]
        enc_out = jax.jit(enc.apply)({"params": p_enc}, ids)
        p_dur = jax.jit(dur.init)(k_dur, enc_out)["params"]
        t = config.vae.down_factor * 4
        p_vae = jax.jit(vae.init)(
            {"params": k_vae, "sample": k_vae},
            jnp.zeros((1, t, config.vae.n_mels)),
            jnp.zeros((1, t, config.vae.cond_dim)),
        )["params"]
        pn_vars = jax.jit(pn.init)(
            k_pn, jnp.zeros((1, t, config.postnet.n_mels))
        )
        p_hg = jax.jit(hg.init)(
            k_hg, jnp.zeros((1, 8, config.hifigan.in_channels))
        )["params"]
        params = {
            "encoder": p_enc,
            "duration": p_dur,
            "vae": p_vae,
            "postnet": pn_vars,
            "hifigan": p_hg,
        }
        return cls(
            config=config,
            params=params,
            vocab=vocab,
            text_processor=text_processor,
            use_postnet=use_postnet,
            seed=seed,
            dtype=dtype,
        )

    @classmethod
    def from_checkpoints(
        cls,
        encoder_checkpoint: str | Path,
        vae_checkpoint: str | Path,
        postnet_checkpoint: Optional[str | Path] = None,
        hifigan_checkpoint: Optional[str | Path] = None,
        hifigan_gan_checkpoint: Optional[str | Path] = None,
        config: Optional[IrisConfig] = None,
        vocab: Optional[PhonemeVocab] = None,
        vocab_path: Optional[str | Path] = None,
        lexicon_path: Optional[str | Path] = None,
        dtype: Any = jnp.float32,
    ) -> "TTSPipeline":
        """Assemble the inference pipeline from trained stage checkpoints
        (replaces the reference's per-script .h5 wiring,
        scripts/synthesize.py:93-169).

        ``config`` defaults to the config persisted inside the VAE stage
        checkpoint directory; ``hifigan_checkpoint`` is a torch
        ``generator.ckpt`` run through the weight converter, while
        ``hifigan_gan_checkpoint`` is a generator stage directory from this
        framework's own train_hifigan.py (outputs/hifigan_gan/gen) — the
        EMA average deploys when the run tracked one
        (``TrainState.serving_params``). Missing PostNet → VAE output used
        directly (reference: synthesize.py:168-169).
        """
        from iris_tts_tpu.config import load_config
        from iris_tts_tpu.train.checkpoint import CheckpointManager

        vae_dir = Path(vae_checkpoint)
        if config is None:
            cfg_file = vae_dir / "config.json"
            if not cfg_file.exists():
                cfg_file = vae_dir.parent / "config_vae.json"
            config = load_config(cfg_file)

        if vocab is None:
            vocab = (
                PhonemeVocab.load(vocab_path)
                if vocab_path
                else PhonemeVocab.default_arpabet()
            )
        if len(vocab) != config.encoder.vocab_size:
            raise ValueError(
                f"vocab size {len(vocab)} does not match the checkpointed "
                f"encoder vocab_size {config.encoder.vocab_size}; pass the "
                "vocab the model was trained with"
            )
        pipe = cls.initialize(
            config,
            vocab=vocab,
            lexicon_path=lexicon_path,
            use_postnet=postnet_checkpoint is not None,
            dtype=dtype,
        )
        # Template-free restores: stage checkpoints carry the optimizer
        # state of whatever schedule trained them, which never matches an
        # inference-side template — only the params subtree is taken.
        enc_mgr = CheckpointManager(Path(encoder_checkpoint))
        enc_params = enc_mgr.restore_best_params()
        enc_mgr.close()
        pipe.params["encoder"] = enc_params["encoder"]
        pipe.params["duration"] = enc_params["duration"]

        vae_mgr = CheckpointManager(vae_dir)
        pipe.params["vae"] = vae_mgr.restore_best_params()
        vae_mgr.close()

        if postnet_checkpoint is not None:
            pn_mgr = CheckpointManager(Path(postnet_checkpoint))
            pn_raw = pn_mgr.restore_best_raw()
            pn_mgr.close()
            pipe.params["postnet"] = {
                "params": pn_raw["params"],
                "batch_stats": pn_raw["batch_stats"],
            }

        if hifigan_checkpoint is not None and hifigan_gan_checkpoint:
            raise ValueError(
                "pass either hifigan_checkpoint (torch) or "
                "hifigan_gan_checkpoint (train_hifigan.py stage), not both"
            )
        if hifigan_checkpoint is not None:
            from iris_tts_tpu.convert.hifigan_torch import (
                convert_hifigan_state_dict,
                load_torch_checkpoint,
            )

            sd = load_torch_checkpoint(hifigan_checkpoint)
            pipe.params["hifigan"] = convert_hifigan_state_dict(
                sd, config.hifigan
            )
        elif hifigan_gan_checkpoint is not None:
            gan_mgr = CheckpointManager(Path(hifigan_gan_checkpoint))
            raw = gan_mgr.restore_best_raw()
            gan_mgr.close()
            # serving_params semantics on the raw dict: the EMA average is
            # what ships when the run tracked one, the raw generator
            # otherwise.
            pipe.params["hifigan"] = (
                raw.get("ema_params") or raw["params"]
            )
        return pipe

    # ------------------------------------------------------------------
    # deployment artifacts
    # ------------------------------------------------------------------

    def save(self, path: str | Path, half: bool = False) -> None:
        """Export the assembled pipeline (params + config + vocab) as one
        deployable directory.

        ``half=True`` stores parameters as float16 (half the artifact
        size; weights round to ~1e-4 relative — far below training noise).
        :meth:`load` casts back to float32 transparently."""
        from iris_tts_tpu.config import save_config
        from iris_tts_tpu.train.checkpoint import save_params

        path = Path(path)
        path.mkdir(parents=True, exist_ok=True)
        params = self.params
        if half:
            params = jax.tree_util.tree_map(
                lambda x: np.asarray(x).astype(np.float16)
                if np.issubdtype(np.asarray(x).dtype, np.floating)
                else np.asarray(x),
                params,
            )
        save_params(path / "params", params)
        save_config(self.config, path / "config.json")
        self.vocab.save(path / "vocab.json")
        (path / "meta.json").write_text(
            json.dumps({
                "use_postnet": self.use_postnet,
                "seed": self.seed,
                "upsample": self.upsample,
                "params_dtype": "float16" if half else "float32",
                # Tuned serving knobs: dropping these on reload would
                # silently revert an operator's overflow-budget/bucket
                # tuning (and change the jit-cache key set).
                "fused_frames_per_phoneme": self.fused_frames_per_phoneme,
                "fused_overflow_tolerance": self.fused_overflow_tolerance,
                "phoneme_buckets": list(self.phoneme_buckets),
                "frame_buckets": list(self.frame_buckets),
            })
        )

    @classmethod
    def load(
        cls,
        path: str | Path,
        lexicon_path: Optional[str | Path] = None,
        dtype: Any = jnp.float32,
    ) -> "TTSPipeline":
        """Load a pipeline exported with :meth:`save`."""
        from iris_tts_tpu.config import load_config
        from iris_tts_tpu.train.checkpoint import load_params

        path = Path(path)
        config = load_config(path / "config.json")
        vocab = PhonemeVocab.load(path / "vocab.json")
        meta = json.loads((path / "meta.json").read_text())
        pipe = cls.initialize(
            config,
            vocab=vocab,
            lexicon_path=lexicon_path,
            use_postnet=meta.get("use_postnet", True),
            seed=meta.get("seed", 1337),
            dtype=dtype,
        )
        pipe.upsample = meta.get("upsample", "hard")
        # meta may carry "mrf_impl" from artifacts saved before the Pallas
        # MRF kernel was removed (it lost across three backend generations
        # — docs/PERF.md); the key is accepted and ignored.
        pipe.fused_frames_per_phoneme = int(meta.get(
            "fused_frames_per_phoneme", pipe.fused_frames_per_phoneme
        ))
        if "fused_overflow_tolerance" in meta:
            tol = meta["fused_overflow_tolerance"]
            pipe.fused_overflow_tolerance = (
                None if tol is None else float(tol)
            )
        if "phoneme_buckets" in meta:
            pipe.phoneme_buckets = tuple(meta["phoneme_buckets"])
        if "frame_buckets" in meta:
            pipe.frame_buckets = tuple(meta["frame_buckets"])
        if meta.get("params_dtype") == "float16":
            # Half-precision artifact: restore as saved, cast back to f32,
            # and verify the tree matches the architecture before adopting.
            raw = load_params(path / "params")
            raw = jax.tree_util.tree_map(
                lambda x: np.asarray(x).astype(np.float32)
                if np.issubdtype(np.asarray(x).dtype, np.floating)
                else np.asarray(x),
                raw,
            )
            want = jax.tree_util.tree_structure(pipe.params)
            got = jax.tree_util.tree_structure(raw)
            if want != got:
                raise ValueError(
                    f"half-precision artifact tree does not match the "
                    f"config architecture: {got} vs {want}"
                )
            # Leaf shapes too: same tree with different widths must fail
            # here with a clear message, not deep inside flax.apply.
            for (kp, a), b in zip(
                jax.tree_util.tree_leaves_with_path(raw),
                jax.tree_util.tree_leaves(pipe.params),
            ):
                if np.asarray(a).shape != np.asarray(b).shape:
                    raise ValueError(
                        "half-precision artifact leaf "
                        f"{jax.tree_util.keystr(kp)} has shape "
                        f"{np.asarray(a).shape}, config wants "
                        f"{np.asarray(b).shape}"
                    )
            pipe.params = raw
        else:
            pipe.params = load_params(path / "params", template=pipe.params)
        return pipe

    # ------------------------------------------------------------------
    # jitted device stages
    # ------------------------------------------------------------------

    def _stage_a_fn(self, params, ids, lengths):
        """encoder + duration head: [B,P] ids + [B] lengths →
        (enc [B,P,E], frames [B,P], max total frames [] int32).

        Everything — padding mask, duration inversion, the total-frame
        reduction — lives inside this ONE executable: the only host sync per
        batch is transferring the returned scalar.
        """
        mask = padding_mask(lengths, ids.shape[1])
        enc = self._encoder.apply(
            {"params": params["encoder"]}, ids, padding_mask=mask
        )
        log_dur = self._duration.apply({"params": params["duration"]}, enc)
        frames = durations_from_log(log_dur) * mask.astype(jnp.int32)
        total = jnp.max(jnp.sum(frames, axis=1)).astype(jnp.int32)
        return enc, frames, total

    def _acoustic(self, params, enc, frames, seed, total_frames, temperature,
                  use_postnet, upsample="hard"):
        key = jax.random.PRNGKey(seed)  # traced: no extra host dispatch
        if upsample == "gaussian":
            cond, frame_mask = gaussian_upsample(
                enc, frames.astype(jnp.float32), total_frames
            )
        else:
            cond, frame_mask = length_regulate(enc, frames, total_frames)
        mel, _ = self._vae.apply(
            {"params": params["vae"]},
            cond,
            temperature=temperature,
            method=TextConditionedVAE.generate,
            rngs={"sample": key},
        )
        if use_postnet:
            mel = self._postnet.apply(params["postnet"], mel)
        # Sum the mask in int32, NOT in its storage dtype: under the bf16
        # serving default a bf16 sum rounds counts above 256 (e.g. 701
        # frames sums to 700.0), trimming audio at the wrong sample.
        n_frames = jnp.sum(
            (frame_mask > 0).astype(jnp.int32), axis=1
        )
        return mel, n_frames

    def _apply_hifigan(self, params, mel):
        return self._hifigan.apply({"params": params["hifigan"]}, mel)

    @staticmethod
    def _maybe_pcm16(audio, pcm16: bool):
        """Device-side PCM16 quantization (same truncation semantics as the
        serving layer's host conversion, serve/server.py:_pcm16le) — halves
        the device→host fetch bytes and removes the host quantize pass for
        latency-sensitive serving."""
        if not pcm16:
            return audio
        clipped = jnp.clip(audio.astype(jnp.float32), -1.0, 1.0)
        return (clipped * 32767.0).astype(jnp.int16)

    def _stage_b_fn(self, params, enc, frames, seed, *, total_frames,
                    temperature=1.0, use_postnet=True, upsample="hard",
                    pcm16=False):
        """length-regulate + VAE + PostNet + HiFiGAN → waveform.
        ``seed``: scalar int32 (the PRNG key is derived inside the
        executable). Returns (audio, mel, per-row frame counts).

        NOTE: the packed single-transfer reply is deliberately NOT
        offered for stage B. It was tried (r5): warmup of the packed
        stage-B module at the serving batch buckets crashed the tunnel's
        remote-compile helper after a ~50-minute hang
        ("response body closed before all bytes were read" — the known
        oversized-module failure class), while the same wire format on
        the fused B=1 path compiles and serves fine. The batch path's
        second fetch amortizes over B rows; the fused path is where the
        per-transfer round trip dominates."""
        mel, n_frames = self._acoustic(
            params, enc, frames, seed, total_frames, temperature, use_postnet,
            upsample,
        )
        audio = self._apply_hifigan(params, mel)
        return self._maybe_pcm16(audio, pcm16), mel, n_frames

    def _stage_b_mel_fn(self, params, enc, frames, seed, *, total_frames,
                        temperature=1.0, use_postnet=True, upsample="hard"):
        return self._acoustic(
            params, enc, frames, seed, total_frames, temperature, use_postnet,
            upsample,
        )

    def _fused_mel_fn(self, params, ids, lengths, seed, *, total_frames,
                      temperature=1.0, use_postnet=True, upsample="hard"):
        """Text → mel core of the fused path (everything but the vocoder)
        in ONE executable: encoder + duration + budget compression +
        length-regulate + VAE + PostNet. Returns (mel, per-row frame
        counts, per-row deficit). This is also the stage-1 executable for
        pipeline-parallel serving (parallel/pp.py), where the vocoder runs
        on a different device group.

        The frame budget is estimated on the host from the phoneme count
        (``fused_frames_per_phoneme``) instead of the predicted durations, so
        no scalar needs to return to the host between the encoder and the
        acoustic stack — one utterance costs one device round trip. If the
        predicted total overflows the budget, durations are scaled down
        proportionally (integer floor keeps the sum within budget), slightly
        compressing speech rate rather than truncating audio. The per-row
        frame deficit (predicted − budget, 0 when it fit) is returned so the
        host can count compressions — a systematically-too-small
        ``fused_frames_per_phoneme`` is observable, not silent.
        """
        enc, frames, _ = self._stage_a_fn(params, ids, lengths)
        # A single phoneme can never occupy more than the whole frame
        # budget — clipping here also keeps the apportionment product
        # frames_i·capped ≤ total_frames² (≈16.8M at the largest bucket),
        # exact in int32: an untrained/corrupted duration head predicting
        # ~2^31/total_frames frames for one phoneme would otherwise wrap
        # the int32 multiply below into negative durations (garbage audio,
        # no error).
        frames = jnp.minimum(frames, total_frames)
        total = jnp.sum(frames, axis=1, keepdims=True)  # [B, 1]
        capped = jnp.minimum(total, total_frames)
        # Largest-remainder apportionment: floor-divide, then hand the
        # leftover (capped − Σfloor) frames to the largest fractional
        # remainders so the compressed sum EQUALS the cap. Plain floor can
        # collapse to zero frames under heavy compression (every
        # frames_i·capped < total ⇒ all floors 0 ⇒ silent empty audio —
        # caught by the round-3 TPU verify drive). Positions awarded a +1
        # necessarily have remainder > 0, which implies frames > 0, so
        # padding rows are never bumped.
        denom = jnp.maximum(total, 1)
        scaled = (frames * capped) // denom  # exact: see the clip above
        rem = (frames * capped) % denom
        shortfall = capped[:, 0] - jnp.sum(scaled, axis=1)  # [B]
        ranks = jnp.argsort(jnp.argsort(-rem, axis=1), axis=1)
        bump = (ranks < shortfall[:, None]).astype(frames.dtype)
        frames = jnp.where(total > total_frames, scaled + bump, frames)
        deficit = jnp.maximum(total - total_frames, 0)[:, 0]  # [B] int32
        mel, n_frames = self._acoustic(
            params, enc, frames, seed, total_frames, temperature, use_postnet,
            upsample,
        )
        return mel, n_frames, deficit

    def _fused_fn(self, params, ids, lengths, seed, *, total_frames,
                  temperature=1.0, use_postnet=True, upsample="hard",
                  pcm16=False):
        """Single-dispatch serving path: stage A + stage B in ONE executable
        (:meth:`_fused_mel_fn` + the vocoder)."""
        mel, n_frames, deficit = self._fused_mel_fn(
            params, ids, lengths, seed, total_frames=total_frames,
            temperature=temperature, use_postnet=use_postnet,
            upsample=upsample,
        )
        audio = self._apply_hifigan(params, mel)
        return self._maybe_pcm16(audio, pcm16), mel, n_frames, deficit

    def _fused_packed_fn(self, params, packed, *, total_frames,
                         use_postnet=True, upsample="hard", pcm16=False):
        """Single-transfer wire format over :meth:`_fused_fn`.

        ``packed`` is ONE [B, P+3] int32 array: each row's phoneme ids,
        then its length, then the (replicated) seed, then the float32
        temperature's bits (temperature stays TRACED — it is data, so a
        new temperature never recompiles). The reply is ONE array in the
        audio dtype with each row's frame count and overflow deficit
        bit-packed after its samples. Host codecs:
        :func:`pack_fused_request` / :func:`unpack_fused_reply`.
        """
        p = packed.shape[1] - 3
        ids = packed[:, :p]
        lengths = packed[:, p]
        seed = packed[0, p + 1]
        temperature = jax.lax.bitcast_convert_type(
            packed[0, p + 2], jnp.float32
        )
        audio, _mel, n_frames, deficit = self._fused_fn(
            params, ids, lengths, seed, total_frames=total_frames,
            temperature=temperature, use_postnet=use_postnet,
            upsample=upsample, pcm16=pcm16,
        )
        return self._pack_reply(audio, n_frames, deficit)

    @staticmethod
    def _pack_reply(audio, n_frames, deficit):
        """Audio + per-row int32 meta → ONE INTEGER-typed wire array.

        The audio is bitcast INTO the integer domain (int32 for f32
        samples, int16 for PCM16/bf16) rather than the meta into the
        float domain: a float-typed tensor gives XLA license to
        canonicalize payloads, and TPU was observed to zero bit-packed
        frame counts (denormal f32 patterns) in one output layout.
        Integer lanes are copied verbatim on every backend."""
        meta = jnp.stack(
            [n_frames.astype(jnp.int32), deficit.astype(jnp.int32)], axis=1
        )  # [B, 2] int32
        if audio.dtype == jnp.int16:
            meta = jax.lax.bitcast_convert_type(meta, jnp.int16)
            return jnp.concatenate(
                [audio, meta.reshape(meta.shape[0], 4)], axis=1
            )
        if audio.dtype == jnp.bfloat16:
            audio_i = jax.lax.bitcast_convert_type(audio, jnp.int16)
            meta = jax.lax.bitcast_convert_type(meta, jnp.int16)
            return jnp.concatenate(
                [audio_i, meta.reshape(meta.shape[0], 4)], axis=1
            )
        audio_i = jax.lax.bitcast_convert_type(
            audio.astype(jnp.float32), jnp.int32
        )
        return jnp.concatenate([audio_i, meta], axis=1)

    def _vocode_fn(self, params, mel):
        return self._apply_hifigan(params, mel)

    def _vocode_window_fn(self, params, mel, start, *, chunk_samples,
                          pcm16=False):
        """Vocode one fixed-size mel window and return only the
        ``chunk_samples`` keep-region starting at sample ``start`` (traced,
        so every chunk position reuses ONE executable) — the device stage of
        :meth:`vocode_streaming`. Slicing before the fetch keeps the
        device→host transfer at chunk size, not window size."""
        audio = self._apply_hifigan(params, mel)
        block = jax.lax.dynamic_slice_in_dim(
            audio, start, chunk_samples, axis=1
        )
        return self._maybe_pcm16(block, pcm16)

    def _vocode_sp_fn(self, params, mel, w0s, starts_f, *, mesh,
                      chunk_frames, window_frames,
                      pcm16=False):
        """Sequence-parallel vocoding: device stage of
        :meth:`vocode_sharded`.

        The mel TIME axis is split into one receptive-field-overlap window
        per device (the exact-streaming plan of
        :func:`~iris_tts_tpu.models.hifigan.iter_stream_windows` with
        ``chunk = T / n_devices``), the window axis is sharded over EVERY
        mesh axis, and each device vocodes its window and keeps its chunk.
        Temporal sharding thereby becomes embarrassingly-parallel batch
        sharding — no halo collectives at all. The mel is replicated and
        sliced locally: at [T, 80] x 4 bytes it is ~1000x smaller than the
        waveform compute, so a ppermute halo exchange would save nothing
        (ICI traffic is ONE all-gather of the [B, T*256] output).

        ``w0s``/``starts_f`` are TRACED [D] i32 arrays (window offsets are
        data, not shape), so one executable serves every mel whose padded
        length/chunk split matches — :meth:`vocode_sharded` pads T to a
        coarse multiple precisely so novel lengths don't recompile.
        """
        from jax.sharding import NamedSharding, PartitionSpec

        axes = tuple(mesh.axis_names)
        shard = NamedSharding(mesh, PartitionSpec(axes))
        wins = jax.vmap(
            lambda w0: jax.lax.dynamic_slice_in_dim(
                mel, w0, window_frames, axis=1
            )
        )(jnp.asarray(w0s, jnp.int32))  # [D, B, W, n_mels]
        wins = jax.lax.with_sharding_constraint(wins, shard)
        d, b = wins.shape[0], wins.shape[1]
        flat = wins.reshape(d * b, window_frames, wins.shape[-1])
        flat = jax.lax.with_sharding_constraint(flat, shard)
        audio = self._apply_hifigan(params, flat)  # [D*B, W*spf]
        audio = jax.lax.with_sharding_constraint(
            audio.reshape(d, b, -1), shard
        )
        spf = self.config.hifigan.total_upsample
        starts = jnp.asarray(starts_f, jnp.int32) * spf
        keep = jax.vmap(
            lambda aw, s: jax.lax.dynamic_slice_in_dim(
                aw, s, chunk_frames * spf, axis=1
            )
        )(audio, starts)  # [D, B, chunk*spf]
        out = jnp.swapaxes(keep, 0, 1).reshape(b, -1)
        return self._maybe_pcm16(out, pcm16)

    # ------------------------------------------------------------------
    # host-side API
    # ------------------------------------------------------------------

    def _count_overflows(self, deficit: np.ndarray) -> None:
        """Record fused-path frame-budget overflows (rate-limited warning +
        counters): systematically-too-small ``fused_frames_per_phoneme``
        would otherwise ship subtly fast speech with zero observability."""
        import time as _time

        n_over = int((deficit > 0).sum())
        if not n_over:
            return
        self.fused_overflow_count += n_over
        self.fused_overflow_frames += int(deficit.sum())
        now = _time.monotonic()
        if now - self._overflow_log_t > 60.0:
            self._overflow_log_t = now
            logger.warning(
                "fused path compressed %d utterance(s) by up to %d frames "
                "(%d total so far): predicted durations exceeded the "
                "fused_frames_per_phoneme=%d budget — speech rate is "
                "compressed, not truncated; raise the budget if frequent",
                n_over, int(deficit.max()), self.fused_overflow_count,
                self.fused_frames_per_phoneme,
            )

    def _next_seed_int(self, seed: Optional[int]) -> int:
        """Resolve the per-call seed on the host (auto-increment when the
        caller passes None)."""
        if seed is None:
            self._seed_counter += 1
            seed = self.seed + self._seed_counter
        return int(seed)

    def _next_seed(self, seed: Optional[int]) -> jnp.ndarray:
        """Scalar int32 seed for the jitted stages (no device key ops on
        the host path)."""
        return jnp.asarray(self._next_seed_int(seed), jnp.int32)

    def _text_to_ids_cached(self, text: str) -> np.ndarray:
        ids = self._ids_cache.get(text)
        if ids is None:
            ids = self.text_processor.text_to_ids(text, self.vocab)
            if len(self._ids_cache) >= self._ids_cache_max:
                self._ids_cache.pop(next(iter(self._ids_cache)))
            self._ids_cache[text] = ids
        return ids

    def _encode_texts(self, texts: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
        """Texts → bucketed, padded [B, P] ids + [B] lengths (host)."""
        if not texts:
            raise ValueError("synthesize needs at least one utterance")
        id_lists = [self._text_to_ids_cached(t) for t in texts]
        lengths = np.array([len(i) for i in id_lists], np.int32)
        p_bucket = pick_bucket(int(lengths.max()), self.phoneme_buckets)
        if int(lengths.max()) > p_bucket:
            logger.warning(
                "utterance with %d phonemes exceeds the largest phoneme "
                "bucket (%d); the tail will be truncated — raise "
                "pipeline.phoneme_buckets or split the text",
                int(lengths.max()), p_bucket,
            )
            lengths = np.minimum(lengths, p_bucket)
        ids = np.full((len(texts), p_bucket), self.vocab.pad_id, np.int32)
        for row, seq in zip(ids, id_lists):
            row[: len(seq)] = seq[:p_bucket]
        return ids, lengths

    def use_mesh(self, mesh=None, cfg=None) -> "TTSPipeline":
        """Enable data-parallel serving over a ``jax.sharding.Mesh``.

        Places params on the mesh (wide channel dims — transformer FFN,
        HiFiGAN/VAE conv channels — shard over the ``model`` axis when it
        has size > 1, everything else replicates: parallel/sharding.py) and
        shards each request batch's leading dim over the ``data`` axis
        (batch padded to the axis size with duplicate rows; the duplicates
        are dropped from the outputs). One chip and N chips run the same
        code path with identical results (tested on a virtual CPU mesh,
        both data-parallel and with model_parallel=2). New capability
        beyond the single-device reference (SURVEY.md §2.4).
        """
        from iris_tts_tpu.config import MeshConfig
        from iris_tts_tpu.parallel.mesh import build_mesh
        from iris_tts_tpu.parallel.sharding import tp_param_sharding

        cfg = cfg or MeshConfig()
        mesh = mesh if mesh is not None else build_mesh(cfg)
        missing = {cfg.data_axis, cfg.model_axis} - set(mesh.axis_names)
        if missing:
            # A foreign mesh would otherwise KeyError deep inside sharding
            # or (worse) at the first synthesize call.
            raise ValueError(
                f"mesh axes {mesh.axis_names} lack {sorted(missing)}; pass "
                f"a MeshConfig whose data_axis/model_axis match the mesh"
            )
        self._mesh, self._mesh_cfg = mesh, cfg
        if len(mesh.devices.flat) > 1:
            # Degrades to pure replication when model_parallel == 1.
            self.params = tp_param_sharding(self.params, mesh, cfg)
        return self

    def _device_batch(self, ids_np: np.ndarray, lengths_np: np.ndarray):
        """Host batch → device arrays (+ true row count). On a mesh the
        batch pads to a data-axis multiple and shards over ``data``."""
        b = ids_np.shape[0]
        if self._mesh is None or len(self._mesh.devices.flat) == 1:
            return jnp.asarray(ids_np), jnp.asarray(lengths_np), b
        from iris_tts_tpu.parallel.mesh import shard_batch

        dp = self._mesh.shape[self._mesh_cfg.data_axis]
        pad = (-b) % dp
        if pad:
            ids_np = np.concatenate(
                [ids_np, np.repeat(ids_np[-1:], pad, axis=0)]
            )
            lengths_np = np.concatenate(
                [lengths_np, np.repeat(lengths_np[-1:], pad)]
            )
        ids, lengths = shard_batch(
            (jnp.asarray(ids_np), jnp.asarray(lengths_np)),
            self._mesh, self._mesh_cfg,
        )
        return ids, lengths, b

    def _run_stage_a(self, texts: Sequence[str]):
        """Host frontend + stage A + frame-bucket choice (shared by the
        synthesize/synthesize_mel paths)."""
        ids_np, lengths = self._encode_texts(texts)
        ids_dev, lengths_dev, _ = self._device_batch(ids_np, lengths)
        enc, frames, total_arr = self._stage_a(
            self.params, ids_dev, lengths_dev
        )
        total = int(total_arr)
        factor = self.config.vae.down_factor
        t_bucket = pick_bucket(
            round_up_to_multiple(max(total, factor), factor),
            self.frame_buckets,
        )
        if total > t_bucket:
            logger.warning(
                "predicted %d frames exceed the largest frame bucket (%d); "
                "the audio tail will be truncated — raise "
                "pipeline.frame_buckets or split the text", total, t_bucket,
            )
        return enc, frames, t_bucket

    def _fused_frame_budget(self, lengths: np.ndarray) -> int:
        """Host-side frame-budget estimate for the fused path (static per
        (P, T) bucket pair, so the jit cache stays tiny)."""
        factor = self.config.vae.down_factor
        est = int(lengths.max()) * self.fused_frames_per_phoneme
        return pick_bucket(
            round_up_to_multiple(max(est, factor), factor),
            self.frame_buckets,
        )

    def fused_bucket_pairs(
        self, max_phonemes: Optional[int] = None
    ) -> list:
        """Every (phoneme-bucket, frame-bucket) executable pair the fused
        path can resolve to for utterances up to ``max_phonemes`` ids —
        the exact jit-cache keys, enumerated by walking every reachable
        length through :meth:`_fused_frame_budget`'s arithmetic."""
        max_p = max_phonemes or self.phoneme_buckets[-1]
        pairs = set()
        for length in range(1, max_p + 1):
            p_bucket = pick_bucket(length, self.phoneme_buckets)
            t_bucket = self._fused_frame_budget(np.asarray([length]))
            pairs.add((p_bucket, t_bucket))
        return sorted(pairs)

    def warmup_fused(
        self,
        max_phonemes: Optional[int] = None,
        pcm16: bool = False,
        temperature: float = 1.0,
        batch_sizes: Sequence[int] = (1,),
    ) -> int:
        """Compile every feasible fused-path executable at the given batch
        sizes before traffic.

        A fused dispatch is keyed by (batch, phoneme-bucket, frame-bucket);
        warming only one pair (e.g. with a short probe sentence) leaves the
        first live request in any other pair paying the full compile —
        minutes on remote-compile backends. This drives the jitted
        ``_fused`` directly with synthetic ids at each reachable pair
        (utterance CONTENT never keys the cache, only padded shapes),
        exactly mirroring :meth:`synthesize`'s host path so the cache keys
        match. Returns the number of executables compiled.

        ``batch_sizes`` defaults to ``(1,)`` — the serving batcher routes
        ONLY single-utterance groups through the fused path (multi-row
        groups take the two-stage executables, which serve.py warms per
        batch bucket). Callers dispatching batched ``synthesize(...,
        fused=True)`` themselves should pass their batch sizes here.
        """
        pairs = self.fused_bucket_pairs(max_phonemes)
        packed = self.packed_fetch and self._mesh is None
        for b in batch_sizes:
            for p_bucket, t_bucket in pairs:
                ids_np = np.full((b, p_bucket), self.vocab.pad_id, np.int32)
                lengths_np = np.full((b,), p_bucket, np.int32)
                if packed:
                    # Warm the variant synthesize() actually dispatches
                    # (the packed wire format is its own jit cache entry).
                    req = pack_fused_request(
                        ids_np, lengths_np, 0, temperature
                    )
                    out = self._fused_packed(
                        self.params, jnp.asarray(req),
                        total_frames=t_bucket,
                        use_postnet=self.use_postnet,
                        upsample=self.upsample, pcm16=pcm16,
                    )
                else:
                    ids_dev, lengths_dev, _ = self._device_batch(
                        ids_np, lengths_np
                    )
                    out = self._fused(
                        self.params, ids_dev, lengths_dev,
                        self._next_seed(0),
                        total_frames=t_bucket, temperature=temperature,
                        use_postnet=self.use_postnet, upsample=self.upsample,
                        pcm16=pcm16,
                    )
                _force_done(out)
        return len(pairs) * len(batch_sizes)

    def warmup_batched(
        self,
        batch_sizes: Sequence[int],
        pcm16: bool = False,
        temperature: float = 1.0,
        max_frames_per_phoneme: int = 24,
    ) -> int:
        """Compile the two-stage batched executables before traffic.

        Stage A is keyed by (batch, phoneme-bucket); stage B by (batch,
        phoneme-bucket, frame-bucket) — the encoder output's phoneme dim
        rides into stage B, so a short warmup probe sentence leaves every
        other combination paying its first compile on a live request
        (minutes on remote-compile backends). This drives the jitted
        stages directly with synthetic ids at every combination whose
        frame bucket is plausibly reachable: T ≤ P × ``max_frames_per_
        phoneme`` (LJSpeech speech runs ~6-7 frames per phoneme; 24 is
        far past any trained model's rate). A pathological prediction
        outside the band still works — it just pays its compile then.

        Returns the number of executables compiled. Cost: one compile
        each (~0.4 s warm on a real chip; the first of the process pays
        the backend session floor) — for the production ladders and
        batch_sizes=(1,2,4,8) about 220 executables. The AOT serving
        path (serve/export.py) avoids this entirely by pre-lowering.
        """
        n = 0
        for b in batch_sizes:
            stage_a_out = {}
            for p_bucket in self.phoneme_buckets:
                ids_np = np.full((b, p_bucket), self.vocab.pad_id, np.int32)
                lengths_np = np.full((b,), p_bucket, np.int32)
                ids_dev, lengths_dev, _ = self._device_batch(
                    ids_np, lengths_np
                )
                enc, frames, _tot = self._stage_a(
                    self.params, ids_dev, lengths_dev
                )
                stage_a_out[p_bucket] = (enc, frames)
                n += 1
            for p_bucket, (enc, frames) in stage_a_out.items():
                for i, t_bucket in enumerate(self.frame_buckets):
                    # The smallest frame bucket is always reachable (short
                    # predictions clamp up to it), so never skip i == 0.
                    if i and t_bucket > p_bucket * max_frames_per_phoneme:
                        break
                    out = self._stage_b(
                        self.params, enc, frames, self._next_seed(0),
                        total_frames=t_bucket, temperature=temperature,
                        use_postnet=self.use_postnet, upsample=self.upsample,
                        pcm16=pcm16,
                    )
                    _force_done(out)
                    n += 1
        return n

    def synthesize(
        self,
        text: Union[str, Sequence[str]],
        seed: Optional[int] = None,
        temperature: float = 1.0,
        return_mel: bool = False,
        fused: Optional[bool] = None,
        pcm16: bool = False,
    ):
        """Text → 22.05 kHz waveform(s).

        Accepts one string or a list; returns a 1-D float32 array (or a list
        of arrays, trimmed to each utterance's true length). This is the
        working version of the reference stub (model.py:17-27) following the
        real pipeline of scripts/synthesize.py:64-220.

        ``fused`` selects the single-dispatch path (frame budget estimated
        from phoneme count; one device round trip per call). Default: fused
        for a single utterance (latency-bound), two-stage for batches (the
        measured frame bucket keeps batch compute tight).

        ``pcm16`` quantizes to int16 ON DEVICE (same truncation as the
        serving layer's host conversion): halves the device→host fetch and
        skips the host quantize pass — the serving transfer format.
        """
        single = isinstance(text, str)
        texts = [text] if single else list(text)
        if fused is None:
            fused = len(texts) == 1

        seed_int = self._next_seed_int(seed)
        seed_dev = jnp.asarray(seed_int, jnp.int32)
        deficit_np = None
        audio_np = None  # set by the packed branches (single-transfer reply)
        if (fused and self.packed_fetch and not return_mel
                and self._mesh is None):
            # Single-transfer wire format: ONE upload, ONE fetch (see
            # _fused_packed_fn). Mesh batches keep the sharded path;
            # return_mel keeps the multi-array fetch (mel dominates it).
            ids_np, lengths = self._encode_texts(texts)
            t_bucket = self._fused_frame_budget(lengths)
            req = pack_fused_request(ids_np, lengths, seed_int, temperature)
            reply = self._fused_packed(
                self.params, jnp.asarray(req), total_frames=t_bucket,
                use_postnet=self.use_postnet, upsample=self.upsample,
                pcm16=pcm16,
            )
            audio_np, n_frames, deficit_np = unpack_fused_reply(
                jax.device_get(reply), pcm16
            )
            mel_np = None
            self._count_overflows(deficit_np[: len(texts)])
        elif fused:
            ids_np, lengths = self._encode_texts(texts)
            t_bucket = self._fused_frame_budget(lengths)
            ids_dev, lengths_dev, _ = self._device_batch(ids_np, lengths)
            audio, mel, n_frames_arr, deficit = self._fused(
                self.params, ids_dev, lengths_dev,
                seed_dev, total_frames=t_bucket,
                temperature=temperature, use_postnet=self.use_postnet,
                upsample=self.upsample,
                pcm16=pcm16,
            )
        else:
            enc, frames, t_bucket = self._run_stage_a(texts)
            audio, mel, n_frames_arr = self._stage_b(
                self.params, enc, frames, seed_dev,
                total_frames=t_bucket, temperature=temperature,
                use_postnet=self.use_postnet, upsample=self.upsample,
                pcm16=pcm16,
            )
            deficit = None

        hop = self.config.hifigan.total_upsample  # samples per mel frame
        if audio_np is None:
            # ONE batched device→host fetch: separate np.asarray calls each
            # pay the full per-transfer round trip on tunneled backends. The
            # fused path's overflow deficit rides the same fetch
            # (observability must not cost an extra round trip).
            fetch = [audio, n_frames_arr]
            if return_mel:
                fetch.append(mel)
            if deficit is not None:
                fetch.append(deficit)
            fetched = jax.device_get(tuple(fetch))
            audio_np, n_frames = fetched[0], fetched[1]
            mel_np = fetched[2] if return_mel else None
            if deficit is not None:
                deficit_np = fetched[-1]
                self._count_overflows(deficit_np[: len(texts)])
        n_frames = n_frames.astype(np.int64)
        audio_np = np.asarray(
            audio_np, np.int16 if pcm16 else np.float32
        )
        # [:len(texts)] drops mesh pad-duplicate rows (no-op off-mesh).
        outs = [
            a[: int(n) * hop]
            for a, n in zip(audio_np[: len(texts)], n_frames)
        ]
        mels = (
            [m[: int(n)] for m, n in zip(mel_np[: len(texts)], n_frames)]
            if return_mel else None
        )
        if deficit_np is not None:
            # Quality guard (fused_overflow_tolerance): rows compressed
            # beyond the tolerated fraction of their PREDICTED frames are
            # redone on the two-stage path with true durations — the fused
            # path never ships speech faster than the tolerance.
            redo = self._overflow_fallback_rows(
                deficit_np[: len(texts)], t_bucket
            )
            if redo:
                r_outs, r_mels = self._two_stage_rows(
                    [texts[i] for i in redo], seed_dev, temperature,
                    pcm16, return_mel,
                )
                for j, i in enumerate(redo):
                    outs[i] = r_outs[j]
                    if mels is not None:
                        mels[i] = r_mels[j]
        if return_mel:
            return (outs[0], mels[0]) if single else (outs, mels)
        return outs[0] if single else outs

    def _overflow_fallback_rows(self, deficit: np.ndarray,
                                t_bucket: int) -> list:
        """Row indices whose fused-path compression exceeded the tolerance:
        ``deficit`` is predicted − budget (≥ 0), so the compressed-away
        fraction of the prediction is deficit / (deficit + budget)."""
        tol = self.fused_overflow_tolerance
        if tol is None:
            return []
        deficit = np.asarray(deficit, np.int64)
        frac = deficit / np.maximum(deficit + t_bucket, 1)
        rows = np.nonzero(frac > tol)[0].tolist()
        if rows:
            self.fused_fallback_count += len(rows)
            logger.info(
                "fused overflow beyond tolerance (%.0f%%) on %d row(s); "
                "re-synthesized on the two-stage path (%d fallbacks total)",
                100 * tol, len(rows), self.fused_fallback_count,
            )
        return rows

    def _two_stage_rows(self, texts, seed_dev, temperature, pcm16,
                        return_mel):
        """Two-stage synthesis of a row subset (the overflow-guard redo
        path): returns (audio rows, mel rows or None) trimmed to true
        lengths."""
        enc, frames, t_bucket = self._run_stage_a(texts)
        audio, mel, n_arr = self._stage_b(
            self.params, enc, frames, seed_dev,
            total_frames=t_bucket, temperature=temperature,
            use_postnet=self.use_postnet, upsample=self.upsample,
            pcm16=pcm16,
        )
        fetch = (audio, n_arr, mel) if return_mel else (audio, n_arr)
        got = jax.device_get(fetch)
        hop = self.config.hifigan.total_upsample
        n_frames = got[1].astype(np.int64)
        audio_np = np.asarray(got[0], np.int16 if pcm16 else np.float32)
        outs = [
            a[: int(n) * hop]
            for a, n in zip(audio_np[: len(texts)], n_frames)
        ]
        mels = (
            [m[: int(n)] for m, n in zip(got[2][: len(texts)], n_frames)]
            if return_mel else None
        )
        return outs, mels

    def _batched_dispatch(
        self,
        texts: Sequence[str],
        seed: Optional[int] = None,
        temperature: float = 1.0,
        pcm16: bool = False,
    ):
        """The two-stage batched path WITHOUT the final device→host fetch:
        returns an opaque handle for :meth:`_batched_collect`. Lets a
        serving loop dispatch batch N+1 while batch N's audio is still in
        flight to the host (serve/batcher.py). ``synthesize(fused=False)``
        is dispatch+collect back to back. (The packed single-transfer
        reply is fused-path-only — see the note on :meth:`_stage_b_fn`.)"""
        enc, frames, t_bucket = self._run_stage_a(texts)
        audio, _mel, n_frames_arr = self._stage_b(
            self.params, enc, frames, self._next_seed(seed),
            total_frames=t_bucket, temperature=temperature,
            use_postnet=self.use_postnet, upsample=self.upsample,
            pcm16=pcm16,
        )
        # pcm16 travels IN the handle: a collect with a mismatched flag
        # would reinterpret int16 PCM as float32 (full-scale noise).
        return audio, n_frames_arr, len(texts), pcm16

    def _batched_collect(self, disp):
        """Fetch + trim a :meth:`_batched_dispatch` handle → list of 1-D
        waveforms (row order preserved)."""
        audio, n_frames_arr, n, pcm16 = disp
        hop = self.config.hifigan.total_upsample
        audio_np, n_frames = jax.device_get((audio, n_frames_arr))
        n_frames = np.asarray(n_frames).astype(np.int64)
        audio_np = np.asarray(audio_np, np.int16 if pcm16 else np.float32)
        return [
            a[: int(k) * hop] for a, k in zip(audio_np[:n], n_frames[:n])
        ]

    def synthesize_mel(
        self,
        text: Union[str, Sequence[str]],
        seed: Optional[int] = None,
        temperature: float = 1.0,
    ):
        """Text → log-mel [T, n_mels] (acoustic model only)."""
        single = isinstance(text, str)
        texts = [text] if single else list(text)
        enc, frames, t_bucket = self._run_stage_a(texts)
        mel, n_frames_arr = self._stage_b_mel(
            self.params, enc, frames, self._next_seed(seed),
            total_frames=t_bucket, temperature=temperature,
            use_postnet=self.use_postnet, upsample=self.upsample,
        )
        mel_np, n_frames = jax.device_get((mel, n_frames_arr))
        n_frames = n_frames.astype(np.int64)
        outs = [
            m[: int(n)] for m, n in zip(mel_np[: len(texts)], n_frames)
        ]
        return outs[0] if single else outs

    def vocode(self, mel) -> np.ndarray:
        """Log-mel → waveform. Accepts time-major [T, n_mels] / [B, T,
        n_mels] or reference layout [n_mels, T] / [B, n_mels, T].

        Device-resident mels stay on device (no host bounce): layout and
        dtype normalization happen per input type (a non-f32 device mel
        casts ON DEVICE — otherwise it would key a second executable on
        dtype, or fail outright for f64 on TPU)."""
        if isinstance(mel, jax.Array):
            if mel.dtype != jnp.float32:
                mel = mel.astype(jnp.float32)
        else:
            mel = np.asarray(mel, np.float32)
        squeeze = mel.ndim == 2
        if squeeze:
            mel = mel[None]
        mel = mel_time_major(mel, self.config.hifigan.in_channels)
        audio = self._vocode(
            self.params, jnp.asarray(mel)
        )
        audio_np = np.asarray(audio, np.float32)
        return audio_np[0] if squeeze else audio_np

    def vocode_streaming(
        self,
        mel,
        chunk_frames: int = 256,
        context_frames: Optional[int] = None,
        pcm16: bool = False,
    ):
        """Log-mel → waveform as a stream of chunks, O(chunk) device memory.

        Yields ``chunk_frames * 256`` samples at a time (last chunk
        shorter); the concatenation equals :meth:`vocode` of the full mel
        **sample-exactly** — each chunk is computed from a window carrying
        ``context_frames`` of real context per side (default: the
        generator's receptive-field radius,
        :func:`~iris_tts_tpu.models.hifigan.receptive_radius_frames`), and
        windows touching the true mel boundaries are aligned to them so the
        layer zero-padding matches the full pass. The network being fully
        convolutional makes every sample mathematically identical to the
        full pass: bit-identical on CPU; on TPU backends the window-shaped
        executable may order float reductions differently than the
        full-shape one, so samples agree to float ulp (~3e-7 relative,
        measured). Pinned by tests/test_stream_vocode.py.

        Every chunk position reuses one fixed-shape executable, so
        arbitrarily long mels vocode in bounded device memory without
        recompiles — the vocoder-level complement of the sentence-level
        :meth:`stream` (and the fix for the reference's
        filter-long-audio-out approach, SURVEY.md §5). ``pcm16`` quantizes
        on device and halves the transfer, as in :meth:`synthesize`.
        """
        mel = np.asarray(mel, np.float32)
        if mel.ndim != 2:
            raise ValueError("vocode_streaming takes one [T, n_mels] mel")
        mel = mel_time_major(mel, self.config.hifigan.in_channels)
        t = mel.shape[0]
        if t == 0:
            return
        up = self.config.hifigan.total_upsample
        if context_frames is None:
            from iris_tts_tpu.models.hifigan import receptive_radius_frames

            context_frames = receptive_radius_frames(self.config.hifigan)
        window = chunk_frames + 2 * context_frames
        if t <= window:
            # Too short to split: one exact whole-mel dispatch.
            audio = self.vocode(mel)
            yield host_pcm16(audio) if pcm16 else audio
            return
        from iris_tts_tpu.models.hifigan import iter_stream_windows

        chunk_samples = chunk_frames * up
        # Window plan (boundary alignment + slice clamping) is shared with
        # the AOT path — hifigan.iter_stream_windows holds the arithmetic
        # the bit-exactness contract depends on.
        for a, b, w0, start_f, start_cl_f in iter_stream_windows(
            t, chunk_frames, context_frames
        ):
            block = self._vocode_window(
                self.params,
                jnp.asarray(mel[w0 : w0 + window])[None],
                jnp.asarray(start_cl_f * up, jnp.int32),
                chunk_samples=chunk_samples,
                pcm16=pcm16,
            )
            block_np = np.asarray(jax.device_get(block))[0]
            off = (start_f - start_cl_f) * up
            yield block_np[off : off + (b - a) * up]

    def vocode_sharded(
        self,
        mel,
        mesh=None,
        chunk_frames: Optional[int] = None,
        context_frames: Optional[int] = None,
        pcm16: bool = False,
        chunk_multiple: int = 32,
    ) -> np.ndarray:
        """Log-mel → waveform, the TIME axis split across a device mesh.

        Sequence parallelism for one long utterance: the mel is cut into
        one receptive-field-overlap window per device (the exact-streaming
        plan of :meth:`vocode_streaming` with ``chunk ≈ T / n_devices``),
        every device vocodes its window in parallel, and the kept chunks
        are reassembled — **sample-identical to** :meth:`vocode` of the
        full mel, by the same fully-convolutional argument (pinned in
        tests/test_parallel.py). Latency for a single long utterance
        scales ~1/D where batching cannot help (batch size is 1); the
        overlap overhead is ``2·context/chunk`` extra compute (~6% for 8
        devices on a 60 s utterance).

        ``mesh`` defaults to the serving mesh installed by
        :meth:`use_mesh`; the window axis is sharded over *all* mesh axes
        (temporal sharding is embarrassingly parallel, so data/model axes
        both serve as window lanes). Falls back to :meth:`vocode` when the
        mel is too short to split or only one device is available.

        Executables are shared across mel lengths in bands: the per-device
        chunk quantizes UP to a ``chunk_multiple`` (so the chunk — a static
        slice size — changes only every ``n_dev·chunk_multiple`` frames of
        T), the traced mel zero-pads to the next chunk boundary, and window
        offsets are traced data, never shapes. The pad region is never
        read: the plan's clamp guarantee keeps every window inside the true
        ``T`` frames, so the output stays sample-identical to the full
        pass. First compiles take minutes on remote-compile backends —
        without banding, a 60.0 s then a 60.1 s utterance would compile
        twice. The chunk quantum (not a whole-T pad) keeps mid-length mels
        on the sharded path: inflating the chunk to a large T band would
        push ``window ≥ T`` and silently fall back to the single-device
        pass, forfeiting the ~1/D latency this method exists for.
        """
        if mesh is None:
            mesh = self._mesh
        mel = np.asarray(mel, np.float32)
        squeeze = mel.ndim == 2
        if squeeze:
            mel = mel[None]
        mel = mel_time_major(mel, self.config.hifigan.in_channels)
        t = mel.shape[1]
        n_dev = 1 if mesh is None else len(mesh.devices.flat)
        up = self.config.hifigan.total_upsample
        from iris_tts_tpu.models.hifigan import (
            iter_stream_windows,
            receptive_radius_frames,
        )

        if context_frames is None:
            context_frames = receptive_radius_frames(self.config.hifigan)
        chunk = chunk_frames or round_up_to_multiple(
            -(-t // n_dev), max(1, chunk_multiple)
        )
        window = chunk + 2 * context_frames
        if n_dev == 1 or t <= window:
            audio = self.vocode(mel if not squeeze else mel[0])
            return host_pcm16(audio) if pcm16 else audio
        plan = list(iter_stream_windows(t, chunk, context_frames))
        # Fewer windows than devices (short mel / explicit chunk_frames):
        # idle lanes recompute the last window; their output is dropped at
        # reassembly. len(plan) = ceil(t/chunk) ≤ n_dev by construction
        # when chunk defaults to ceil(t/n_dev) rounded up.
        if len(plan) > n_dev:
            raise ValueError(
                f"chunk_frames={chunk} yields {len(plan)} windows for "
                f"{n_dev} devices; use chunk_frames >= ceil(T/n_devices)"
            )
        padded = plan + [plan[-1]] * (n_dev - len(plan))
        # ONE executable per chunk value: the traced shape is always
        # chunk·n_dev (≥ t by the guard above; padding to a mere multiple
        # of chunk would still compile up to n_dev shapes per band).
        t_pad = chunk * n_dev
        if t_pad > t:
            mel = np.concatenate(
                [mel, np.zeros((mel.shape[0], t_pad - t, mel.shape[2]),
                               np.float32)], axis=1,
            )
        out = self._vocode_sp(
            self.params,
            jnp.asarray(mel),
            jnp.asarray([p[2] for p in padded], jnp.int32),
            jnp.asarray([p[4] for p in padded], jnp.int32),
            mesh=mesh,
            chunk_frames=chunk,
            window_frames=window,
            pcm16=pcm16,
        )
        out_np = np.asarray(jax.device_get(out))  # [B, n_dev*chunk*up]
        chunk_samples = chunk * up
        pieces = []
        for i, (a, b, _w0, start_f, start_cl_f) in enumerate(plan):
            blk = out_np[:, i * chunk_samples : (i + 1) * chunk_samples]
            off = (start_f - start_cl_f) * up
            pieces.append(blk[:, off : off + (b - a) * up])
        audio = np.concatenate(pieces, axis=1)
        return audio[0] if squeeze else audio

    def _chunk_long_text(self, text: str, max_phonemes: int) -> list:
        """Sentence-pack ``text`` into <= ``max_phonemes``-id chunks (the
        shared frontend policy — text/frontend.py:chunk_text_by_phonemes)."""
        from iris_tts_tpu.text.frontend import chunk_text_by_phonemes

        return chunk_text_by_phonemes(
            self.text_processor, self.vocab, text, max_phonemes
        )

    def synthesize_long(
        self,
        text: str,
        seed: Optional[int] = None,
        temperature: float = 1.0,
        gap_ms: float = 120.0,
        max_phonemes: Optional[int] = None,
    ) -> np.ndarray:
        """Long-form text → one waveform, without bucket truncation.

        ``synthesize`` truncates input past the largest phoneme bucket
        (with a warning); this splits the text at sentence boundaries
        (word boundaries as a last resort), synthesizes the chunks as one
        batch, and joins them with ``gap_ms`` of silence. New functionality
        beyond the reference single-utterance entry point
        (scripts/synthesize.py:64-220).
        """
        if max_phonemes is None:
            max_phonemes = self.phoneme_buckets[-1]
        chunks = self._chunk_long_text(text, max_phonemes)
        if not chunks:
            return np.zeros(0, np.float32)
        if len(chunks) == 1:
            return self.synthesize(
                chunks[0], seed=seed, temperature=temperature
            )
        outs = self.synthesize(
            chunks, seed=seed, temperature=temperature, fused=False
        )
        return self.join_chunks(outs, gap_ms=gap_ms)

    def join_chunks(self, outs: Sequence[np.ndarray],
                    gap_ms: float = 120.0) -> np.ndarray:
        """Concatenate chunk waveforms with ``gap_ms`` of silence between
        them (shared join policy: :func:`iris_tts_tpu.data.join_wave_chunks`,
        used by :meth:`synthesize_long`, the serving batcher, and the AOT
        serving path)."""
        from iris_tts_tpu.data.audio_io import join_wave_chunks

        return join_wave_chunks(
            outs, gap_ms, self.config.audio.sample_rate
        )

    def stream(
        self,
        text: str,
        seed: Optional[int] = None,
        temperature: float = 1.0,
        gap_ms: float = 120.0,
        max_phonemes: Optional[int] = None,
        pcm16: bool = False,
        vocode_chunk_frames: Optional[int] = None,
    ):
        """Incremental synthesis: yields waveform pieces (audio chunks
        interleaved with ``gap_ms`` silence) as they are computed.

        The library-API twin of the HTTP ``/synthesize_stream`` endpoint
        (serve/server.py): the first sentence chunk dispatches alone so
        time-to-first-audio is one small dispatch, then the remaining
        chunks follow. Concatenating everything yielded equals
        :meth:`synthesize_long` except that chunks here use per-chunk
        derived seeds (chunk i gets ``seed + i``) so the stream is
        reproducible chunk by chunk.

        ``vocode_chunk_frames`` streams *within* each sentence too: the
        acoustic stages produce the sentence mel, then audio flows in
        ``vocode_chunk_frames``-frame pieces via :meth:`vocode_streaming`
        (exact — the pieces concatenate to the full vocoder pass). First
        audio then costs the acoustic dispatch plus ONE small vocoder
        window instead of the whole fused synthesis, which wins when
        sentences are long; for short sentences the extra per-chunk
        dispatch round trips make the default whole-sentence mode faster.
        """
        if max_phonemes is None:
            max_phonemes = self.phoneme_buckets[-1]
        chunks = self._chunk_long_text(text, max_phonemes)
        if not chunks:
            return
        base = None if seed is None else int(seed)
        gap = np.zeros(
            int(round(gap_ms / 1000.0 * self.config.audio.sample_rate)),
            np.int16 if pcm16 else np.float32,
        )
        if vocode_chunk_frames is not None:
            for i, chunk in enumerate(chunks):
                if i:
                    yield gap
                mel = self.synthesize_mel(
                    chunk,
                    seed=None if base is None else base + i,
                    temperature=temperature,
                )
                yield from self.vocode_streaming(
                    mel, chunk_frames=vocode_chunk_frames, pcm16=pcm16
                )
            return

        # One-chunk lookahead FROM THE SECOND CHUNK ON: chunk i+1 is
        # dispatched (async) before chunk i's device→host fetch, so the
        # device computes the next sentence while the consumer plays the
        # current one. The FIRST chunk is collected before any lookahead —
        # time-to-first-audio must never wait on chunk 2's (possibly
        # cold-bucket compile) dispatch. Outputs are identical to the
        # sequential path — only the overlap changes.
        def dispatch(i, chunk):
            ids_np, lengths = self._encode_texts([chunk])
            t_bucket = self._fused_frame_budget(lengths)
            ids_dev, lengths_dev, _ = self._device_batch(ids_np, lengths)
            audio, _mel, n_frames, deficit = self._fused(
                self.params, ids_dev, lengths_dev,
                self._next_seed(None if base is None else base + i),
                total_frames=t_bucket, temperature=temperature,
                use_postnet=self.use_postnet, upsample=self.upsample,
                pcm16=pcm16,
            )
            return audio, n_frames, deficit

        hop = self.config.hifigan.total_upsample
        dtype = np.int16 if pcm16 else np.float32

        def collect(disp):
            audio_np, n_frames, deficit = jax.device_get(disp)
            self._count_overflows(np.asarray(deficit)[:1])
            n = int(np.asarray(n_frames).astype(np.int64)[0])
            return np.asarray(audio_np, dtype)[0][: n * hop]

        yield collect(dispatch(0, chunks[0]))  # TTFA: chunk 0 alone
        pending = None
        err = None
        for i in range(1, len(chunks)):
            try:
                nxt = dispatch(i, chunks[i])
            except Exception as e:  # noqa: BLE001 — flush finished audio
                # A lookahead failure must not swallow the PREVIOUS chunk,
                # whose audio is already computed on device.
                err = e
                break
            if pending is not None:
                yield gap
                yield collect(pending)
            pending = nxt
        if pending is not None:
            yield gap
            yield collect(pending)
        if err is not None:
            raise err

    def synthesize_to_file(
        self, text: str, path: str | Path, seed: Optional[int] = None
    ) -> np.ndarray:
        from iris_tts_tpu.data.audio_io import write_wav

        audio = self.synthesize_long(text, seed=seed)
        write_wav(path, audio, self.config.audio.sample_rate)
        return audio
