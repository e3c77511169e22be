"""Two-stage pipeline-parallel serving: text→mel and mel→waveform on
disjoint device groups.

Stage 1 is the fused path's text→mel core (encoder + duration + budget
compression + VAE + PostNet — ``TTSPipeline._fused_mel_fn``); stage 2 is
the HiFiGAN vocoder. Each stage's parameters live ONLY on its own group
(the vocoder subtree never occupies a stage-1 chip and vice versa), and
microbatches stream through both groups: while group B vocodes batch N,
group A is already synthesizing batch N+1's mel. JAX's async dispatch
provides the overlap — computations enqueued on disjoint devices execute
concurrently; the host only enqueues and collects behind a bounded
in-flight window. The inter-stage handoff is one ``jax.device_put`` of
the [B, T, n_mels] mel to the stage-2 sharding (D2D over ICI on real
meshes), ~256× smaller than the waveform it becomes.

When does this beat data parallelism? For these model sizes it usually
does not — replicating everything and sharding the batch (``use_mesh``)
is the throughput default, and the docstring of ``vocode_sharded`` covers
the long-single-utterance case. Pipeline parallelism pays when a stage's
params/activations approach per-chip HBM (a much larger vocoder bank or
codec stack), when the stages want different dtypes/compile options, or
when a dedicated group must stay hot for mel-only work while another
vocodes. The layout is available and *correct* here — equality with the
single-group fused path is pinned in tests/test_parallel.py — so scaling
past those limits is a config change, not a rewrite.

The reference has no parallelism of any kind (SURVEY.md §2.4); this
module, like the rest of ``parallel/``, is new TPU-native capability.
"""

from __future__ import annotations

from collections import deque
from math import lcm
from typing import Optional, Sequence, Union

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


class PipelineParallelSynthesizer:
    """Run a :class:`~iris_tts_tpu.models.pipeline.TTSPipeline` with its
    two synthesis stages pipelined across two device groups.

    ``split`` = number of devices in the stage-1 (text→mel) group; the
    rest vocode. Within each group the batch rows shard over the group's
    devices (data parallelism inside the pipeline stage), so the layout
    composes dp×pp. Defaults to an even split; skew it toward the vocoder
    for the production ladder, where HiFiGAN is ~2/3 of the FLOPs.
    """

    def __init__(
        self,
        pipe,
        devices: Optional[Sequence[jax.Device]] = None,
        split: Optional[int] = None,
        inflight: int = 2,
    ):
        devices = list(devices if devices is not None else jax.devices())
        if len(devices) < 2:
            raise ValueError(
                f"pipeline parallelism needs >=2 devices, got {len(devices)}"
            )
        k = split if split is not None else len(devices) // 2
        if not 1 <= k < len(devices):
            raise ValueError(f"split={k} must leave both groups non-empty")
        self.pipe = pipe
        self.inflight = max(1, inflight)
        self._mesh_a = Mesh(np.asarray(devices[:k]), ("data",))
        self._mesh_b = Mesh(np.asarray(devices[k:]), ("data",))
        self._rows_a = NamedSharding(self._mesh_a, PartitionSpec("data"))
        self._rows_b = NamedSharding(self._mesh_b, PartitionSpec("data"))
        rep_a = NamedSharding(self._mesh_a, PartitionSpec())
        rep_b = NamedSharding(self._mesh_b, PartitionSpec())
        # Stage-exclusive placement: each group holds only its own params.
        self._params_a = jax.device_put(
            {k_: v for k_, v in pipe.params.items() if k_ != "hifigan"},
            rep_a,
        )
        self._params_b = jax.device_put(
            {"hifigan": pipe.params["hifigan"]}, rep_b
        )
        self._batch_multiple = lcm(k, len(devices) - k)
        self._mel = jax.jit(
            pipe._fused_mel_fn,
            static_argnames=("total_frames", "use_postnet", "upsample"),
        )

        def _voc_fn(params, mel, *, pcm16):
            audio = pipe._vocode_fn(params, mel)
            return pipe._maybe_pcm16(audio, pcm16)

        self._voc = jax.jit(_voc_fn, static_argnames=("pcm16",))

    # -- per-batch dispatch/collect (the batcher's lookahead shape) --------

    def _dispatch(self, texts, seed, temperature, pcm16):
        pipe = self.pipe
        ids_np, lengths_np = pipe._encode_texts(texts)
        t_bucket = pipe._fused_frame_budget(lengths_np)
        n = len(texts)
        pad = -n % self._batch_multiple
        if pad:
            ids_np = np.concatenate(
                [ids_np, np.repeat(ids_np[-1:], pad, axis=0)]
            )
            lengths_np = np.concatenate(
                [lengths_np, np.repeat(lengths_np[-1:], pad)]
            )
        # One host→group transfer per array (device_put shards numpy
        # directly; going through jnp.asarray first would pay an extra
        # host→default-device round trip per microbatch).
        ids = jax.device_put(ids_np, self._rows_a)
        lengths = jax.device_put(lengths_np, self._rows_a)
        mel, n_frames, deficit = self._mel(
            self._params_a, ids, lengths,
            pipe._next_seed(seed), total_frames=t_bucket,
            temperature=temperature, use_postnet=pipe.use_postnet,
            upsample=pipe.upsample,
        )
        # Inter-stage handoff: reshard the mel onto the vocoder group.
        mel_b = jax.device_put(mel, self._rows_b)
        audio = self._voc(self._params_b, mel_b, pcm16=pcm16)
        return audio, n_frames, deficit, n

    def _collect(self, disp, pcm16):
        audio, n_frames_arr, deficit, n = disp
        audio_np, n_frames, deficit_np = jax.device_get(
            (audio, n_frames_arr, deficit)
        )
        self.pipe._count_overflows(np.asarray(deficit_np)[:n])
        hop = self.pipe.config.hifigan.total_upsample
        n_frames = np.asarray(n_frames).astype(np.int64)
        audio_np = np.asarray(audio_np, np.int16 if pcm16 else np.float32)
        return [
            a[: int(k) * hop] for a, k in zip(audio_np[:n], n_frames[:n])
        ]

    # -- public API ---------------------------------------------------------

    def synthesize(
        self,
        texts: Union[str, Sequence[str]],
        seed: Optional[int] = None,
        temperature: float = 1.0,
        pcm16: bool = False,
    ):
        """One batch through both stages (no pipelining benefit at depth 1;
        use :meth:`synthesize_batches` for streams).

        Accepts one string or a list, matching ``TTSPipeline.synthesize``:
        a bare string returns a single waveform (it is NOT iterated into
        per-character utterances)."""
        single = isinstance(texts, str)
        batch = [texts] if single else list(texts)
        out = self._collect(
            self._dispatch(batch, seed, temperature, pcm16), pcm16
        )
        return out[0] if single else out

    def synthesize_batches(
        self,
        batches: Sequence[Sequence[str]],
        seed: Optional[int] = None,
        temperature: float = 1.0,
        pcm16: bool = False,
    ):
        """Software-pipeline a sequence of text batches; yields one list of
        waveforms per input batch, in order. At most ``inflight`` batches
        are enqueued ahead of the collector, bounding device memory."""
        if isinstance(batches, str):
            # iterating a bare string would synthesize one utterance PER
            # CHARACTER at full model cost
            raise TypeError(
                "synthesize_batches takes a sequence of BATCHES; for one "
                "batch or one utterance use synthesize()"
            )
        q = deque()
        for texts in batches:
            batch = [texts] if isinstance(texts, str) else list(texts)
            if len(q) == self.inflight:
                # collect BEFORE dispatching so at most `inflight` batches
                # are ever live on the devices (the documented memory
                # bound; append-then-collect held inflight+1)
                yield self._collect(q.popleft(), pcm16)
            q.append(self._dispatch(batch, seed, temperature, pcm16))
        while q:
            yield self._collect(q.popleft(), pcm16)
