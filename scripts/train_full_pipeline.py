"""One-command four-stage training run: encoder → VAE → PostNet → HiFiGAN
GAN, then assembly, held-out quality evaluation, and a deployable pipeline
artifact.

The reference splits this workflow across four hand-sequenced scripts wired
together by .weights.h5 paths (train_encoder.py → train_vae.py:139-164 →
train_postnet.py:110-133 → synthesize.py:93-169) and has no evaluation
beyond eyeballing logs. This driver runs all four stages IN ONE PROCESS
(each stage's CLI main(), so resume/metrics/mesh behavior is identical to
running them standalone — and on tunneled TPU backends the per-process
compile-service session floor is paid once, not four times), then:

* assembles ``TTSPipeline.from_checkpoints`` exactly like synthesize.py,
* evaluates on the HELD-OUT split: duration MAE (the reference's
  test_trained_encoder.py:243-263 rubric), DTW-aligned MCD/LSD of
  synthesized vs ground-truth mels against a shuffled-utterance control,
  vocoder resynthesis MCD, and writes eval wavs,
* saves the assembled pipeline as one deployable artifact
  (``TTSPipeline.save``), ready for ``scripts/synthesize.py`` /
  ``scripts/serve.py``.

Usage (full run on the corpus generator's output):
    python scripts/make_synthetic_corpus.py --root data_synth --n 600
    python scripts/train_full_pipeline.py \
        --data_root data_synth/LJSpeech-1.1 --alignment_dir data_synth/aligned \
        --cache_dir outputs/synth_cache --output_dir outputs/run1 --bf16
"""

from __future__ import annotations

import argparse
import json
import logging
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

logger = logging.getLogger(__name__)

# stage CLI name → subdirectory the stage writes under --output_dir
STAGE_DIRS = {
    "encoder": "encoder",
    "vae": "vae",
    "postnet": "postnet",
    "hifigan": "hifigan_gan",
}


def write_stage_evidence(
    out_root: Path,
    evidence_dir: Path | None,
    stage: str,
    seconds: float,
    partial: bool = False,
) -> None:
    """Snapshot one stage's metrics + config + loss curve into the evidence
    directory THE MOMENT the stage finishes (or is preempted), so a run cut
    at a session boundary still leaves committable proof for every stage
    that completed — evidence must not only materialize at the very end of
    a multi-hour run."""
    if evidence_dir is None:
        return
    stage_dir = STAGE_DIRS.get(stage, stage)
    src = out_root / stage_dir
    dst = evidence_dir / "stages" / stage_dir
    dst.mkdir(parents=True, exist_ok=True)
    snapshot: dict = {
        "stage": stage_dir,
        "seconds": round(seconds, 1),
        "partial": partial,
    }
    mcsv = src / "metrics.csv"
    if mcsv.exists():
        shutil.copy2(mcsv, dst / "metrics.csv")
        from scripts.plot_training_curves import plot_stage, read_metrics

        series = read_metrics(mcsv)
        last: dict = {}
        last_step = None
        for name, pts in series.items():
            pts.sort()
            if pts:
                last[name] = round(pts[-1][1], 6)
                last_step = max(last_step or 0, pts[-1][0])
        snapshot["final_metrics"] = dict(sorted(last.items()))
        snapshot["last_step"] = last_step
        try:
            plot_stage(mcsv, dst / "curves.png", f"{stage_dir} training metrics")
        except Exception as e:  # a plot failure must not kill the run
            logger.warning("curve plot for %s failed: %s", stage_dir, e)
    for cfg in src.glob("config_*.json"):
        shutil.copy2(cfg, dst / cfg.name)
    (dst / "snapshot.json").write_text(json.dumps(snapshot, indent=2))
    logger.info("stage evidence written to %s", dst)


def run_stage(
    name: str,
    main_fn,
    argv: list[str],
    out_root: Path,
    evidence_dir: Path | None = None,
) -> float:
    """Run one stage CLI in-process with the given argv; returns seconds."""
    logger.info("=== stage %s: %s ===", name, " ".join(argv))
    saved_argv = sys.argv
    t0 = time.time()
    try:
        sys.argv = [f"train_{name}.py"] + argv
        main_fn()
    finally:
        sys.argv = saved_argv
    dt = time.time() - t0
    from iris_tts_tpu.train.loop import was_preempted

    if was_preempted():
        # The stage checkpointed and stopped on SIGTERM/SIGINT. Running the
        # NEXT stage against a half-trained upstream would silently produce
        # a "complete" but wrong run — stop the whole driver instead; a
        # rerun with the same --output_dir resumes every stage in place.
        write_stage_evidence(out_root, evidence_dir, name, dt, partial=True)
        logger.warning(
            "=== stage %s preempted after %.1fs — stopping the pipeline "
            "(rerun with the same --output_dir to resume) ===", name, dt,
        )
        sys.exit(75)  # EX_TEMPFAIL
    write_stage_evidence(out_root, evidence_dir, name, dt)
    logger.info("=== stage %s done in %.1fs ===", name, dt)
    return dt


def evaluate(args, out_root: Path) -> dict:
    """Held-out evaluation of the assembled pipeline + artifact export."""
    import jax
    import jax.numpy as jnp

    from iris_tts_tpu.data.audio_io import load_audio, write_wav
    from iris_tts_tpu.data.batching import BucketedBatcher
    from iris_tts_tpu.data.ljspeech import LJSpeechVAEDataset
    from iris_tts_tpu.models.pipeline import TTSPipeline
    from iris_tts_tpu.ops.stft import log_mel_spectrogram
    from iris_tts_tpu.train import make_duration_eval_step
    from iris_tts_tpu.train.checkpoint import CheckpointManager
    from iris_tts_tpu.utils import quality_report
    from iris_tts_tpu.utils.metrics import MetricsWriter

    eval_dir = out_root / "eval"
    eval_dir.mkdir(parents=True, exist_ok=True)
    wav_dir = eval_dir / "wavs"
    wav_dir.mkdir(exist_ok=True)

    pipe = TTSPipeline.from_checkpoints(
        out_root / "encoder" / "checkpoints",
        out_root / "vae" / "checkpoints",
        postnet_checkpoint=out_root / "postnet" / "checkpoints",
        hifigan_gan_checkpoint=(
            None if args.skip_gan else out_root / "hifigan_gan" / "gen"
        ),
        vocab_path=Path(args.cache_dir) / "phoneme_vocab.json",
    )
    cfg = pipe.config

    val_ds = LJSpeechVAEDataset(
        args.data_root, args.alignment_dir, split="val",
        cache_dir=args.cache_dir, audio=cfg.audio,
    )
    n_eval = min(args.eval_samples, len(val_ds))
    logger.info("evaluating on %d held-out utterances", n_eval)

    # --- duration MAE over the whole val split (reference rubric:
    # test_trained_encoder.py:243-263 — MAE < 5 frames = excellent) --------
    dur_eval = jax.jit(make_duration_eval_step(cfg))
    val_batcher = BucketedBatcher(val_ds, 8, with_mel=False, seed=0)
    maes, weights = [], []
    for batch in val_batcher.epoch(0):
        b = {k: jnp.asarray(v) for k, v in batch.items()}
        m = dur_eval(
            {"encoder": pipe.params["encoder"],
             "duration": pipe.params["duration"]}, b,
        )
        maes.append(float(m["duration_mae_frames"]))
        weights.append(int(np.asarray(batch["phoneme_mask"]).sum()))
    duration_mae = float(np.average(maes, weights=weights)) if maes else None

    # --- per-utterance synthesis quality: MCD/LSD vs ground truth, against
    # a shuffled-utterance control (the test_convergence.py gate, at corpus
    # scale on the held-out split) -----------------------------------------
    per_sample = MetricsWriter(eval_dir / "quality.csv")
    rows = []
    for i in range(n_eval):
        gt = val_ds[i]
        other = val_ds[(i + n_eval // 2 + 1) % len(val_ds)]
        synth_mel = pipe.synthesize_mel(gt.text, seed=0, temperature=0.0)
        q = quality_report(synth_mel, gt.mel, align="dtw")
        qc = quality_report(synth_mel, other.mel, align="dtw")
        row = {
            "mcd_db": q["mcd_db"], "lsd_db": q["lsd_db"],
            "control_mcd_db": qc["mcd_db"], "control_lsd_db": qc["lsd_db"],
            "gt_frames": gt.mel.shape[0], "synth_frames": len(synth_mel),
        }
        per_sample.write(i, row)
        rows.append(row)
        logger.info(
            "val[%d] %s: MCD %.2f dB (control %.2f), LSD %.2f dB",
            i, gt.file_id, q["mcd_db"], qc["mcd_db"], q["lsd_db"],
        )

    # --- vocoder resynthesis: HiFiGAN on GROUND-TRUTH mel, scored as
    # mel(resynth) vs gt mel (frame-aligned, no DTW) ------------------------
    resynth_mcd = []
    for i in range(min(4, n_eval)):
        gt = val_ds[i]
        audio_r = pipe.vocode(gt.mel)
        mel_r = np.asarray(
            log_mel_spectrogram(jnp.asarray(audio_r), cfg.audio)
        )[: gt.mel.shape[0]]
        q = quality_report(mel_r, gt.mel[: mel_r.shape[0]], align="trim")
        resynth_mcd.append(q["mcd_db"])
        write_wav(wav_dir / f"resynth_{gt.file_id}.wav",
                  audio_r, cfg.audio.sample_rate)
        # the ground-truth audio next to it, for listening comparison
        gt_audio = load_audio(
            Path(args.data_root) / "wavs" / f"{gt.file_id}.wav",
            cfg.audio.sample_rate,
        )
        write_wav(wav_dir / f"ref_{gt.file_id}.wav",
                  gt_audio, cfg.audio.sample_rate)
        per_sample.write(i, {"resynth_mcd_db": q["mcd_db"]})

    # --- end-to-end wavs (text → audio through the full stack) ------------
    for i in range(min(4, n_eval)):
        gt = val_ds[i]
        audio = pipe.synthesize(gt.text, seed=0, temperature=args.eval_temperature)
        write_wav(wav_dir / f"e2e_{gt.file_id}.wav",
                  audio, cfg.audio.sample_rate)
    per_sample.close()

    mcd = float(np.mean([r["mcd_db"] for r in rows])) if rows else None
    mcd_ctrl = (
        float(np.mean([r["control_mcd_db"] for r in rows])) if rows else None
    )
    lsd = float(np.mean([r["lsd_db"] for r in rows])) if rows else None
    lsd_ctrl = (
        float(np.mean([r["control_lsd_db"] for r in rows])) if rows else None
    )
    summary = {
        "val_utterances": len(val_ds),
        "eval_samples": n_eval,
        "duration_mae_frames": duration_mae,
        "mcd_db": mcd,
        "control_mcd_db": mcd_ctrl,
        "lsd_db": lsd,
        "control_lsd_db": lsd_ctrl,
        "resynth_mcd_db": (
            float(np.mean(resynth_mcd)) if resynth_mcd else None
        ),
        "mcd_margin_db": (
            None if mcd is None else round(mcd_ctrl - mcd, 3)
        ),
    }
    (eval_dir / "summary.json").write_text(json.dumps(summary, indent=2))
    logger.info("eval summary: %s", summary)

    # --- deployable artifact ------------------------------------------------
    artifact = out_root / "pipeline_artifact"
    pipe.save(artifact, half=args.artifact_half)
    logger.info("pipeline artifact saved to %s%s", artifact,
                " (float16 params)" if args.artifact_half else "")

    # --- post-export smoke-eval: reload the artifact from disk and re-score
    # held-out utterances against the pre-save model's numbers. The save/load
    # tree-equality test can't catch a meta/vocab export bug that changes the
    # SOUND of the artifact; this can. fp16 artifacts round weights ~1e-4
    # relative, so allow a small MCD drift there.
    tol_db = 0.25 if args.artifact_half else 0.02
    reloaded = TTSPipeline.load(artifact)
    smoke_rows = []
    for i in range(min(3, n_eval)):
        gt = val_ds[i]
        mel_a = reloaded.synthesize_mel(gt.text, seed=0, temperature=0.0)
        q = quality_report(mel_a, gt.mel, align="dtw")
        smoke_rows.append({
            "i": i,
            "mcd_db": round(q["mcd_db"], 4),
            "pre_save_mcd_db": round(rows[i]["mcd_db"], 4),
            "delta_db": round(q["mcd_db"] - rows[i]["mcd_db"], 4),
        })
    max_delta = max(
        (abs(r["delta_db"]) for r in smoke_rows), default=0.0
    )
    summary["artifact_smoke"] = {
        "params_dtype": "float16" if args.artifact_half else "float32",
        "tol_db": tol_db,
        "max_abs_delta_db": round(max_delta, 4),
        "ok": max_delta <= tol_db,
        "samples": smoke_rows,
    }
    if max_delta <= tol_db:
        logger.info(
            "artifact smoke-eval OK: reloaded-artifact MCD within "
            "%.2f dB of pre-save model (max delta %.4f dB)", tol_db, max_delta,
        )
    else:
        logger.error(
            "artifact smoke-eval FAILED: reloaded artifact drifts %.4f dB "
            "MCD from the pre-save model (tol %.2f) — export bug?",
            max_delta, tol_db,
        )
    (eval_dir / "summary.json").write_text(json.dumps(summary, indent=2))
    return summary


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data_root", type=str, default="data_synth/LJSpeech-1.1")
    parser.add_argument("--alignment_dir", type=str, default="data_synth/aligned")
    parser.add_argument("--cache_dir", type=str, default="outputs/synth_cache")
    parser.add_argument("--output_dir", type=str, default="outputs/full_run")
    parser.add_argument("--config", type=str, default=None,
                        help="IrisConfig JSON (default: production config)")
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--encoder_epochs", type=int, default=150)
    parser.add_argument("--encoder_lr", type=float, default=1e-3)
    parser.add_argument("--vae_epochs", type=int, default=300)
    parser.add_argument("--vae_lr", type=float, default=1e-3)
    parser.add_argument("--postnet_epochs", type=int, default=60)
    parser.add_argument("--postnet_lr", type=float, default=1e-3)
    parser.add_argument("--gan_epochs", type=int, default=150)
    parser.add_argument("--gan_lr", type=float, default=2e-4)
    parser.add_argument("--gan_batch", type=int, default=16)
    parser.add_argument("--segment_frames", type=int, default=32)
    parser.add_argument("--disc_width", type=float, default=1.0)
    parser.add_argument("--ema_decay", type=float, default=0.999)
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--mesh", action="store_true")
    parser.add_argument("--eval_samples", type=int, default=16)
    parser.add_argument("--artifact_half", action="store_true",
                        help="store the pipeline artifact's params as "
                        "float16 (half size; ~1e-4 relative rounding)")
    parser.add_argument("--eval_temperature", type=float, default=0.7)
    parser.add_argument("--evidence_dir", type=str, default=None,
                        help="directory that receives per-stage evidence "
                        "(metrics, curves, snapshots) AS EACH STAGE "
                        "COMPLETES, plus the final eval summary/wavs — "
                        "point it at a git-tracked path so a preempted run "
                        "still leaves committable proof")
    parser.add_argument("--release_dir", type=str, default=None,
                        help="also copy the final pipeline artifact here "
                        "(e.g. release/pipeline_artifact)")
    parser.add_argument("--skip_encoder", action="store_true")
    parser.add_argument("--skip_vae", action="store_true")
    parser.add_argument("--skip_postnet", action="store_true")
    parser.add_argument("--skip_gan", action="store_true")
    parser.add_argument("--skip_eval", action="store_true")
    parser.add_argument("--verbose", action="store_true")
    args = parser.parse_args()

    from scripts.common import setup_logging

    setup_logging(args.verbose)
    out_root = Path(args.output_dir)
    out_root.mkdir(parents=True, exist_ok=True)
    evidence_dir = Path(args.evidence_dir) if args.evidence_dir else None
    if evidence_dir:
        evidence_dir.mkdir(parents=True, exist_ok=True)
    timings: dict = {}

    def save_timings() -> None:
        """Progressively persisted so a cut-off run still reports stage
        costs (for budgeting the rerun)."""
        payload = json.dumps(
            {k: round(v, 1) for k, v in timings.items()}, indent=2
        )
        (out_root / "timings.json").write_text(payload)
        if evidence_dir:
            (evidence_dir / "timings.json").write_text(payload)

    common = [
        "--data_root", args.data_root,
        "--alignment_dir", args.alignment_dir,
        "--cache_dir", args.cache_dir,
        "--output_dir", str(out_root),
        "--batch_size", str(args.batch_size),
    ]
    if args.config:
        common += ["--config", args.config]
    if args.bf16:
        common += ["--bf16"]
    if args.mesh:
        common += ["--mesh"]

    if not args.skip_encoder:
        from scripts.train_encoder import main as encoder_main

        timings["encoder_s"] = run_stage("encoder", encoder_main, common + [
            "--num_epochs", str(args.encoder_epochs),
            "--learning_rate", str(args.encoder_lr),
        ], out_root, evidence_dir)
        save_timings()
    if not args.skip_vae:
        from scripts.train_vae import main as vae_main

        timings["vae_s"] = run_stage("vae", vae_main, common + [
            "--num_epochs", str(args.vae_epochs),
            "--learning_rate", str(args.vae_lr),
        ], out_root, evidence_dir)
        save_timings()
    if not args.skip_postnet:
        from scripts.train_postnet import main as postnet_main

        timings["postnet_s"] = run_stage("postnet", postnet_main, common + [
            "--num_epochs", str(args.postnet_epochs),
            "--learning_rate", str(args.postnet_lr),
        ], out_root, evidence_dir)
        save_timings()
    if not args.skip_gan:
        from scripts.train_hifigan import main as gan_main

        gan_common = [a for a in common]
        # GAN uses its own batch size (segments are fixed-shape)
        i = gan_common.index("--batch_size")
        gan_common[i + 1] = str(args.gan_batch)
        timings["gan_s"] = run_stage("hifigan", gan_main, gan_common + [
            "--num_epochs", str(args.gan_epochs),
            "--learning_rate", str(args.gan_lr),
            "--segment_frames", str(args.segment_frames),
            "--disc_width", str(args.disc_width),
            "--ema_decay", str(args.ema_decay),
        ], out_root, evidence_dir)
        save_timings()

    summary = None
    if not args.skip_eval:
        t0 = time.time()
        summary = evaluate(args, out_root)
        timings["eval_s"] = round(time.time() - t0, 1)
        save_timings()
        summary["stage_timings_s"] = {
            k: round(v, 1) for k, v in timings.items()
        }
        (out_root / "eval" / "summary.json").write_text(
            json.dumps(summary, indent=2)
        )
        if evidence_dir:
            # eval evidence: summary, per-utterance quality, listening wavs
            dst = evidence_dir / "eval"
            if dst.exists():
                shutil.rmtree(dst)
            shutil.copytree(out_root / "eval", dst)
            logger.info("eval evidence copied to %s", dst)
        if args.release_dir:
            rel = Path(args.release_dir)
            if rel.exists():
                shutil.rmtree(rel)
            shutil.copytree(out_root / "pipeline_artifact", rel)
            logger.info("release artifact copied to %s", rel)
    logger.info("full pipeline run complete: %s", timings)
    if summary is not None:
        smoke = summary.get("artifact_smoke")
        if smoke is not None and not smoke["ok"]:
            sys.exit(1)


if __name__ == "__main__":
    main()
