"""Duration data analysis: per-phoneme statistics and variability.

Rebuild of /root/reference/investigate_durations.py:27-116: per-phoneme
duration mean/std/CV over the MFA alignments (text histogram instead of
matplotlib — no display dependency).
"""

from __future__ import annotations

import argparse
from collections import defaultdict
from pathlib import Path

import numpy as np

from iris_tts_tpu.config import AudioConfig
from iris_tts_tpu.data.textgrid import durations_to_frames, load_alignments


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--alignment_dir", type=str, default="data/aligned")
    parser.add_argument("--top_k", type=int, default=20)
    args = parser.parse_args()

    audio = AudioConfig()
    alignments = load_alignments(args.alignment_dir)
    if not alignments:
        print(f"no TextGrids found under {args.alignment_dir}")
        return

    per_phone = defaultdict(list)
    all_frames = []
    for phones in alignments.values():
        frames = durations_to_frames(
            phones, audio.sample_rate, audio.hop_length
        )
        for p, f in zip(phones, frames):
            per_phone[p["phone"]].append(int(f))
            all_frames.append(int(f))

    all_frames = np.array(all_frames)
    print(f"{len(alignments)} utterances, {len(all_frames)} phones, "
          f"{len(per_phone)} phone types")
    print(f"global: mean {all_frames.mean():.2f} frames "
          f"({all_frames.mean() * audio.hop_length / audio.sample_rate * 1000:.1f} ms), "
          f"median {np.median(all_frames):.0f}, "
          f"p95 {np.percentile(all_frames, 95):.0f}")

    print(f"\n{'phone':>8} {'n':>7} {'mean':>6} {'std':>6} {'CV':>5}")
    stats = []
    for phone, frames in per_phone.items():
        f = np.array(frames)
        stats.append((phone, len(f), f.mean(), f.std(),
                      f.std() / max(f.mean(), 1e-9)))
    for phone, n, mean, std, cv in sorted(
        stats, key=lambda s: -s[1]
    )[: args.top_k]:
        print(f"{phone:>8} {n:>7} {mean:>6.2f} {std:>6.2f} {cv:>5.2f}")

    # Text histogram of global durations.
    print("\nduration histogram (frames):")
    hist, edges = np.histogram(all_frames, bins=range(0, 32))
    peak = hist.max() or 1
    for count, lo in zip(hist, edges[:-1]):
        bar = "#" * int(50 * count / peak)
        print(f"{lo:>4} | {bar} {count}")


if __name__ == "__main__":
    main()
