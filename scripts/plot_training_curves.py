"""Render loss curves from the per-stage metrics.csv files of a
train_full_pipeline run into one PNG per stage (evidence artifacts).

Usage:
    python scripts/plot_training_curves.py --run outputs/full_run_r04 \
        --out docs/evidence_r04
"""

from __future__ import annotations

import argparse
import csv
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def read_metrics(path: Path):
    """metrics.csv (step,name,value,wall_time) → {name: [(step, value)]}."""
    series = defaultdict(list)
    with open(path) as f:
        for row in csv.DictReader(f):
            try:
                series[row["name"]].append(
                    (int(row["step"]), float(row["value"]))
                )
            except (KeyError, ValueError):
                continue
    return series


def plot_stage(csv_path: Path, dest: Path, title: str) -> bool:
    """Render one stage's metrics.csv as a log-scale curve PNG at dest.

    Returns False (and writes nothing) when the csv is missing or empty.
    """
    if not csv_path.exists():
        return False
    series = read_metrics(csv_path)
    if not series:
        return False

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 4))
    for name, pts in sorted(series.items()):
        pts.sort()
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        ax.plot(xs, ys, label=name, linewidth=1.2)
    ax.set_xlabel("step")
    ax.set_ylabel("value")
    ax.set_yscale("log")
    ax.set_title(title)
    ax.legend(fontsize=7, ncol=2)
    ax.grid(True, alpha=0.3)
    fig.tight_layout()
    dest.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(dest, dpi=110)
    plt.close(fig)
    return True


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--run", type=Path, required=True)
    ap.add_argument("--out", type=Path, required=True)
    args = ap.parse_args()

    args.out.mkdir(parents=True, exist_ok=True)
    made = 0
    for stage in ("encoder", "vae", "postnet", "hifigan_gan"):
        csv_path = args.run / stage / "metrics.csv"
        dest = args.out / f"curves_{stage}.png"
        if plot_stage(csv_path, dest, f"{stage} training metrics"):
            print(f"wrote {dest}")
            made += 1
        else:
            print(f"skip {stage}: no data in {csv_path}", file=sys.stderr)
    if not made:
        sys.exit("no metrics found")


if __name__ == "__main__":
    main()
