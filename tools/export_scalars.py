"""Export TensorBoard scalar curves from a training run to CSV + PNG.

Usage: python tools/export_scalars.py LOGDIR OUTDIR [--tags tag1,tag2,...]

Reads every events.out.tfevents.* under LOGDIR (multiple files from
preemption/resume runs are merged and sorted by step), writes one CSV per
tag plus a combined loss-curve figure — the committable evidence of a
training run (the reference's analogue is its TensorBoard logger output,
fs2/model.py:387-389,524-528).
"""

from __future__ import annotations

import argparse
import csv
from collections import defaultdict
from pathlib import Path


def load_scalars(logdir: Path) -> dict[str, list[tuple[int, float]]]:
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    series: dict[str, dict[int, float]] = defaultdict(dict)
    for f in sorted(logdir.glob("events.out.tfevents.*")):
        acc = EventAccumulator(str(f), size_guidance={"scalars": 0})
        acc.Reload()
        for tag in acc.Tags().get("scalars", []):
            for ev in acc.Scalars(tag):
                # later files win on step collisions (a resume re-logs the
                # step it restarted from)
                series[tag][ev.step] = ev.value
    return {
        tag: sorted(points.items()) for tag, points in series.items()
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("logdir", type=Path)
    ap.add_argument("outdir", type=Path)
    ap.add_argument("--tags", default=None,
                    help="comma-separated tag filter (default: all)")
    args = ap.parse_args()
    args.outdir.mkdir(parents=True, exist_ok=True)

    series = load_scalars(args.logdir)
    if args.tags:
        keep = set(args.tags.split(","))
        series = {t: s for t, s in series.items() if t in keep}
    if not series:
        raise SystemExit(f"no scalar events under {args.logdir}")

    for tag, points in series.items():
        name = tag.replace("/", "_")
        with open(args.outdir / f"{name}.csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["step", "value"])
            w.writerows(points)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    losses = {t: s for t, s in series.items() if t.endswith("_loss")}
    train = sorted(t for t in losses if t.startswith("training/"))
    val = sorted(t for t in losses if t.startswith("validation/"))
    fig, axes = plt.subplots(1, 2, figsize=(14, 5))
    for ax, tags, title in ((axes[0], train, "training"),
                            (axes[1], val, "validation")):
        for tag in tags:
            steps, vals = zip(*losses[tag])
            ax.plot(steps, vals, label=tag.split("/")[1], linewidth=1.2)
        ax.set_yscale("log")
        ax.set_xlabel("step")
        ax.set_ylabel("loss")
        ax.set_title(title)
        ax.legend(fontsize=8)
        ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(args.outdir / "loss_curves.png", dpi=110)
    print(f"wrote {len(series)} scalar series -> {args.outdir}")


if __name__ == "__main__":
    main()
