"""Render training curves from a run's metrics.jsonl (the counterpart of the
reference's assets/training/*.png README figures).

    python examples/plot_training_curves.py <run_dir> [--outdir docs/demo_run]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("run_dir", help="checkpoints/<run> dir with metrics.jsonl")
    parser.add_argument("--outdir", default="docs/demo_run")
    args = parser.parse_args()
    os.makedirs(args.outdir, exist_ok=True)

    records = [
        json.loads(line)
        for line in open(os.path.join(args.run_dir, "metrics.jsonl"))
    ]

    def series(key):
        pts = [(r["epoch"], r[key]) for r in records if key in r]
        return [p[0] for p in pts], [p[1] for p in pts]

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(12, 4))
    for key, label in [("train/avg_loss", "train"), ("val/avg_loss", "val")]:
        x, y = series(key)
        if x:
            axes[0].plot(x, y, marker="o", ms=3, label=label)
    axes[0].set_xlabel("epoch")
    axes[0].set_ylabel("loss")
    axes[0].set_title("Loss")
    axes[0].legend()
    for key, label in [("train/accuracy", "train"), ("val/accuracy", "val")]:
        x, y = series(key)
        if x:
            axes[1].plot(x, y, marker="o", ms=3, label=label)
    axes[1].set_xlabel("epoch")
    axes[1].set_ylabel("accuracy")
    axes[1].set_title("Speaker-ID accuracy")
    axes[1].legend()
    plt.tight_layout()
    out = os.path.join(args.outdir, "training_curves.png")
    plt.savefig(out, dpi=120)
    print("wrote", out)

    test = [r for r in records if "test/eer" in r]
    if test:
        summary = {
            "final_test_eer": test[-1]["test/eer"],
            "final_test_mindcf": test[-1].get("test/mindcf"),
            "epochs": max(r.get("epoch", 0) for r in records),
        }
        with open(os.path.join(args.outdir, "summary.json"), "w") as f:
            json.dump(summary, f, indent=2)
        print("summary:", summary)


if __name__ == "__main__":
    main()
