"""Render the convergence-run metric curves
(artifacts/convergence_metrics.jsonl) to artifacts/convergence_curves.png."""

import json
import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt


def main(path="artifacts/convergence_metrics.jsonl",
         out="artifacts/convergence_curves.png"):
    rows = [json.loads(l) for l in open(path) if l.strip()]
    epochs = [r["epoch"] for r in rows]
    fig, ax = plt.subplots(figsize=(7, 4.2))
    series = [("mIoU", "mIoU"), ("AP50", "det AP50"), ("AP", "det AP"),
              ("lane_f1", "lane F1")]
    for key, label in series:
        vals = [r.get(key) for r in rows]
        if any(v is not None for v in vals):
            ax.plot(epochs, vals, marker="o", label=label)
    ax.set_xlabel("epoch")
    ax.set_ylabel("metric")
    ax.set_ylim(0, 1)
    ax.set_title("Procedural-dataset convergence (small backbone, bs16)")
    ax.grid(True, alpha=0.3)
    ax.legend()
    fig.tight_layout()
    fig.savefig(out, dpi=110)
    print(f"wrote {out}")


if __name__ == "__main__":
    main(*sys.argv[1:])
