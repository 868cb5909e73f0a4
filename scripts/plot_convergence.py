"""Render the convergence run's metric curves (VERDICT r2 item 5: "commit
the log + metric curves") from a metrics jsonl to a PNG.

Usage: python scripts/plot_convergence.py [metrics.jsonl] [out.png]
Defaults: artifacts/convergence_metrics_r3b.jsonl ->
          artifacts/convergence_curves_r3b.png
"""

from __future__ import annotations

import json
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

# Validated reference categorical palette (dataviz skill), slots 1-3 in
# fixed order on the light surface.
SURFACE = "#fcfcfb"
TEXT_PRIMARY = "#0b0b0b"
TEXT_SECONDARY = "#52514e"
SERIES = [("mIoU", "#2a78d6"), ("AP", "#eb6834"), ("lane_f1", "#1baf7a")]
LABELS = {"mIoU": "seg mIoU", "AP": "det COCO AP", "lane_f1": "lane F1"}


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else \
        "artifacts/convergence_metrics_r3b.jsonl"
    out = sys.argv[2] if len(sys.argv) > 2 else \
        "artifacts/convergence_curves_r3b.png"
    rows = [json.loads(ln) for ln in open(src) if ln.strip()]
    if not rows:
        raise SystemExit(f"no rows in {src}")
    epochs = [r["epoch"] for r in rows]

    fig, ax = plt.subplots(figsize=(7.2, 4.2), dpi=150)
    fig.patch.set_facecolor(SURFACE)
    ax.set_facecolor(SURFACE)
    for key, color in SERIES:
        ys = [r.get(key) for r in rows]
        ax.plot(epochs, ys, color=color, linewidth=2, label=LABELS[key])
        # direct label at the line end, in the text token (not series color)
        ax.annotate(f"{LABELS[key]}  {ys[-1]:.3f}",
                    (epochs[-1], ys[-1]), textcoords="offset points",
                    xytext=(6, 0), fontsize=8.5, color=TEXT_SECONDARY,
                    va="center")
    ax.set_xlim(min(epochs), max(epochs) + max(3, len(epochs) // 3))
    ax.set_ylim(0, 1)
    ax.set_xlabel("epoch", color=TEXT_SECONDARY, fontsize=9)
    ax.set_ylabel("metric (0-1)", color=TEXT_SECONDARY, fontsize=9)
    ax.set_title("hydranet_tpu joint-training convergence "
                 "(procedural dataset, one v5e chip)",
                 color=TEXT_PRIMARY, fontsize=10, loc="left")
    ax.grid(True, color="#e6e5e1", linewidth=0.7)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color("#c9c8c3")
    ax.tick_params(colors=TEXT_SECONDARY, labelsize=8.5)
    ax.legend(loc="upper left", fontsize=8.5, frameon=False,
              labelcolor=TEXT_PRIMARY)
    fig.tight_layout()
    fig.savefig(out, facecolor=SURFACE)
    print(f"wrote {out} ({len(rows)} epochs)")


if __name__ == "__main__":
    main()
