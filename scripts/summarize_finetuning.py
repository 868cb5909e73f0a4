"""Summarize a fine-tuning convergence run (VERDICT r3 item 8): for each
per-head tuning phase (LANE / DET / SEG), report the phase's own task
metric before vs after, and the drift of the other two task metrics —
the reference's alternating schedule (train.py:441-515) is only "working"
if a head's turn improves its metric without degrading the others.

Reads the per-epoch jsonl written by scripts/train_convergence.py.

Usage: python scripts/summarize_finetuning.py [metrics.jsonl]
"""

from __future__ import annotations

import json
import sys

PHASE_METRIC = {"LANE": "lane_f1", "DET": "AP", "SEG": "mIoU"}
METRICS = ("mIoU", "AP", "lane_f1")


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else \
        "artifacts/convergence_metrics_r4.jsonl"
    rows = [json.loads(ln) for ln in open(src) if ln.strip()]
    if not rows:
        print(f"{src}: empty")
        return
    phases = []  # [(phase, first_idx, last_idx)]
    for i, r in enumerate(rows):
        ph = r.get("phase", "JOINT")
        if phases and phases[-1][0] == ph:
            phases[-1][2] = i
        else:
            phases.append([ph, i, i])

    print(f"{src}: {len(rows)} epochs, "
          f"schedule: " + " -> ".join(
              f"{p}[{a}..{b}]" for p, a, b in phases))
    joint_end = None
    for p, a, b in phases:
        if p == "JOINT":
            joint_end = rows[b]
    if joint_end is not None:
        print("end of JOINT:  " + "  ".join(
            f"{m}={joint_end.get(m, float('nan')):.4f}" for m in METRICS))

    tuning = [x for x in phases if x[0] != "JOINT"]
    if not tuning:
        print("no per-head tuning phases in this run (joint-only)")
        return
    ok = True
    for p, a, b in tuning:
        before = rows[a - 1] if a > 0 else rows[a]
        after = rows[b]
        own = PHASE_METRIC[p]
        d_own = after[own] - before[own]
        others = {m: after[m] - before[m] for m in METRICS if m != own}
        worst = min(others.values())
        # tolerance: 48-scene eval noise is ~±0.005 on each metric (the
        # converged JOINT epochs 37-39 fluctuate that much with no
        # schedule change); a drift inside it is "held", not damage
        verdict = "ok" if (d_own >= -0.005 and worst > -0.01) else "CHECK"
        ok &= verdict == "ok"
        print(f"{p:4s} epochs {rows[a]['epoch']}-{rows[b]['epoch']}: "
              f"{own} {before[own]:.4f} -> {after[own]:.4f} "
              f"({d_own:+.4f}); others drift " +
              ", ".join(f"{m} {d:+.4f}" for m, d in others.items()) +
              f"  [{verdict}]")
    last = rows[-1]
    print("final:         " + "  ".join(
        f"{m}={last.get(m, float('nan')):.4f}" for m in METRICS))
    print("fine-tuning schedule verdict:",
          "each head's turn held or improved its metric without "
          "degrading the others" if ok else
          "see CHECK rows above")


if __name__ == "__main__":
    main()
