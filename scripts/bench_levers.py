"""Cheap-lever sweep on the headline serving bench (VERDICT r4 ask #7:
prove or break the "1173 fps ~= bs128 bound" claim with the free knobs
before believing it's a roofline).

Levers, each a subprocess `python bench.py` cell so every row is exactly
the headline protocol:
  - batch size 96 / 128 (control) / 192 / 256 (HBM permitting);
  - input-buffer donation (HN_DONATE=1 — lets XLA alias the ~0.8 GB
    uint8 frame buffer for intermediates);
  - XLA scheduler/fusion flags (latency-hiding scheduler, aggressive
    fusion knobs) on the best batch.

All cells run HN_RANDOM_INIT=1 on the flagship big-backbone config — the
claim under test is specifically the r3/r4 random-init headline series
(1138.6 -> 1181.9 fps); trained-weights cells live in bench_trained_r5.log.

Prints one line per cell, a summary table, and LEVERS DONE (chain marker).
OOM or flag-rejection cells are recorded as failed, not fatal.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Run order = value order under a deadline: the trained cells can move the
# ACTUAL headline (bench.py serves the committed npz by default), so they
# run first; then the flagship random-init batch levers (the 1173~=bound
# question); flag cells last (each recompiles into a separate cache).
CELLS = [
    ("trained bs128 control", {"TRAINED": "1", "BENCH_BATCH": "128"}),
    ("trained bs192", {"TRAINED": "1", "BENCH_BATCH": "192"}),
    ("trained bs256", {"TRAINED": "1", "BENCH_BATCH": "256"}),
    ("bs128 control", {"BENCH_BATCH": "128"}),
    ("bs192", {"BENCH_BATCH": "192"}),
    ("bs256", {"BENCH_BATCH": "256"}),
    ("bs96", {"BENCH_BATCH": "96"}),
    ("bs128 + donate", {"BENCH_BATCH": "128", "HN_DONATE": "1"}),
    ("bs128 + latency-hiding sched",
     {"BENCH_BATCH": "128",
      "XLA_FLAGS": "--xla_tpu_enable_latency_hiding_scheduler=true"}),
    ("bs128 + async fusion flags",
     {"BENCH_BATCH": "128",
      "XLA_FLAGS": ("--xla_tpu_enable_latency_hiding_scheduler=true "
                    "--xla_tpu_enable_async_collective_fusion=true")}),
]


def run_cell(name, env_extra, timeout_s):
    env_extra = dict(env_extra)
    trained = env_extra.pop("TRAINED", None)
    env = dict(os.environ, HN_RANDOM_INIT="1", **env_extra)
    if trained:
        env.pop("HN_RANDOM_INIT", None)  # serve the committed npz
    # flag cells must not poison the shared compile cache with entries
    # compiled under different XLA options
    if "XLA_FLAGS" in env_extra:
        env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(
            REPO, ".jax_cache_levers")
    try:
        p = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True, text=True, timeout=timeout_s, env=env)
    except subprocess.TimeoutExpired:
        return dict(cell=name, error="timeout")
    line = next((ln for ln in p.stdout.splitlines()
                 if ln.startswith("{") and '"value"' in ln), None)
    if p.returncode != 0 or line is None:
        tail = (p.stderr or p.stdout).strip().splitlines()[-3:]
        return dict(cell=name, error=" / ".join(tail)[-300:])
    d = json.loads(line)
    return dict(cell=name, fps=d["value"],
                p50_frame_ms=_p50(d.get("metric", "")))


def _p50(metric):
    import re

    m = re.search(r"\(([\d.]+) ms/frame\)", metric)
    return float(m.group(1)) if m else None


def main():
    timeout_s = int(os.environ.get("LEVER_CELL_TIMEOUT", "2400"))
    rows = []
    for name, env in CELLS:
        print(f"--- {name} ---", flush=True)
        r = run_cell(name, env, timeout_s)
        rows.append(r)
        print(json.dumps(r), flush=True)

    print("\n| cell | fps | ms/frame p50 |")
    print("|---|---|---|")

    def base_for(cell):  # each series is compared against its own control
        ctrl = ("trained bs128 control" if cell.startswith("trained")
                else "bs128 control")
        return (next((r.get("fps") for r in rows if r["cell"] == ctrl), None),
                ctrl)

    for r in rows:
        if "error" in r:
            print(f"| {r['cell']} | FAILED: {r['error'][:80]} | |")
        else:
            base, ctrl = base_for(r["cell"])
            delta = (f" ({(r['fps'] / base - 1) * 100:+.1f}%)"
                     if base and r["cell"] != ctrl else "")
            print(f"| {r['cell']} | {r['fps']}{delta} | "
                  f"{r.get('p50_frame_ms') or ''} |")
    for series in ("", "trained "):
        good = [r for r in rows if "fps" in r
                and r["cell"].startswith("trained") == bool(series)]
        if good:
            best = max(good, key=lambda r: r["fps"])
            base, _ = base_for(best["cell"])
            print(f"best {series or 'flagship '}cell: {best['cell']} at "
                  f"{best['fps']} fps"
                  + (f" ({(best['fps'] / base - 1) * 100:+.1f}% vs control)"
                     if base else ""))
    print("LEVERS DONE")


if __name__ == "__main__":
    main()
