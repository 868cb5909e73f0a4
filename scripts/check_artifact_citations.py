"""Docs honesty check: every `artifacts/...` path cited in the committed
docs should exist on disk. The dev VM's restarts have deleted artifact
logs after docs cited them (NOTES.md round-4 session 3); run this before
a round ends and either re-produce the log or annotate the citation.

Usage: python scripts/check_artifact_citations.py  (exit 1 on missing)
"""

from __future__ import annotations

import glob
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = ["README.md", "NOTES.md", "PARITY.md", "deploy/README.md",
        "docs/DESIGN.md", "docs/KNOBS.md"]
# historical logs whose loss is annotated in NOTES.md (round-4 sessions
# 3-4): numbers stand as recorded; the logs were deleted by VM restarts
# after the docs cited them
WAIVED = {
    "artifacts/archive/",
    "artifacts/bench_backward_r3.log",
    "artifacts/r3_hw_chain_v2.log",
    "artifacts/r3_hw_chain_v3.log",
    "artifacts/r3_hw_chain_v8.log",
    "artifacts/r3_post_cache_proof.log",
    # Aug-20 restore (round-4 session 4); chain-v9 step outcomes are
    # recorded in NOTES session-3; the rest are re-produced by chain v12
    # and drop out of this set as they land
    "artifacts/r4_hw_chain_v9.log",
}


def main() -> int:
    pat = re.compile(r"artifacts/[A-Za-z0-9_./-]+")
    missing = set()
    for doc in DOCS:
        p = os.path.join(REPO, doc)
        if not os.path.exists(p):
            continue
        for m in pat.findall(open(p).read()):
            m = m.rstrip(".")
            if m in WAIVED or os.path.exists(os.path.join(REPO, m)):
                continue
            # a citation like `..._r5_*.jpg` names a family; the regex
            # stops at the `*`, leaving a prefix — satisfied if any file
            # matches it
            if glob.glob(os.path.join(REPO, m + "*")):
                continue
            missing.add((doc, m))
    for doc, m in sorted(missing):
        print(f"MISSING: {m}  (cited in {doc})")
    if not missing:
        print("all cited artifacts exist"
              f" ({len(WAIVED)} waived historical logs)")
    return 1 if missing else 0


if __name__ == "__main__":
    sys.exit(main())
