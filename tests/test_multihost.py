"""Two-process jax.distributed smoke test (CPU backend, subprocess-spawned,
coordinator on localhost): exercises multihost_initialize + a cross-process
collective + DataLoader shard_rank/count end-to-end. The reference's
"distributed" bootstrap is a degenerate world_size=1 NCCL process group
(/root/reference/model/train.py:129-137); this verifies ours actually runs
with two processes."""

import json
import os
import socket
import subprocess
import sys

import pytest

from tests.synth_data import make_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed(tmp_path):
    root = make_dataset(str(tmp_path / "data"), n_train=8, n_valid=2)
    coordinator = f"127.0.0.1:{_free_port()}"

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # the worker pins the cpu platform in code; scrub test-runner leftovers
    env.pop("JAX_PLATFORMS", None)

    procs, outs = [], []
    for rank in range(2):
        out = str(tmp_path / f"rank{rank}.json")
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests",
                                          "_multihost_worker.py"),
             coordinator, str(rank), root, out],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=300)
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log}"

    results = [json.load(open(o)) for o in outs]
    assert all(r["collective_sum"] == 6.0 for r in results)
    shard0 = set(results[0]["paths"])
    shard1 = set(results[1]["paths"])
    # disjoint shards covering the whole 8-image epoch
    assert shard0.isdisjoint(shard1)
    assert len(shard0 | shard1) == 8
