"""Device mesh + sharding helpers.

TPU-native replacement for the reference's distributed story (single-process
NCCL DDP, /root/reference/model/train.py:129-137): data parallelism is
expressed as a 1-D `jax.sharding.Mesh` over the "data" axis; parameters are
replicated, batches are batch-sharded, and XLA's sharded autodiff inserts the
gradient all-reduce (psum over ICI/DCN) — no process-group bootstrap, no
find_unused_parameters, no module unwrapping.

The mesh is created with a trailing unit "model" axis so tensor/pipeline
axes can be added later without changing call sites (SURVEY.md §2.3 notes
TP/PP/SP/EP are deliberately N/A for this CNN workload but the abstraction
must not preclude them).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Tuple[str, ...] = ("data", "model"),
              model_parallel: int = 1) -> Mesh:
    """1-D data-parallel mesh (x unit model axis) over the first
    `n_devices` local devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % model_parallel == 0
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def multihost_initialize(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Multi-host bootstrap: the TPU-native equivalent of the reference's
    torch.distributed.init_process_group (train.py:132-135). On a TPU pod
    slice this is a single jax.distributed.initialize() call with no
    arguments; coordinator discovery comes from the TPU runtime. The
    explicit arguments support non-TPU bootstraps (e.g. the two-process CPU
    smoke test, tests/test_multihost.py). No-op when already initialized or
    single-process."""
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (RuntimeError, ValueError):
        if num_processes and num_processes > 1:
            raise  # an explicit multi-process bootstrap must not fail silently
