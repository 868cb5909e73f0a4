"""Worker process for the two-process jax.distributed smoke test
(tests/test_multihost.py). Each process: CPU backend with 2 virtual
devices, real jax.distributed bootstrap through multihost_initialize, a
cross-process collective, and a disjoint loader shard of one epoch.

Usage: python tests/_multihost_worker.py <coordinator> <rank> <data_root> <out_json>
"""

import json
import os
import sys


def main():
    coordinator, rank, data_root, out_json = sys.argv[1:5]
    rank = int(rank)

    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2")
    import jax

    # config-level pin beats the sitecustomize-registered remote platform
    jax.config.update("jax_platforms", "cpu")

    from hydranet_tpu.parallel.mesh import multihost_initialize

    multihost_initialize(coordinator_address=coordinator, num_processes=2,
                         process_id=rank)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == rank
    assert len(jax.devices()) == 4  # 2 processes x 2 local devices

    # cross-process collective: global sum of one value per device
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()), ("data",))
    local = np.full((2,), float(rank + 1), np.float32)  # [2] per process
    garr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), local, global_shape=(4,))
    total = jax.jit(jnp.sum,
                    out_shardings=NamedSharding(mesh, P()))(garr)
    # ranks 0, 1 contribute 2*1 + 2*2 = 6
    got = float(np.asarray(jax.device_get(total)))
    assert got == 6.0, got

    # loader shard: each process sees a disjoint half of the epoch
    from hydranet_tpu.config import Config
    from hydranet_tpu.data.dataset import MultitaskDataset
    from hydranet_tpu.data.loader import DataLoader
    from tests.test_hydranet import small_config

    d = small_config().to_dict()
    d["dataloader"]["data_list"] = os.path.join(data_root, "list")
    d["dataloader"]["with_aug"] = False
    cfg = Config.from_dict(d)
    ds = MultitaskDataset(cfg, mode="train")
    loader = DataLoader(ds, batch_size=2, shuffle=True, num_workers=0,
                        seed=7, shard_rank=jax.process_index(),
                        shard_count=jax.process_count())
    paths = []
    for batch in loader:
        paths.extend(batch["src_image_path"])

    with open(out_json, "w") as f:
        json.dump({"rank": rank, "collective_sum": got, "paths": paths}, f)
    print(f"worker {rank} ok")


if __name__ == "__main__":
    main()
