from hydranet_tpu.parallel.mesh import make_mesh, batch_sharding, replicated  # noqa: F401
from hydranet_tpu.parallel.train_step import make_train_step, make_eval_step  # noqa: F401
