from hydranet_tpu.train.optimizer import cosine_annealing_lr, make_optimizer  # noqa: F401
from hydranet_tpu.train.trainer import HydraTrainer  # noqa: F401
