from hydranet_tpu.models.regnet import RegNetY, regnet_stage_params  # noqa: F401
from hydranet_tpu.models.anynet import AnyNetXe  # noqa: F401
from hydranet_tpu.models.bifpn import BiFPN, StackBiFPN  # noqa: F401
