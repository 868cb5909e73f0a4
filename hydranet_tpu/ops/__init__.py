from hydranet_tpu.ops.common import (  # noqa: F401
    SamePadConv,
    SeparableConvBlock,
    TorchBatchNorm,
    conv_kaiming_init,
    max_pool_same,
    max_pool_torch,
    swish,
    upsample_nearest,
)
