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
from hydranet_tpu.ops.fast_conv import FastConv  # noqa: F401
from hydranet_tpu.ops.fused_upsample_conv import (  # noqa: F401
    upsample2x_reflect_conv3x3,
)
from hydranet_tpu.ops.pallas_conv import (  # noqa: F401
    conv3x3_mxu,
    conv3x3_prepadded,
)
from hydranet_tpu.ops.pallas_conv2 import conv3x3_pad_act  # noqa: F401
