from coma_unet_tpu.models.attention_unet import AttentionUNet, UNetFeatures  # noqa: F401
from coma_unet_tpu.models.contra import ContraAttnUNet, ContraOutputs  # noqa: F401
from coma_unet_tpu.models.blocks import (  # noqa: F401
    AttentionGate,
    CondConvolution,
    ConvBlock,
    Convolution,
    ProjectionHead,
    StackedFusionConvLayers,
    UpBlock,
)
