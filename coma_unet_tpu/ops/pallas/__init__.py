from coma_unet_tpu.ops.pallas.conv3d import (  # noqa: F401
    pallas_conv3d,
    pallas_conv3d_supported,
)
