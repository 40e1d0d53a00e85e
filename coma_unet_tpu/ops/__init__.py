from coma_unet_tpu.ops.roi import (  # noqa: F401
    make_roi_lut,
    compact_roi,
    roi_reduce,
    roi_sums,
    roi_counts,
    paint_roi_values,
    roi_weight_mask,
)
from coma_unet_tpu.ops.ssim import ssim3d  # noqa: F401
from coma_unet_tpu.ops.resize import resize_nearest, resize_linear  # noqa: F401
from coma_unet_tpu.ops.smooth import gaussian_smooth  # noqa: F401
from coma_unet_tpu.ops.preprocess import center_pad_crop  # noqa: F401
