from coma_unet_tpu.metrics.voxel import voxel_metrics  # noqa: F401
from coma_unet_tpu.metrics.roi import roi_metrics  # noqa: F401
from coma_unet_tpu.metrics.aggregate import (  # noqa: F401
    MetricAccumulator,
    MetricResults,
)
