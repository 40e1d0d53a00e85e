from coma_unet_tpu.losses.roi_losses import (  # noqa: F401
    roi_mse,
    roi_rse,
    roi_rrmse,
    make_voxel_weights,
    update_roi_weights,
    update_voxel_weights,
)
from coma_unet_tpu.losses.contrastive import (  # noqa: F401
    rnc_loss,
    triplet_loss,
    truncated_cds,
    npair_loss,
    cluster_npair_loss,
    heteroscedastic_loss,
)
from coma_unet_tpu.losses.weighted import (  # noqa: F401
    weighted_mse,
    weighted_cc,
    weighted_cccl,
    weighted_l1,
)
from coma_unet_tpu.losses.composite import (  # noqa: F401
    GenerativeContrastiveLoss,
    LossOutputs,
)
