from coma_unet_tpu.io.nifti import (  # noqa: F401
    NiftiImage,
    read_nifti,
    write_nifti,
)
from coma_unet_tpu.io.volume import (  # noqa: F401
    load_nifti_vol,
    read_image_with_retry,
    write_tensor_to_nii,
)
