from coma_unet_tpu.runtime.native import (  # noqa: F401
    native_available,
    load_volume_native,
    load_batch_native,
)
