from coma_unet_tpu.infer.sliding_window import (  # noqa: F401
    sliding_window_inference,
    gaussian_importance_map,
    make_infer_fn,
)
