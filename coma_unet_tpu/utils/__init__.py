from coma_unet_tpu.utils.logging import setup_logging  # noqa: F401
