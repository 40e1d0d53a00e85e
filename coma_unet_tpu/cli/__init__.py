from coma_unet_tpu.cli.main import main, build_parser  # noqa: F401
