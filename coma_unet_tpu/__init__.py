"""CoMA-UNet/TPU — a TPU-native 3D volume-to-volume synthesis framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of CoMA-UNet
(mborhi/CoMA-UNet): MRI -> tau-PET synthesis with a covariate-modulated
attention U-Net ("ContraAttnUNET"), composite ROI-weighted + contrastive
losses, the full voxel/ROI evaluation metric suite, NIfTI data pipelines for
the ADNI / A4 / combined cohorts, sliding-window inference, and data-parallel
training over a `jax.sharding.Mesh`.

Design notes (TPU-first, not a port):
  * Volumes are laid out NCDHW (W on the 128-lane dim): channel counts here
    are tiny (1..32) at full resolution, so channels-last would pad the lane
    dim up to 128x; with W innermost full-res tensors tile exactly.
  * All 36-ROI mask loops from the reference (`criterions.py:181-211`,
    `attn_unet_data_parallel.py:1361-1397`) are reformulated as one-hot /
    segment reductions inside jit.
  * Covariate conditioning (the reconstructed `CondConv` module) is an
    expert-mixture convolution executed as a single grouped conv.
  * Parallelism is expressed as shardings over a device mesh; collectives are
    inserted by XLA (no NCCL/MPI analogue exists or is needed).
"""

__version__ = "0.1.0"

from coma_unet_tpu.config import (  # noqa: F401
    ModelConfig,
    LossConfig,
    TrainConfig,
    DataConfig,
    ExperimentConfig,
    ROI_INDICES,
    ROI_NAMES,
)
