"""Configuration system.

The reference scatters every experimental constant through code (epochs=61 at
`validation.py:714`, lr at `:718`, model params at `:726-740`, criterion
weights at `:123-130`, val/checkpoint cadence at
`attn_unet_data_parallel.py:721-724`, ROI indices repeated in >=6 places) and
selects variants by editing comments. Here every one of those knobs is a typed
dataclass field; experiments are data, not diffs.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Optional, Tuple

# ---------------------------------------------------------------------------
# The 36 Braak-region FreeSurfer ROI indices and names used everywhere in the
# reference (`attn_unet_data_parallel.py:561-605`, `criterions.py:45-47`).
# ---------------------------------------------------------------------------
ROI_INDICES: Tuple[int, ...] = (
    1001, 1006, 1007, 1009, 1015, 1016, 1030, 1034, 1033, 1008, 1025, 1029,
    1031, 1022, 17, 18,
    2001, 2006, 2007, 2009, 2015, 2016, 2030, 2034, 2033, 2008, 2025, 2029,
    2031, 2022, 49, 50, 51, 52, 53, 54,
)

ROI_NAMES: Tuple[str, ...] = (
    "ctx-lh-bankssts", "ctx-lh-entorhinal", "ctx-lh-fusiform",
    "ctx-lh-inferiortemporal", "ctx-lh-middletemporal",
    "ctx-lh-parahippocampal", "ctx-lh-superiortemporal",
    "ctx-lh-transversetemporal", "ctx-lh-temporalpole",
    "ctx-lh-inferiorparietal", "ctx-lh-precuneus", "ctx-lh-superiorparietal",
    "ctx-lh-supramarginal", "ctx-lh-postcentral",
    "Left-Hippocampus", "Left-Amygdala",
    "ctx-rh-bankssts", "ctx-rh-entorhinal", "ctx-rh-fusiform",
    "ctx-rh-inferiortemporal", "ctx-rh-middletemporal",
    "ctx-rh-parahippocampal", "ctx-rh-superiortemporal",
    "ctx-rh-transversetemporal", "ctx-rh-temporalpole",
    "ctx-rh-inferiorparietal", "ctx-rh-precuneus", "ctx-rh-superiorparietal",
    "ctx-rh-supramarginal", "ctx-rh-postcentral",
    "Right-Thalamus-Proper", "Right-Caudate", "Right-Putamen",
    "Right-Pallidum", "Right-Hippocampus", "Right-Amygdala",
)

ROI_INDEX_TO_NAME = dict(zip(ROI_INDICES, ROI_NAMES))
ROI_NAME_TO_INDEX = dict(zip(ROI_NAMES, ROI_INDICES))

# Template-space ROI indices used when `-template_space` is passed
# (`validation.py:66-68`): Yeo-7 network labels 1..8.
TEMPLATE_ROI_INDICES: Tuple[int, ...] = tuple(range(1, 9))

# Hardcoded holdout subject denylist (`data_util.py:39-44`).
DEFAULT_HOLDOUT_IDS: Tuple[str, ...] = ()


@dataclass(frozen=True)
class ModelConfig:
    """ContraAttnUNET architecture (`validation.py:727`,
    `attn_unet_data_parallel.py:503-693`)."""

    spatial_dims: int = 3
    in_channels: int = 1
    out_channels: int = 1
    channels: Tuple[int, ...] = (32, 64, 128, 256, 512)
    strides: Tuple[int, ...] = (2, 2, 2, 2, 2)
    kernel_size: int = 3
    up_kernel_size: int = 3
    dropout: float = 0.0
    # Covariate conditioning ("CondConv" reconstruction, SURVEY §2.9):
    conditional: bool = True
    num_covars: int = 6          # [abeta, age, sex, edu, cog, meta_tau]
    block_num_covars: int = 5    # ConvBlocks see covars[..., :5] (ref :209)
    num_experts: int = 8         # expert-mixture size (ref :304)
    film: bool = True            # also apply FiLM scale-shift conditioning
    # Contrastive heads:
    latent_spaces: Tuple[int, ...] = (2048,) * 5
    # Modulator head (dynamic prompts + UQ painting, ref :630-658):
    with_modulator: bool = True
    prompt_shape: Tuple[int, int, int] = (128, 128, 128)
    # Norm/act. The reference (MONAI attentionunet) uses BatchNorm+ReLU in
    # ConvBlocks; instance norm is the TPU-friendly default at batch<=8 and
    # avoids cross-replica sync. "batch" is supported for strict parity.
    norm: str = "instance"       # "instance" | "batch" | "none"
    # Mixed precision: bfloat16 activations/matmuls, float32 params+norms.
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"
    # Pallas direct-conv kernel for stride-1 small-channel convs (bypasses
    # XLA's layout-padded conv path; see ops/pallas/conv3d.py):
    pallas_convs: bool = True
    # Run the 64^3 level in the packed (D-pairs-on-lanes) layout with the
    # strided/transposed/packed Pallas kernels (ops/pallas/conv3d_strided.py).
    # Requires pallas_convs; independent knob so the two Pallas generations
    # can be measured and debugged separately.
    packed_level: bool = True
    # Remat (rematerialize per-block activations to trade FLOPs for HBM —
    # required at 128^3: XLA's conv layout padding multiplies stored
    # activations up to 128x for 1-channel tensors, so storing them all OOMs):
    remat: bool = True

    @property
    def depth(self) -> int:
        return len(self.channels)


@dataclass(frozen=True)
class LossConfig:
    """Composite loss assembly (`validation.py:123-155`)."""

    roi_weight: float = 225.0          # native space (template space: 1.0)
    gen_weight: float = 1.0
    reg_weight: float = 0.0            # lambda_2 (pred-space contrastive; dead)
    ds_reg_weight: float = 1.0         # lambda_1 (tCDS / RnC slot)
    rnc: bool = True                   # `-rnc`: RnCLoss in the tCDS slot
    rnc_temperature: float = 2.0
    voxel_wise: bool = False
    scale_factor: float = 360.0
    # tCDS per-level weights: 5 * normalize([0,1,4,9,16]) (`validation.py:139`)
    cds_weights: Tuple[float, ...] = tuple(
        5.0 * w / sum((0.0, 1.0, 4.0, 9.0, 16.0))
        for w in (0.0, 1.0, 4.0, 9.0, 16.0)
    )
    triplet_margin: float = 1.0


@dataclass(frozen=True)
class TrainConfig:
    """Training loop hyperparameters (`run.sh:13`, `validation.py:714-718`,
    `attn_unet_data_parallel.py:721-737`)."""

    epochs: int = 61
    lr: float = 1e-3                   # combined driver uses 1e-4
    batch_size: int = 2
    weight_decay: float = 0.01         # torch AdamW default
    grad_acc: int = 1
    val_iter: int = 5
    overfit_val_iter: int = 10
    checkpoint_iter: int = 5
    # ReduceLROnPlateau equivalents (`attn_unet_data_parallel.py:737`):
    plateau_patience: int = 5
    plateau_factor: float = 0.1
    seed: int = 0
    # Parallelism:
    data_parallel: int = 1             # size of the 'data' mesh axis
    spatial_parallel: int = 1          # size of the 'spatial' mesh axis
    # Adaptive ROI weight recomputation from val MAPE (ref :983-991):
    adaptive_roi_weights: bool = True


@dataclass(frozen=True)
class DataConfig:
    """Dataset/pipeline options (SURVEY §2.2-2.3)."""

    splits_dir: str = ""
    covariate_csv: str = ""
    quartile_csv: str = ""
    fold: int = 4
    volume_shape: Tuple[int, int, int] = (128, 128, 128)
    template_space: bool = False       # -> pad to 216^3 unless resize
    resize: bool = True                # 2mm isotropic nearest-neighbor
    smoothing: bool = False            # FWHM-2 Gaussian on tau target
    contrastive: bool = True           # triplet/cluster sampling
    mode: str = "cluster"              # 'contrastive' | 'cluster'
    mri_file_type: Optional[str] = None
    tau_file_type: Optional[str] = None
    holdout_ids: Tuple[str, ...] = DEFAULT_HOLDOUT_IDS
    # ROI template NIfTI for the voxel-wise loss weight grid
    # (`data_util.load_template`, `criterions.py:135-144`); empty -> the
    # first training sample's ROI mask is used instead.
    roi_template_path: str = ""
    prefetch: int = 2
    num_workers: int = 4
    shuffle: bool = True


@dataclass(frozen=True)
class ExperimentConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    data: DataConfig = field(default_factory=DataConfig)
    save_path: str = "results"
    description: str = ""
    model_type: str = "ContraAttnUNET"

    def normalized(self) -> "ExperimentConfig":
        """Reconcile coupled geometry knobs (the reference hardcodes these
        relationships across files):

        * template space pads volumes to 216^3 (`VolumeDataset.py:121-126`,
          `validation.py:66-68`) — applied when `volume_shape` was left at
          the native-space default;
        * the modulator's dynamic prompts must match the input spatial dims
          (`models/contra.py` raises otherwise), so `model.prompt_shape`
          follows `data.volume_shape`.
        """
        data = self.data
        if data.template_space and tuple(data.volume_shape) == (128, 128, 128):
            data = dataclasses.replace(data, volume_shape=(216, 216, 216))
        model = self.model
        if tuple(model.prompt_shape) != tuple(data.volume_shape):
            model = dataclasses.replace(
                model, prompt_shape=tuple(data.volume_shape)
            )
        if model is self.model and data is self.data:
            return self
        return dataclasses.replace(self, model=model, data=data)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, text: str) -> "ExperimentConfig":
        raw = json.loads(text)
        return cls(
            model=_from_dict(ModelConfig, raw.get("model", {})),
            loss=_from_dict(LossConfig, raw.get("loss", {})),
            train=_from_dict(TrainConfig, raw.get("train", {})),
            data=_from_dict(DataConfig, raw.get("data", {})),
            **{
                k: raw[k]
                for k in ("save_path", "description", "model_type")
                if k in raw
            },
        )


def _from_dict(cls: Any, raw: dict) -> Any:
    names = {f.name for f in dataclasses.fields(cls)}
    kwargs = {}
    for k, v in raw.items():
        if k not in names:
            continue
        kwargs[k] = tuple(v) if isinstance(v, list) else v
    return cls(**kwargs)
