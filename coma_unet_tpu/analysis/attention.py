"""Attention-coefficient export — the reference's only model-introspection
channel (`set_save_attn` -> `ObservableAttentionBlock` psi ->
`data_util.save_attention_coeffs`, `attn_unet_data_parallel.py:147-148,
225-227,375-386`; `data_util.py:796-811`). Here attention maps are already a
first-class model output (`ContraOutputs.attention`), so export is just a
forward pass + NIfTI writes."""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

from coma_unet_tpu.io.volume import write_tensor_to_nii


def export_attention_maps(
    model,
    variables,
    batch,
    save_path: str,
    sample_ids: Optional[Sequence[str]] = None,
    spacing=(2.0, 2.0, 2.0),
) -> list:
    """Run one forward pass and save each level's psi map per sample as
    `<save_path>/<sid>_attn_level{i}.nii`. Returns the written paths."""
    outs = model.apply(
        variables, batch["mri"], batch["covars"], batch.get("roi_loc"),
        batch.get("roi_std"), batch.get("roi_compact"),
        train=False, with_projections=False,
    )
    os.makedirs(save_path, exist_ok=True)
    written = []
    b = batch["mri"].shape[0]
    ids = sample_ids or [f"sample{j}" for j in range(b)]
    for level, psi in enumerate(outs.attention):
        arr = np.asarray(psi, np.float32)  # [B, 1, D, H, W]
        for j in range(b):
            sid = str(ids[j]).replace("/", "_")
            path = os.path.join(save_path, f"{sid}_attn_level{level}.nii")
            write_tensor_to_nii(arr[j], path, spacing=spacing)
            written.append(path)
    return written
