"""Quartile-template loading for the N-pair decoder-supervision loss
(`criterions.py:355-435`): 8 mean-tau template volumes (abeta+/- x quartile
1-4) loaded, 2 mm-resampled, flattened to embedding vectors; at train time a
sample's matching template is the positive and the other 7 are negatives."""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import numpy as np

from coma_unet_tpu.io.volume import load_nifti_vol
from coma_unet_tpu.ops.preprocess import center_pad_crop


def load_quartile_templates(
    pos_paths: Sequence[str],
    neg_paths: Sequence[str],
    target: Sequence[int] = (128, 128, 128),
    resize: bool = True,
) -> Dict[str, np.ndarray]:
    """Returns {'pos': [4, V], 'neg': [4, V]} flattened template embeddings
    (`NPairLoss.load_templates`, `criterions.py:408-424`)."""

    def _load(paths):
        vols = []
        for p in paths:
            v = load_nifti_vol(p, resize=resize)
            v = center_pad_crop(v, tuple(target))
            vols.append(v.reshape(-1).astype(np.float32))
        return np.stack(vols)

    return {"pos": _load(pos_paths), "neg": _load(neg_paths)}


def select_npair_templates(
    templates: Dict[str, np.ndarray], abeta: float, quartile: int
) -> Tuple[np.ndarray, np.ndarray]:
    """(positive template [V], negatives [7, V]) for one sample
    (`criterions.py:369-396`): the matching abeta x quartile template is the
    positive; the other 3 same-abeta quartiles + all 4 opposite-abeta
    templates are negatives."""
    q = int(quartile) - 1  # quartiles are 1-indexed
    own, other = (
        ("pos", "neg") if abeta == 1 else ("neg", "pos")
    )
    pos = templates[own][q]
    negs = np.concatenate(
        [np.delete(templates[own], q, axis=0), templates[other]], axis=0
    )
    return pos, negs
