"""Embedding analysis — rebuild of `data_util.load_model` (`data_util.py:
585-670`): run volumes through a trained model, take the bottleneck encoder
features (512 x 8^3 in the flagship), and probe how much amyloid-beta status
they encode with a PLS-regression + recursive-feature-elimination pipeline."""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np


def extract_bottleneck_encodings(model, variables, loader) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (X [N, F] bottleneck features flattened, abeta [N])."""
    feats, abetas = [], []
    for batch in loader:
        outs = model.apply(
            variables, batch["mri"], batch["covars"], batch.get("roi_loc"),
            batch.get("roi_std"), batch.get("roi_compact"),
            train=False, with_projections=False,
        )
        enc = np.asarray(outs.encoder[-1], np.float32)
        feats.append(enc.reshape(enc.shape[0], -1))
        abetas.append(np.asarray(batch["abeta"]).reshape(-1))
    return np.concatenate(feats), np.concatenate(abetas)


def probe_abeta_from_embeddings(
    x: np.ndarray,
    abeta: np.ndarray,
    n_components: int = 2,
    n_features: Optional[int] = None,
    seed: int = 0,
) -> Dict[str, float]:
    """PLSRegression + RFE probing (`data_util.py:624-665`): fit PLS on the
    bottleneck features to predict abeta; report r2 and the RFE-selected
    feature count's score. Subsamples features for tractability."""
    from sklearn.cross_decomposition import PLSRegression
    from sklearn.feature_selection import RFE
    from sklearn.linear_model import LinearRegression
    from sklearn.metrics import r2_score
    from sklearn.model_selection import train_test_split

    keep = ~np.isnan(abeta) & (abeta >= 0)
    x, abeta = x[keep], abeta[keep]
    if x.shape[0] < 4:
        return {"r2": float("nan"), "rfe_r2": float("nan")}
    rng = np.random.default_rng(seed)
    if n_features is not None and x.shape[1] > n_features:
        cols = rng.choice(x.shape[1], size=n_features, replace=False)
        x = x[:, cols]
    xtr, xte, ytr, yte = train_test_split(
        x, abeta, test_size=0.25, random_state=seed
    )
    pls = PLSRegression(n_components=min(n_components, xtr.shape[0] - 1))
    pls.fit(xtr, ytr)
    r2 = r2_score(yte, pls.predict(xte))

    rfe_r2 = float("nan")
    if x.shape[1] <= 4096:  # RFE is O(F^2)-ish; keep it tractable
        rfe = RFE(LinearRegression(), n_features_to_select=max(2, x.shape[1] // 4))
        rfe.fit(xtr, ytr)
        rfe_r2 = r2_score(yte, rfe.predict(xte))
    return {"r2": float(r2), "rfe_r2": float(rfe_r2)}


def pca(x: np.ndarray, n_components: int, center: bool = True):
    """The missing `PCA` module's sklearn-compatible behavior with a
    `center=` kwarg (`data_util.py:237`). Returns (components [k, F],
    projected [N, k], explained_variance [k])."""
    x = np.asarray(x, np.float64)
    if center:
        x = x - x.mean(axis=0, keepdims=True)
    u, s, vt = np.linalg.svd(x, full_matrices=False)
    k = min(n_components, vt.shape[0])
    comps = vt[:k]
    proj = x @ comps.T
    ev = (s[:k] ** 2) / max(x.shape[0] - 1, 1)
    return comps, proj, ev
