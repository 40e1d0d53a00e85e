"""Contrastive losses (`criterions.py:298-482,579-648`), vectorized for XLA —
the reference's per-rank Python loop in RnC and per-level loops in tCDS /
N-pair become closed-form broadcasted reductions.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def rnc_loss(
    features: jnp.ndarray,
    labels: jnp.ndarray,
    temperature: float = 2.0,
    valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Rank-N-Contrast (Zha et al. 2023; `criterions.py:607-644`).

    Args:
      features: [N, F] embeddings (the final-level projection in the live
        trainer, `attn_unet_data_parallel.py:833-845`).
      labels: [N, L] continuous labels. NOTE: the live trainer passes
        `covars[:, -1]` which, with covars of shape [B, 1, 6], squeezes the
        middle dim — the label is the FULL covariate vector (L=6), so the rank
        distance is the L1 distance over all covariates. We reproduce that
        contract; pass [N, 1] to rank on meta-tau alone.
      valid: optional [N] 0/1 mask. Invalid rows (the loader's wrap-padded
        duplicates) are excluded both as anchors and as ranking candidates,
        so the result EXACTLY equals rnc_loss over the valid subset — the
        reference ranks only the true (possibly partial) batch.

    loss = -1/(m(m-1)) * sum_{i,k} [ logit(i,k)
            - log sum_j 1[d_l(i,j) >= d_l(i,k)] exp(logit(i,j)) ]
    with logit(i,j) = -||f_i - f_j|| / t, diagonal removed, (i,k,j) valid.
    """
    if labels.ndim == 1:
        labels = labels[:, None]
    n = features.shape[0]
    if n < 2:
        # A single sample has no ranking pairs: the normalizer n*(n-1) is 0
        # and the diag-dropped candidate set is empty, so the expression is
        # 0/0 = NaN (the reference's torch loop degenerates the same way).
        # Template-space 216^3 trains at b=1 (HBM) — return a zero with
        # zero gradient instead of poisoning the total (r3 PROBE_216).
        return jnp.zeros((), jnp.float32)
    f = features.astype(jnp.float32)
    l = labels.astype(jnp.float32)

    label_diffs = jnp.sum(jnp.abs(l[:, None, :] - l[None, :, :]), axis=-1)  # [n,n]
    d = jnp.linalg.norm(f[:, None, :] - f[None, :, :] + 1e-12, axis=-1)
    logits = -d / temperature
    # per-row stability shift; cancels exactly in logits - log(denom)
    logits = logits - jax.lax.stop_gradient(jnp.max(logits, axis=1, keepdims=True))
    exp_logits = jnp.exp(logits)

    # remove the diagonal -> [n, n-1] (jit-safe reshape identity)
    def _drop_diag(m):
        return m.reshape(-1)[1:].reshape(n - 1, n + 1)[:, :-1].reshape(n, n - 1)

    logits_nd = _drop_diag(logits)
    exp_nd = _drop_diag(exp_logits)
    ld_nd = _drop_diag(label_diffs)

    # neg_mask[i, k, j] = 1 if label_diff(i,j) >= label_diff(i,k)
    neg_mask = (ld_nd[:, None, :] >= ld_nd[:, :, None]).astype(jnp.float32)
    if valid is None:
        denom = jnp.sum(neg_mask * exp_nd[:, None, :], axis=-1)  # [n, n-1]
        pos_log_probs = logits_nd - jnp.log(denom)
        return -jnp.sum(pos_log_probs) / (n * (n - 1))
    v = valid.reshape(-1).astype(jnp.float32)
    v_nd = _drop_diag(jnp.broadcast_to(v[None, :], (n, n)))  # candidate valid
    w = v[:, None] * v_nd                                    # (anchor, k) valid
    denom = jnp.sum(neg_mask * (exp_nd * v_nd)[:, None, :], axis=-1)
    # whenever w > 0 the j = k term is in denom (ld >= ld, k valid) so
    # denom > 0; jnp.where keeps invalid pairs' grads clean (no nan * 0).
    denom = jnp.where(w > 0, denom, 1.0)
    pos_log_probs = (logits_nd - jnp.log(denom)) * w
    m = jnp.sum(v)
    return -jnp.sum(pos_log_probs) / jnp.maximum(m * (m - 1.0), 1.0)


def triplet_loss(
    anchor: jnp.ndarray,
    positive: jnp.ndarray,
    negative: jnp.ndarray,
    margin: float = 1.0,
    valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """torch `TripletMarginWithDistanceLoss` semantics (pairwise L2 distance,
    mean reduction) — `criterions.py:298-301,320-322`. `valid` restricts the
    mean to the true (non-wrap-padded) samples."""
    eps = 1e-6
    d_ap = jnp.linalg.norm(anchor - positive + eps, axis=-1)
    d_an = jnp.linalg.norm(anchor - negative + eps, axis=-1)
    hinge = jnp.maximum(d_ap - d_an + margin, 0.0)
    if valid is None:
        return jnp.mean(hinge)
    v = valid.reshape(-1).astype(hinge.dtype)
    return jnp.sum(hinge * v) / jnp.maximum(jnp.sum(v), 1.0)


def truncated_cds(
    anchor_projs: Sequence[jnp.ndarray],
    pos_projs: Sequence[jnp.ndarray],
    neg_projs: Sequence[jnp.ndarray],
    weights: Sequence[float],
    margin: float = 1.0,
    valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Truncated Contrastive Deep Supervision (`criterions.py:304-344`):
    sum_i w_i * triplet(anchor_i, pos_i, neg_i) over per-level projections."""
    total = jnp.asarray(0.0, dtype=jnp.float32)
    for w, a, p, ng in zip(weights, anchor_projs, pos_projs, neg_projs):
        total = total + w * triplet_loss(a, p, ng, margin=margin, valid=valid)
    return total


def _cosine(a: jnp.ndarray, b: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    an = a / jnp.maximum(jnp.linalg.norm(a, axis=axis, keepdims=True), 1e-8)
    bn = b / jnp.maximum(jnp.linalg.norm(b, axis=axis, keepdims=True), 1e-8)
    return jnp.sum(an * bn, axis=axis)


def npair_loss(
    anchor: jnp.ndarray,
    pos_template: jnp.ndarray,
    neg_templates: jnp.ndarray,
) -> jnp.ndarray:
    """Template N-pair loss (`criterions.py:369-396`): softmax over cosine
    similarity to the matching abeta-x-quartile template vs the other 7.

    anchor [B, E]; pos_template [E] or [B, E]; neg_templates [M, E]."""
    if pos_template.ndim == 1:
        pos_template = pos_template[None, :]
    pos_sim = _cosine(anchor, pos_template)                         # [B]
    neg_sim = _cosine(anchor[:, None, :], neg_templates[None, :, :])  # [B, M]
    numerator = jnp.exp(pos_sim)
    denominator = numerator + jnp.sum(jnp.exp(neg_sim), axis=-1)
    return jnp.mean(-jnp.log(numerator / denominator))


def cluster_npair_loss(
    anchor_projs: Sequence[jnp.ndarray],
    pos_projs: Sequence[jnp.ndarray],
    neg_projs: Sequence[jnp.ndarray],
    temperature: float = 1.0,
) -> jnp.ndarray:
    """`ClusterNPairLoss` (`criterions.py:437-482`): per-level N-pair with
    multiple negatives. neg_projs[i] is [B, M, F] (M negatives per sample)."""
    total = jnp.asarray(0.0, dtype=jnp.float32)
    for a, p, ng in zip(anchor_projs, pos_projs, neg_projs):
        pos_sim = _cosine(a, p)                           # [B]
        neg_sim = _cosine(a[:, None, :], ng)              # [B, M]
        num = jnp.exp(pos_sim / temperature)
        den = num + jnp.sum(jnp.exp(neg_sim / temperature), axis=-1)
        total = total + jnp.mean(-jnp.log(num / den))
    return total


def heteroscedastic_loss(
    q: jnp.ndarray, q_hat: jnp.ndarray, sigma2: jnp.ndarray
) -> jnp.ndarray:
    """`HeteroscedasticLoss` (`criterions.py:646-648`)."""
    return jnp.mean(jnp.square(q - q_hat) / (2.0 * sigma2) + jnp.log(sigma2))
