"""Golden-value parity vs PyTorch (the reference's numerical substrate).

The reference itself can't run here (MONAI absent), but its primitive
semantics can be pinned: conv3d, ConvTranspose3d (the MONAI 'SAME' deconv
parameters), InstanceNorm3d, PReLU, TripletMarginWithDistanceLoss, AdamW's
first step. BASELINE.md's parity bar is voxel-identical within float
tolerance."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from coma_unet_tpu.models.blocks import (
    InstanceNorm,
    conv3d,
    same_padding,
    transposed_padding,
)
from coma_unet_tpu.losses import triplet_loss


def test_conv3d_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 6, 7, 8)).astype(np.float32)
    w = rng.normal(size=(4, 3, 3, 3, 3)).astype(np.float32)
    got = np.asarray(conv3d(jnp.asarray(x), jnp.asarray(w), (1, 1, 1),
                            same_padding((3, 3, 3))))
    want = torch.nn.functional.conv3d(
        torch.from_numpy(x), torch.from_numpy(w), padding=1
    ).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_strided_conv_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 2, 8, 8, 8)).astype(np.float32)
    w = rng.normal(size=(5, 2, 3, 3, 3)).astype(np.float32)
    got = np.asarray(conv3d(jnp.asarray(x), jnp.asarray(w), (2, 2, 2),
                            same_padding((3, 3, 3))))
    want = torch.nn.functional.conv3d(
        torch.from_numpy(x), torch.from_numpy(w), stride=2, padding=1
    ).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_transposed_conv_matches_torch():
    """Our lhs-dilated transposed conv == torch ConvTranspose3d(k=3, s=2,
    p=1, output_padding=1) — the MONAI 'SAME' deconv."""
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 3, 5, 5, 5)).astype(np.float32)
    # torch ConvTranspose weight layout: [Cin, Cout, k, k, k]
    w_t = rng.normal(size=(3, 4, 3, 3, 3)).astype(np.float32)
    want = torch.nn.functional.conv_transpose3d(
        torch.from_numpy(x), torch.from_numpy(w_t), stride=2, padding=1,
        output_padding=1,
    ).numpy()
    # our kernel layout is OIDHW with correlation semantics: flip + transpose
    w_ours = np.flip(w_t, axis=(2, 3, 4)).transpose(1, 0, 2, 3, 4).copy()
    got = np.asarray(conv3d(
        jnp.asarray(x), jnp.asarray(w_ours), (1, 1, 1),
        transposed_padding((3, 3, 3), (2, 2, 2)), lhs_dilation=(2, 2, 2),
    ))
    assert got.shape == want.shape == (1, 4, 10, 10, 10)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_even_kernel_transposed_conv_matches_torch():
    """k=2, s=2 (UNETR deconv) == torch ConvTranspose3d(k=2, s=2)."""
    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 2, 4, 4, 4)).astype(np.float32)
    w_t = rng.normal(size=(2, 3, 2, 2, 2)).astype(np.float32)
    want = torch.nn.functional.conv_transpose3d(
        torch.from_numpy(x), torch.from_numpy(w_t), stride=2
    ).numpy()
    w_ours = np.flip(w_t, axis=(2, 3, 4)).transpose(1, 0, 2, 3, 4).copy()
    got = np.asarray(conv3d(
        jnp.asarray(x), jnp.asarray(w_ours), (1, 1, 1),
        transposed_padding((2, 2, 2), (2, 2, 2)), lhs_dilation=(2, 2, 2),
    ))
    assert got.shape == want.shape == (1, 3, 8, 8, 8)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_instance_norm_matches_torch():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 5, 4, 6, 8)).astype(np.float32) * 3 + 1
    m = InstanceNorm()
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(m.apply(params, jnp.asarray(x)))
    want = torch.nn.functional.instance_norm(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_triplet_loss_matches_torch():
    rng = np.random.default_rng(5)
    a, p, n = (rng.normal(size=(6, 12)).astype(np.float32) for _ in range(3))
    got = float(triplet_loss(jnp.asarray(a), jnp.asarray(p), jnp.asarray(n),
                             margin=1.0))
    crit = torch.nn.TripletMarginWithDistanceLoss(margin=1.0)
    want = float(crit(torch.from_numpy(a), torch.from_numpy(p),
                      torch.from_numpy(n)))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_adamw_first_step_matches_torch():
    """optax adamw(torch defaults) == torch.optim.AdamW on one step."""
    import optax

    rng = np.random.default_rng(6)
    w0 = rng.normal(size=(7,)).astype(np.float32)
    g = rng.normal(size=(7,)).astype(np.float32)

    tx = optax.adamw(1e-3, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01)
    state = tx.init(jnp.asarray(w0))
    upd, _ = tx.update(jnp.asarray(g), state, jnp.asarray(w0))
    ours = np.asarray(jnp.asarray(w0) + upd)

    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.AdamW([wt], lr=1e-3, weight_decay=0.01)
    wt.grad = torch.from_numpy(g.copy())
    opt.step()
    np.testing.assert_allclose(ours, wt.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_rnc_matches_torch_reference_impl():
    """Our vectorized RnC == a literal torch port of the reference loop
    (`criterions.py:607-644`)."""
    from coma_unet_tpu.losses import rnc_loss

    rng = np.random.default_rng(7)
    f = rng.normal(size=(6, 10)).astype(np.float32)
    l = rng.uniform(size=(6, 6)).astype(np.float32)

    features = torch.from_numpy(f)
    labels = torch.from_numpy(l)
    t = 2.0
    label_diffs = (labels[:, None, :] - labels[None, :, :]).abs().sum(-1)
    logits = -(features[:, None, :] - features[None, :, :]).norm(2, dim=-1) / t
    logits_max, _ = torch.max(logits, dim=1, keepdim=True)
    logits = logits - logits_max.detach()
    exp_logits = logits.exp()
    n = logits.shape[0]
    off = (1 - torch.eye(n)).bool()
    logits = logits.masked_select(off).view(n, n - 1)
    exp_logits = exp_logits.masked_select(off).view(n, n - 1)
    label_diffs = label_diffs.masked_select(off).view(n, n - 1)
    want = 0.0
    for k in range(n - 1):
        pos_logits = logits[:, k]
        pos_ld = label_diffs[:, k]
        neg_mask = (label_diffs >= pos_ld.view(-1, 1)).float()
        pos_log_probs = pos_logits - torch.log((neg_mask * exp_logits).sum(-1))
        want += float(-(pos_log_probs / (n * (n - 1))).sum())

    got = float(rnc_loss(jnp.asarray(f), jnp.asarray(l), temperature=t))
    np.testing.assert_allclose(got, want, rtol=1e-4)
