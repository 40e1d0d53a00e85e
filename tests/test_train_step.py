"""End-to-end jitted train/eval step tests (tiny shapes, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coma_unet_tpu.config import LossConfig
from coma_unet_tpu.models import ContraAttnUNet
from coma_unet_tpu.train import (
    ReduceLROnPlateau,
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
from coma_unet_tpu.train.optim import get_lr, set_lr
from tests.conftest import make_batch


def _make_state(model, batch, rng, lr=1e-3):
    tx = make_optimizer(lr)
    return create_train_state(
        model, tx, rng,
        (batch["mri"], batch["covars"], batch["roi_loc"], batch["roi_std"],
         batch["roi_compact"]),
        {"train": True},
    )


def test_train_step_reduces_loss(tiny_model_config, rng, tiny_batch):
    model = ContraAttnUNet(tiny_model_config)
    state = _make_state(model, tiny_batch, rng)
    step = make_train_step(model, LossConfig(), donate=False)
    roi_w = jnp.full((36,), 225.0)
    losses = []
    s = state
    for i in range(8):
        s, aux = step(s, tiny_batch, roi_w, jax.random.PRNGKey(i))
        losses.append(float(aux["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    assert int(s.step) == 8


def test_train_step_tcds_mode(tiny_model_config, rng):
    batch = make_batch(rng, with_triplet=True)
    model = ContraAttnUNet(tiny_model_config)
    state = _make_state(model, batch, rng)
    cfg = LossConfig(rnc=False, reg_weight=0.1, cds_weights=(0.0, 1.0, 4.0))
    step = make_train_step(model, cfg, donate=False)
    roi_w = jnp.full((36,), 225.0)
    s, aux = step(state, batch, roi_w, rng)
    assert np.isfinite(float(aux["loss"]))
    assert float(aux["tcds_loss"]) >= 0


def test_eval_step(tiny_model_config, rng, tiny_batch):
    model = ContraAttnUNet(tiny_model_config)
    state = _make_state(model, tiny_batch, rng)
    eval_step = make_eval_step(model, num_rois=36)
    pred, vox, roi = eval_step(state, tiny_batch)
    assert pred.shape == tiny_batch["tau"].shape
    assert vox["mae"].shape == (2,)
    assert vox["ssim"].shape == (2,)
    assert roi["mae"].shape == (2, 36)
    assert np.isfinite(np.asarray(vox["mae"])).all()


def test_plateau_scheduler():
    sched = ReduceLROnPlateau(patience=2, factor=0.5)
    lr = 1.0
    lr = sched.step(10.0, lr)
    assert lr == 1.0
    for _ in range(3):  # no improvement for patience+1 epochs
        lr = sched.step(10.0, lr)
    assert lr == 0.5
    lr = sched.step(1.0, lr)  # improvement resets
    assert lr == 0.5


def test_lr_injection(tiny_model_config, rng, tiny_batch):
    model = ContraAttnUNet(tiny_model_config)
    state = _make_state(model, tiny_batch, rng, lr=1e-3)
    assert abs(get_lr(state.opt_state) - 1e-3) < 1e-9
    new_opt_state = set_lr(state.opt_state, 5e-4)
    # functional: the original state is untouched, the returned one carries
    # the new LR
    assert abs(get_lr(state.opt_state) - 1e-3) < 1e-9
    assert abs(get_lr(new_opt_state) - 5e-4) < 1e-9


def test_train_step_padded_batch_grads_match_partial(tiny_model_config, rng):
    """Gradient of a wrap-padded batch (duplicate rows masked by `valid_mask`)
    == gradient of the true partial batch — the reference trains on the true
    partial torch batch (`attn_unet_data_parallel.py:779`); the loader's
    padded duplicates must contribute exactly zero gradient."""
    model = ContraAttnUNet(tiny_model_config)
    true = make_batch(rng, b=4)
    state = _make_state(model, true, rng)
    padded = {
        k: jnp.concatenate([v, v[:2]], axis=0) for k, v in true.items()
    }
    padded["valid_mask"] = jnp.asarray([1, 1, 1, 1, 0, 0], jnp.float32)
    roi_w = jnp.full((36,), 225.0)
    step = make_train_step(model, LossConfig(), donate=False,
                           return_grads=True)
    _, aux_true = step(state, true, roi_w, rng)
    _, aux_pad = step(state, padded, roi_w, rng)
    np.testing.assert_allclose(float(aux_pad["loss"]), float(aux_true["loss"]),
                               rtol=1e-5)
    g1 = jax.tree.leaves(aux_true["grads"])
    g2 = jax.tree.leaves(aux_pad["grads"])
    assert len(g1) == len(g2) and len(g1) > 0
    # tolerances as in test_parallel's DP-grad check: leaves whose gradient
    # is pure cancellation residue (~1e-5 from +/- summands over every voxel)
    # legitimately differ in f32 between the b=4 and b=6 reduction orders;
    # a sign/value error on any meaningful leaf still fails through rtol.
    for a, b in zip(g1, g2):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(
            a, b, rtol=1e-3, atol=1e-4 * (1.0 + float(np.abs(a).max()))
        )
    # The STRICT masking check (no shape-change noise): replace the padded
    # rows' content with garbage — masked rows' loss cotangents are exact
    # zeros, so the gradient must not depend on their content at all.
    garbage = dict(padded)
    for k, v in padded.items():
        if k == "valid_mask":
            continue
        noise = jax.random.normal(jax.random.PRNGKey(99), v[4:].shape,
                                  dtype=v.dtype if jnp.issubdtype(
                                      v.dtype, jnp.floating) else jnp.float32)
        tail = (noise if jnp.issubdtype(v.dtype, jnp.floating)
                else jnp.zeros_like(v[4:]))
        garbage[k] = jnp.concatenate([v[:4], v[:2] * 0 + tail.astype(v.dtype)],
                                     axis=0)
    _, aux_garbage = step(state, garbage, roi_w, rng)
    np.testing.assert_allclose(float(aux_garbage["loss"]),
                               float(aux_pad["loss"]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(aux_pad["grads"]),
                    jax.tree.leaves(aux_garbage["grads"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-8)
