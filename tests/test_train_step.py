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
