"""End-to-end training loop + checkpoint/resume + recorder tests (tiny
shapes, synthetic in-memory loader)."""

import os

import jax
import numpy as np
import pytest

from coma_unet_tpu.config import (
    DataConfig,
    ExperimentConfig,
    LossConfig,
    ModelConfig,
    TrainConfig,
)
from coma_unet_tpu.models import ContraAttnUNet
from coma_unet_tpu.train.checkpoint import CheckpointManager, parse_epoch_from_path
from coma_unet_tpu.train.loop import evaluate, train
from coma_unet_tpu.train.optim import ReduceLROnPlateau
from coma_unet_tpu.train.state import create_train_state
from coma_unet_tpu.train import make_eval_step, make_optimizer
from tests.conftest import make_batch


class ListLoader:
    def __init__(self, batches):
        self.batches = batches

    def __iter__(self):
        return iter(self.batches)

    def __len__(self):
        return len(self.batches)


def _exp_config(tiny_model_config, epochs=2):
    return ExperimentConfig(
        model=tiny_model_config,
        loss=LossConfig(),
        train=TrainConfig(epochs=epochs, val_iter=1, checkpoint_iter=1,
                          lr=1e-3, adaptive_roi_weights=True),
        data=DataConfig(),
    )


def _np_batch(key, **kw):
    b = make_batch(key, **kw)
    b["sample_ids"] = [f"s{i}" for i in range(b["mri"].shape[0])]
    return b


def test_train_loop_end_to_end(tiny_model_config, rng, tmp_path):
    cfg = _exp_config(tiny_model_config, epochs=2)
    model = ContraAttnUNet(tiny_model_config)
    batches = [_np_batch(jax.random.PRNGKey(i)) for i in range(2)]
    loader = ListLoader(batches)
    state = train(model, cfg, loader, val_loader=loader,
                  save_path=str(tmp_path))
    assert int(state.step) == 4  # 2 epochs x 2 batches
    # checkpoints written
    assert os.path.exists(str(tmp_path / "checkpoints" / "checkpoint_latest_epoch"))
    assert os.path.exists(str(tmp_path / "checkpoints" / "checkpoint_epoch_0"))
    # metric CSVs written with one column per val epoch
    import pandas as pd

    mape_csv = str(tmp_path / "validation_metric_results" / "mape.csv")
    df = pd.read_csv(mape_csv)
    assert list(df.columns) == ["epoch_0", "epoch_1"]
    # plots emitted
    assert os.path.exists(str(tmp_path / "val_MAE.png"))
    assert os.path.exists(str(tmp_path / "train_average_loss.png"))
    # pred/gt ROI-mean matrices saved
    assert os.path.exists(str(tmp_path / "0_output_samples" / "pred_means.csv"))


def test_checkpoint_resume_roundtrip(tiny_model_config, rng, tmp_path):
    model = ContraAttnUNet(tiny_model_config)
    batch = make_batch(rng)
    tx = make_optimizer(1e-3)
    state = create_train_state(
        model, tx, rng,
        (batch["mri"], batch["covars"], batch["roi_loc"], batch["roi_std"],
         batch["roi_compact"]),
        {"train": True},
    )
    sched = ReduceLROnPlateau(patience=3)
    sched.best = 0.123
    mgr = CheckpointManager(str(tmp_path))
    path = mgr.save(state, epoch=7, loss=1.5, scheduler=sched)
    assert parse_epoch_from_path(path) == 7

    sched2 = ReduceLROnPlateau()
    state2, epoch, loss = mgr.restore(state, path, sched2)
    assert epoch == 7 and loss == 1.5
    assert sched2.best == 0.123
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_evaluate_splits(tiny_model_config, rng):
    model = ContraAttnUNet(tiny_model_config)
    batch = _np_batch(rng, b=4)
    batch["abeta"] = np.asarray([1.0, 1.0, 0.0, -1.0], np.float32)
    tx = make_optimizer(1e-3)
    state = create_train_state(
        model, tx, rng,
        (batch["mri"], batch["covars"], batch["roi_loc"], batch["roi_std"],
         batch["roi_compact"]),
        {"train": True},
    )
    ev = make_eval_step(model, 36)
    general, pos, neg, voxel = evaluate(ev, state, ListLoader([batch]), 36)
    assert general.num_samples == 4
    assert pos.num_samples == 2
    assert neg.num_samples == 1  # abeta == -1 excluded from both splits
    assert voxel is not None and voxel.shape == (16, 16, 16)
