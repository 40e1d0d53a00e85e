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


def test_evaluate_masks_wrap_padded_rows(tiny_model_config, rng):
    """Wrap-padded duplicate rows in the last static-shape batch must not be
    double-counted (each sample evaluated exactly once, like the reference)."""
    model = ContraAttnUNet(tiny_model_config)
    batch = _np_batch(rng, b=4)
    batch["abeta"] = np.asarray([1.0, 0.0, 1.0, 0.0], np.float32)
    tx = make_optimizer(1e-3)
    state = create_train_state(
        model, tx, rng,
        (batch["mri"], batch["covars"], batch["roi_loc"], batch["roi_std"],
         batch["roi_compact"]),
        {"train": True},
    )
    ev = make_eval_step(model, 36)
    # unpadded truth: only the first two samples
    ref = {k: (v[:2] if isinstance(v, np.ndarray) else v[:2])
           for k, v in batch.items()}
    g_ref, _, _, _ = evaluate(ev, state, ListLoader([ref]), 36)
    # padded batch: rows 2-3 are duplicates of 0-1, flagged invalid
    padded = {k: (np.asarray(v).copy() if not isinstance(v, list) else v)
              for k, v in batch.items()}
    padded["mri"][2:] = padded["mri"][:2]
    padded["tau"][2:] = padded["tau"][:2]
    padded["valid"] = np.asarray([True, True, False, False])
    g_pad, pos, neg, _ = evaluate(ev, state, ListLoader([padded]), 36)
    assert g_pad.num_samples == 2
    assert pos.num_samples == 1 and neg.num_samples == 1
    np.testing.assert_allclose(g_pad.mae, g_ref.mae, rtol=1e-5)
    np.testing.assert_allclose(g_pad.mape, g_ref.mape, rtol=1e-5)


def test_voxel_wise_mode_runs_and_adapts(tiny_model_config, tmp_path, caplog):
    """`LossConfig.voxel_wise` builds the template-derived voxel weight grid,
    feeds it to the loss, and updates it from validation voxel-MAPE at val
    epochs (`criterions.py:135-168`, ref :983-991)."""
    import logging as _logging
    import re

    cfg = ExperimentConfig(
        model=tiny_model_config,
        loss=LossConfig(voxel_wise=True),
        train=TrainConfig(epochs=2, val_iter=1, checkpoint_iter=5, lr=1e-3,
                          adaptive_roi_weights=True),
        data=DataConfig(),
    )
    model = ContraAttnUNet(tiny_model_config)
    batches = [_np_batch(jax.random.PRNGKey(i)) for i in range(2)]
    loader = ListLoader(batches)
    with caplog.at_level(_logging.INFO, logger="coma_unet_tpu.train.loop"):
        train(model, cfg, loader, val_loader=loader, save_path=str(tmp_path))
    updates = [m for m in caplog.messages if "updated voxel weights" in m]
    assert len(updates) == 2, f"expected 2 voxel-weight updates, got {updates}"
    means = [float(re.search(r"mean ([\d.]+)", m).group(1)) for m in updates]
    assert means[0] != means[1], "voxel weights did not change across epochs"


def test_voxel_weights_affect_loss(tiny_model_config, rng):
    """The voxel grid actually reaches the compiled loss (not a dead kwarg)."""
    from coma_unet_tpu.losses.roi_losses import make_voxel_weights
    from coma_unet_tpu.train.step import make_train_step

    model = ContraAttnUNet(tiny_model_config)
    batch = make_batch(rng)
    tx = make_optimizer(1e-3)
    state = create_train_state(
        model, tx, rng,
        (batch["mri"], batch["covars"], batch["roi_loc"], batch["roi_std"],
         batch["roi_compact"]),
        {"train": True},
    )
    import jax.numpy as jnp

    roi_w = jnp.full((36,), 225.0)
    step = make_train_step(model, LossConfig(voxel_wise=True), donate=False)
    vw = make_voxel_weights(batch["roi_compact"][0], roi_w)
    _, aux_with = step(state, batch, roi_w, rng, vw)
    _, aux_without = step(state, batch, roi_w, rng)
    assert float(aux_with["loss"]) != float(aux_without["loss"])


def test_dataloader_emits_valid_mask():
    """DataLoader wrap-pads the last partial batch and flags padded rows."""
    from coma_unet_tpu.data.pipeline import DataLoader

    class TinyDS:
        def __len__(self):
            return 5

        def __getitem__(self, i):
            return {
                "mri": np.full((1, 4, 4, 4), float(i), np.float32),
                "tau": np.zeros((1, 4, 4, 4), np.float32),
                "roi": np.zeros((1, 4, 4, 4), np.int32),
                "covars": np.zeros((6,), np.float32),
                "abeta": 1.0,
                "sample_id": f"s{i}",
            }

    loader = DataLoader(TinyDS(), batch_size=2, num_workers=1)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0]["valid"].tolist() == [True, True]
    assert batches[-1]["valid"].tolist() == [True, False]
    # the padded row wraps to the epoch start
    assert float(batches[-1]["mri"][1, 0, 0, 0, 0]
                 if batches[-1]["mri"].ndim == 5
                 else batches[-1]["mri"][1].flat[0]) == 0.0
