"""Training engine — the `train_dp` rebuild (`attn_unet_data_parallel.py:
696-1033`) with the per-batch work compiled into one XLA program.

Loop semantics kept from the reference: per-epoch batch loop; epoch-average
loss drives a ReduceLROnPlateau schedule; checkpoint `latest` every epoch and
`epoch_{E}` every `checkpoint_iter`; full validation every `val_iter` epochs
with overall/Abeta+/Abeta- metric recording, CSVs, and plots; adaptive
ROI-weight recomputation from validation MAPE; in-sample (overfit) validation
every `overfit_val_iter` epochs after epoch 29; best-MAPE / best-avg-corr
tracking. Pos/neg per-epoch loss bookkeeping (ref :901-910) is kept — and
actually recorded (the reference's pos lists stayed empty, §0 bug)."""

from __future__ import annotations

import logging
import os
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from coma_unet_tpu.config import ExperimentConfig, ROI_INDICES
from coma_unet_tpu.losses.roi_losses import update_roi_weights
from coma_unet_tpu.metrics.aggregate import MetricAccumulator, MetricResults
from coma_unet_tpu.train.checkpoint import CheckpointManager
from coma_unet_tpu.train.optim import ReduceLROnPlateau, get_lr, make_optimizer, set_lr
from coma_unet_tpu.train.recorder import MetricRecorder, loss_graph
from coma_unet_tpu.train.state import TrainState, create_train_state
from coma_unet_tpu.train.step import make_eval_step, make_train_step

log = logging.getLogger(__name__)


def evaluate(
    eval_step,
    state: TrainState,
    loader,
    num_rois: int,
    save_path: str = "",
    save_matrices: bool = True,
    save_samples: int = 0,
) -> Tuple[MetricResults, MetricResults, MetricResults, Optional[np.ndarray]]:
    """`contrastive_test` equivalent: run the jitted eval step over the
    loader, accumulate overall/pos/neg metrics + per-ROI Pearson r.
    `save_samples` > 0 writes the first N (pred, gt) pairs as NIfTI
    (representative-sample dumps, ref `attn_unet_data_parallel.py:1503-1522`).
    """
    acc = MetricAccumulator(num_rois)
    saved = 0
    for batch in loader:
        db = {k: v for k, v in batch.items()
              if k not in ("sample_ids", "tau_paths")}
        pred, vox, roi = eval_step(state, db)
        acc.update(vox, roi, batch["abeta"], batch.get("sample_ids"))
        if save_path and saved < save_samples:
            from coma_unet_tpu.io.volume import write_tensor_to_nii

            p = np.asarray(pred)
            t = np.asarray(batch["tau"])
            ids = batch.get("sample_ids") or [
                f"sample{saved + j}" for j in range(p.shape[0])
            ]
            for j in range(p.shape[0]):
                if saved >= save_samples:
                    break
                sid = str(ids[j]).replace("/", "_")
                write_tensor_to_nii(
                    p[j], os.path.join(save_path, f"{sid}_pred.nii")
                )
                write_tensor_to_nii(
                    t[j], os.path.join(save_path, f"{sid}_gt.nii")
                )
                saved += 1
    if save_path and save_matrices:
        acc.save_matrices(save_path)
    general, pos, neg = acc.results()
    return general, pos, neg, acc.voxel_mape_grid()


def train(
    model,
    config: ExperimentConfig,
    train_loader,
    val_loader=None,
    save_path: Optional[str] = None,
    train_step=None,
    eval_step=None,
    resume_from: Optional[str] = None,
    num_rois: int = len(ROI_INDICES),
) -> TrainState:
    tcfg, lcfg = config.train, config.loss
    save_path = save_path or config.save_path
    os.makedirs(save_path, exist_ok=True)

    # --- build state --------------------------------------------------------
    example = next(iter(train_loader))
    tx = make_optimizer(tcfg.lr, tcfg.weight_decay, tcfg.grad_acc)
    rng = jax.random.PRNGKey(tcfg.seed)
    state = create_train_state(
        model, tx, rng,
        (example["mri"], example["covars"], example["roi_loc"],
         example["roi_std"], example["roi_compact"]),
        {"train": True},
    )
    scheduler = ReduceLROnPlateau(
        patience=tcfg.plateau_patience, factor=tcfg.plateau_factor
    )
    ckpt = CheckpointManager(save_path)
    start_epoch = 0
    if resume_from:
        state, last_epoch, _ = ckpt.restore(state, resume_from, scheduler)
        start_epoch = last_epoch + 1
        log.info("resumed from %s at epoch %d", resume_from, start_epoch)

    if train_step is None:
        # donate the previous state's buffers — halves optimizer-state HBM
        train_step = make_train_step(model, lcfg, donate=True)
    if eval_step is None:
        eval_step = make_eval_step(model, num_rois)

    roi_weights = jnp.full((num_rois,), lcfg.roi_weight, dtype=jnp.float32)
    recorder = MetricRecorder(save_path)
    pos_recorder = MetricRecorder(os.path.join(save_path, "pos_metrics"))
    neg_recorder = MetricRecorder(os.path.join(save_path, "neg_metrics"))

    hist: Dict[str, list] = {k: [] for k in (
        "avg", "total", "pos_avg", "neg_avg", "gen_avg", "tcds_avg",
    )}
    best_mape, best_corr = float("inf"), -float("inf")

    for epoch in range(start_epoch, tcfg.epochs):
        t0 = time.time()
        epoch_loss = epoch_gen = epoch_tcds = 0.0
        pos_loss = neg_loss = 0.0
        n = n_pos = n_neg = 0
        for batch_idx, batch in enumerate(train_loader):
            db = {k: v for k, v in batch.items()
                  if k not in ("sample_ids", "tau_paths")}
            rng, sub = jax.random.split(rng)
            state, aux = train_step(state, db, roi_weights, sub)
            bl = float(aux["loss"])
            gen = np.asarray(aux["gen_loss"])  # per-sample
            tcds = float(aux["tcds_loss"])
            epoch_loss += bl
            epoch_gen += float(gen.sum())
            epoch_tcds += tcds
            n += gen.shape[0]
            abeta = np.asarray(batch["abeta"]).reshape(-1)
            # pos/neg bookkeeping by abeta (ref :901-910)
            pos_loss += float(gen[abeta == 1].sum()) + tcds * (abeta == 1).any()
            neg_loss += float(gen[abeta == 0].sum()) + tcds * (abeta == 0).any()
            n_pos += int((abeta == 1).sum())
            n_neg += int((abeta == 0).sum())
            if batch_idx % 10 == 0:
                log.info("epoch %d batch %d loss %.4f", epoch, batch_idx, bl)

        avg = epoch_loss / max(n, 1)
        new_lr = scheduler.step(avg, get_lr(state.opt_state))
        set_lr(state.opt_state, new_lr)
        hist["avg"].append(avg)
        hist["total"].append(epoch_loss)
        hist["gen_avg"].append(epoch_gen / max(n, 1))
        hist["tcds_avg"].append(epoch_tcds / max(n, 1))
        hist["pos_avg"].append(pos_loss / max(n_pos, 1))
        hist["neg_avg"].append(neg_loss / max(n_neg, 1))
        log.info("epoch %d: avg loss %.4f (lr %.2e, %.1fs)",
                 epoch, avg, new_lr, time.time() - t0)

        loss_graph(
            (hist["avg"], hist["pos_avg"], hist["neg_avg"]),
            os.path.join(save_path, "train_average_loss"),
            labels=["Total", "Pos", "Neg"],
        )
        loss_graph(
            (hist["gen_avg"], hist["tcds_avg"]),
            os.path.join(save_path, "train_average_component_losses"),
            labels=["Gen.", "tCDS/RnC (weighted)"],
        )

        ckpt.save_epoch(state, epoch, avg, scheduler, tcfg.checkpoint_iter)

        if val_loader is not None and epoch % tcfg.val_iter == 0:
            val_dir = os.path.join(save_path, f"{epoch}_output_samples")
            os.makedirs(val_dir, exist_ok=True)
            general, pos, neg, voxel_mape = evaluate(
                eval_step, state, val_loader, num_rois, save_path=val_dir,
                save_samples=2,
            )
            recorder.record(general, epoch)
            pos_recorder.record(pos, epoch)
            neg_recorder.record(neg, epoch)
            recorder.plot(); pos_recorder.plot(); neg_recorder.plot()
            # adaptive ROI weights from validation MAPE (ref :983-991)
            if tcfg.adaptive_roi_weights:
                errors = jnp.asarray(general.roi_mapes / 100.0, jnp.float32)
                roi_weights = update_roi_weights(
                    roi_weights, errors, lcfg.scale_factor
                )
                log.info("updated roi weights: mean %.2f max %.2f",
                         float(roi_weights.mean()), float(roi_weights.max()))
            if general.mape < best_mape:
                best_mape = general.mape
                log.info("lowest MAPE so far at epoch %d: %.3f", epoch, best_mape)
            corr = float(np.nanmean(general.roi_correlations))
            if corr > best_corr:
                best_corr = corr
                log.info("highest avg ROI corr so far at epoch %d: %.4f",
                         epoch, best_corr)

        if (epoch != 0 and epoch > 29
                and epoch % tcfg.overfit_val_iter == 0):
            log.info("in-sample (overfit) validation at epoch %d", epoch)
            general, pos, neg, _ = evaluate(
                eval_step, state, train_loader, num_rois, save_matrices=False
            )
            log.info("in-sample MAE %.4f MAPE %.2f SSIM %.4f",
                     general.mae, general.mape, general.ssim)

    return state
