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
from coma_unet_tpu.losses.roi_losses import (
    make_voxel_weights,
    update_roi_weights,
    update_voxel_weights,
)
from coma_unet_tpu.metrics.aggregate import MetricAccumulator, MetricResults
from coma_unet_tpu.train.checkpoint import CheckpointManager
from coma_unet_tpu.train.optim import ReduceLROnPlateau, get_lr, make_optimizer, set_lr
from coma_unet_tpu.train.recorder import MetricRecorder, loss_graph
from coma_unet_tpu.train.state import TrainState, create_train_state
from coma_unet_tpu.train.step import (
    make_eval_step,
    make_split_train_step,
    make_train_step,
    split_step_supported,
)

log = logging.getLogger(__name__)


def evaluate(
    eval_step,
    state: TrainState,
    loader,
    num_rois: int,
    save_path: str = "",
    save_matrices: bool = True,
    save_samples: int = 0,
    device_put=None,
) -> Tuple[MetricResults, MetricResults, MetricResults, Optional[np.ndarray]]:
    """`contrastive_test` equivalent: run the jitted eval step over the
    loader, accumulate overall/pos/neg metrics + per-ROI Pearson r.
    `save_samples` > 0 writes the first N (pred, gt) pairs as NIfTI
    (representative-sample dumps, ref `attn_unet_data_parallel.py:1503-1522`).
    `device_put` (e.g. `parallel.shard_batch`) places each batch on the mesh
    when `eval_step` is the sharded multi-chip step.
    """
    acc = MetricAccumulator(num_rois)
    saved = 0
    for batch in loader:
        db = {k: v for k, v in batch.items()
              if k not in ("sample_ids", "tau_paths", "valid")}
        if device_put is not None:
            db = device_put(db)
        pred, vox, roi = eval_step(state, db)
        valid = batch.get("valid")
        acc.update(vox, roi, batch["abeta"], batch.get("sample_ids"),
                   valid=valid)
        if save_path and saved < save_samples:
            from coma_unet_tpu.io.volume import write_tensor_to_nii

            p = np.asarray(pred)
            t = np.asarray(batch["tau"])
            vmask = (np.ones(p.shape[0], bool) if valid is None
                     else np.asarray(valid).reshape(-1).astype(bool))
            ids = batch.get("sample_ids") or [
                f"sample{saved + j}" for j in range(p.shape[0])
            ]
            for j in range(p.shape[0]):
                if saved >= save_samples:
                    break
                if not vmask[j]:
                    continue
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
    num_rois: Optional[int] = None,
    roi_indices=ROI_INDICES,
) -> TrainState:
    if num_rois is None:
        num_rois = len(roi_indices)
    tcfg, lcfg = config.train, config.loss
    save_path = save_path or config.save_path
    os.makedirs(save_path, exist_ok=True)

    # --- multi-chip mesh (SURVEY §2.8: the DP capability the reference only
    # aspires to — `attn_unet_data_parallel.py:32`, never enabled) -----------
    mesh = None
    put = None
    dp = max(int(tcfg.data_parallel), 1)
    sp = max(int(tcfg.spatial_parallel), 1)

    # --- build state --------------------------------------------------------
    # The init example must be drawn BEFORE the loaders get a sharding
    # device_put hook: model.init on a GSPMD-sharded batch would try to
    # partition the grouped expert-mixture conv along its group dim and fail.
    example = next(iter(train_loader))

    if dp * sp > 1:
        from functools import partial

        from coma_unet_tpu.parallel.mesh import make_mesh, shard_batch

        if tcfg.batch_size % dp:
            raise ValueError(
                f"batch_size {tcfg.batch_size} must be divisible by "
                f"data_parallel {dp}"
            )
        mesh = make_mesh(data=dp, spatial=sp)
        put = partial(shard_batch, mesh=mesh, spatial=sp > 1)
        # stage device placement inside the loader's prefetch threads so the
        # host->device transfer overlaps the previous step's compute
        for ld in (train_loader, val_loader):
            if ld is not None and getattr(ld, "device_put", False) is None:
                ld.device_put = put
        log.info("data-parallel mesh: %d-way data x %d-way spatial", dp, sp)

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

    if mesh is not None:
        from coma_unet_tpu.parallel.mesh import (
            make_sharded_eval_step,
            make_sharded_split_train_step,
            make_sharded_train_step,
            replicate_state,
        )

        state = replicate_state(state, mesh)
        if train_step is None:
            if split_step_supported(model, lcfg):
                # segmented DP step: the full packed Pallas family
                # multi-chip (the monolithic per-device fwd+bwd module hits
                # the same compile budget as single-device)
                big = max(config.data.volume_shape) > 128
                train_step = make_sharded_split_train_step(
                    model, lcfg, mesh, donate=True,
                    remat_blocks=True if big else None,
                    fold_update=False if big else None,
                )
                log.info("using sharded segment-compiled train step")
            else:
                train_step = make_sharded_train_step(
                    model, lcfg, mesh, donate=True)
        if eval_step is None:
            eval_step = make_sharded_eval_step(model, mesh, num_rois)
    if train_step is None:
        # donate the previous state's buffers — halves optimizer-state HBM
        if split_step_supported(model, lcfg):
            # segment-compiled step: runs the FULL packed/strided Pallas
            # kernel family in training (the monolithic fwd+bwd module
            # exceeds the remote TPU compile helper's Mosaic budget and
            # would force the packed-level-off variant). COMA_TRAIN_SPLIT=0
            # restores the single-program step.
            # keep block remat for large volumes (stored activations scale
            # with volume; see make_split_train_step)
            big = max(config.data.volume_shape) > 128
            train_step = make_split_train_step(
                model, lcfg, donate=True,
                remat_blocks=True if big else None,
                # large volumes also unfold the optimizer update out of the
                # encoder backward: folding it in OOMs HBM at 216^3
                fold_update=False if big else None,
            )
            log.info("using segment-compiled train step (packed family on)")
        else:
            train_step = make_train_step(model, lcfg, donate=True)
    if eval_step is None:
        eval_step = make_eval_step(model, num_rois)

    roi_weights = jnp.full((num_rois,), lcfg.roi_weight, dtype=jnp.float32)
    # voxel-wise loss mode (`RoiMSE(voxel_wise=True)`, `criterions.py:135-144`):
    # the weight grid comes from the ROI template (or, absent a template path,
    # the first training sample's ROI mask) and is adaptively updated from the
    # accumulated validation voxel-MAPE grid (ref :983-991).
    voxel_weights = None
    if lcfg.voxel_wise:
        if config.data.roi_template_path:
            from coma_unet_tpu.data.pipeline import compact_roi_np
            from coma_unet_tpu.io.volume import load_template

            tpl = load_template(
                config.data.roi_template_path,
                target=config.data.volume_shape,
                resize=config.data.resize,
            )
            tpl_compact = compact_roi_np(tpl, roi_indices=roi_indices)
        else:
            tpl_compact = np.asarray(example["roi_compact"][0])
        voxel_weights = make_voxel_weights(
            jnp.asarray(tpl_compact), roi_weights
        )
    # AOT-precompile split segments before the first dispatch (r4: the
    # dispatch-path remote compile fails on big train modules; the chipless
    # AOT path still compiles them and the dispatch then loads the cache
    # entry). Non-fatal: the step's own retry has an AOT rung as backstop.
    from coma_unet_tpu.models.blocks import _on_tpu

    if getattr(train_step, "segments", None) and mesh is None and _on_tpu():
        from coma_unet_tpu.train.step import aot_precompile_segments

        # mirror the in-loop `db` signature exactly (host keys stripped,
        # valid_mask present) so the precompiled avals match the dispatch
        ex_db = {k: v for k, v in example.items()
                 if k not in ("sample_ids", "tau_paths", "valid")}
        ex_db["valid_mask"] = np.ones(len(example["abeta"]), np.float32)
        t_aot = time.time()
        aot_precompile_segments(train_step, state, ex_db, roi_weights,
                                voxel_weights=voxel_weights)
        log.info("segment AOT precompile: %.1fs", time.time() - t_aot)

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
        # loader-wait vs step-time split: time blocked in next() separately
        # from the (synchronous, loss-fetched) step so the epoch log shows
        # whether the double-buffered prefetch pipeline hides IO under
        # device time (ref trains with torch DataLoader workers).
        wait_s = step_s = 0.0
        _it = iter(train_loader)
        batch_idx = -1
        pending = None  # (aux, valid[B], abeta[B], batch_idx) of step i-1

        def _consume(item):
            # Fetch + book the PREVIOUS step's metrics. Deferred one step
            # so the ~28 ms relay round trip of the fetch overlaps the
            # device executing the step dispatched just above — fetching
            # right after the dispatch idles the chip for the full floor
            # every step (~10% of a 278 ms step). Values are exact; they
            # are just consumed one iteration later.
            nonlocal epoch_loss, epoch_gen, epoch_tcds, n
            nonlocal pos_loss, neg_loss, n_pos, n_neg
            aux_p, valid, abeta, idx = item
            hm = aux_p.get("host_metrics")
            if hm is not None:
                # one fused [2+B] leaf = ONE relay fetch per step instead
                # of three (pack_host_metrics, train/step.py)
                hm = np.asarray(hm)
                bl, tcds, gen = float(hm[0]), float(hm[1]), hm[2:]
            else:
                bl = float(aux_p["loss"])
                gen = np.asarray(aux_p["gen_loss"])  # per-sample
                tcds = float(aux_p["tcds_loss"])
            epoch_loss += bl
            epoch_gen += float(gen[valid].sum())
            epoch_tcds += tcds
            n += int(valid.sum())
            is_pos, is_neg = valid & (abeta == 1), valid & (abeta == 0)
            # pos/neg bookkeeping by abeta, with the contrastive term added
            # once per matching sample (ref :901-910 accumulates
            # total_ds_contra_loss per positive/negative sample)
            pos_loss += float(gen[is_pos].sum()) + tcds * int(is_pos.sum())
            neg_loss += float(gen[is_neg].sum()) + tcds * int(is_neg.sum())
            n_pos += int(is_pos.sum())
            n_neg += int(is_neg.sum())
            if idx % 10 == 0:
                log.info("epoch %d batch %d loss %.4f", epoch, idx, bl)

        while True:
            t_w = time.time()
            try:
                batch = next(_it)
            except StopIteration:
                break
            wait_s += time.time() - t_w
            batch_idx += 1
            t_s = time.time()
            db = {k: v for k, v in batch.items()
                  if k not in ("sample_ids", "tau_paths", "valid")}
            # wrap-padded duplicate rows must not contribute gradient: the
            # step masks every loss term by this [B] 0/1 device mask (the
            # reference trains on the true partial batch). Always present so
            # the compiled step has ONE signature across full/partial batches.
            db["valid_mask"] = np.asarray(
                batch.get("valid", np.ones(len(batch["abeta"]), bool)),
                np.float32,
            )
            if put is not None:
                db = put(db)  # no-op when the loader already sharded it
            rng, sub = jax.random.split(rng)
            if voxel_weights is not None:
                state, aux = train_step(state, db, roi_weights, sub,
                                        voxel_weights)
            else:
                state, aux = train_step(state, db, roi_weights, sub)
            if pending is not None:
                _consume(pending)
            valid = batch.get("valid")
            abeta = np.asarray(batch["abeta"]).reshape(-1)
            valid = (np.ones(abeta.shape[0], bool) if valid is None
                     else np.asarray(valid).reshape(-1).astype(bool))
            pending = (aux, valid, abeta, batch_idx)
            step_s += time.time() - t_s
        if pending is not None:
            _consume(pending)
            pending = None

        avg = epoch_loss / max(n, 1)
        new_lr = scheduler.step(avg, get_lr(state.opt_state))
        state = state.replace(opt_state=set_lr(state.opt_state, new_lr))
        hist["avg"].append(avg)
        hist["total"].append(epoch_loss)
        hist["gen_avg"].append(epoch_gen / max(n, 1))
        hist["tcds_avg"].append(epoch_tcds / max(n, 1))
        hist["pos_avg"].append(pos_loss / max(n_pos, 1))
        hist["neg_avg"].append(neg_loss / max(n_neg, 1))
        busy = max(wait_s + step_s, 1e-9)
        log.info("epoch %d: avg loss %.4f (lr %.2e, %.1fs; "
                 "loader wait %.2fs / step %.2fs = %.1f%% stalled)",
                 epoch, avg, new_lr, time.time() - t0,
                 wait_s, step_s, 100.0 * wait_s / busy)

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
                save_samples=2, device_put=put,
            )
            recorder.record(general, epoch)
            pos_recorder.record(pos, epoch)
            neg_recorder.record(neg, epoch)
            recorder.plot(); pos_recorder.plot(); neg_recorder.plot()
            # adaptive weights from validation MAPE (ref :983-991): the
            # voxel grid in voxel_wise mode, the per-ROI vector otherwise
            if tcfg.adaptive_roi_weights:
                if voxel_weights is not None and voxel_mape is not None:
                    errors = jnp.asarray(voxel_mape / 100.0, jnp.float32)
                    voxel_weights = update_voxel_weights(voxel_weights, errors)
                    log.info("updated voxel weights: mean %.4f max %.4f",
                             float(voxel_weights.mean()),
                             float(voxel_weights.max()))
                else:
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
                eval_step, state, train_loader, num_rois, save_matrices=False,
                device_put=put,
            )
            log.info("in-sample MAE %.4f MAPE %.2f SSIM %.4f",
                     general.mae, general.mape, general.ssim)

    return state
