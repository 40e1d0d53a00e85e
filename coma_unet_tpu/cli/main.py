"""Command-line interface.

Mirrors the reference's argparse surface (`validation.py:680-692`,
`validation_combined_dataset.py:346-359`) — `-save_path, -model_type,
-batch_size, -resume_training, -checkpoint_path, -description,
-template_space, -covariates, -smoothing, -rnc, -cross_val` — plus the knobs
the reference hardcodes (epochs, lr, folds, mesh shape). Subcommands:

  train     — `volume_validation` / `cross_validation` / holdout training
              (the `run.sh` -> `validation.py` live path)
  validate  — `contrastive_test` over a test lookup (metrics + CSVs)
  infer     — MRI-only synthesis (`VolumeDataset_Inference` path), writing
              NIfTI outputs, optional sliding window for >patch volumes

Results-dir layout matches the reference: <save>/checkpoints/,
<save>/validation_metric_results/, <save>/<epoch>_output_samples/.
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
import os
import sys
import time
from typing import Optional

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="coma-unet-tpu")
    sub = p.add_subparsers(dest="command", required=True)

    def common(sp):
        sp.add_argument("-save_path", default="results")
        sp.add_argument("-model_type", default="ContraAttnUNET",
                        choices=["ContraAttnUNET", "AttnUNET", "GenAttnUnet",
                                 "UNET", "GenUNETR", "AttnUNETR", "SwinUnetr",
                                 "AttnSwinUnetr"])
        sp.add_argument("-batch_size", type=int, default=2)
        sp.add_argument("-description", default="")
        sp.add_argument("-template_space", action="store_true")
        sp.add_argument("-covariates", action="store_true", default=True)
        sp.add_argument("-smoothing", action="store_true")
        sp.add_argument("-rnc", action="store_true", default=True)
        sp.add_argument("-checkpoint_path", default=None)
        sp.add_argument("--config", default=None,
                        help="ExperimentConfig JSON file (overrides flags)")
        sp.add_argument("--splits_dir", default="training_folds")
        sp.add_argument("--covariate_csv", default=None)
        sp.add_argument("--quartile_csv", default=None)
        sp.add_argument("--predictions_json", default=None)
        sp.add_argument("--cognition_json", default=None,
                        help="KNN-predicted MMSCORE table (combined cohort)")
        sp.add_argument("--abeta_fallback_json", default=None,
                        help="predicted abeta fallback table (combined cohort)")
        sp.add_argument("--fold", type=int, default=4)
        sp.add_argument("--data_parallel", type=int, default=1)
        sp.add_argument("--norm", default="instance")
        sp.add_argument("--compute_dtype", default="bfloat16")
        sp.add_argument("--voxel_wise", action="store_true",
                        help="voxel-wise RoiMSE weight grid + adaptive voxel "
                             "updates (criterions.py:135-168)")
        sp.add_argument("--roi_template", default=None,
                        help="template ROI mask NIfTI for the voxel-wise "
                             "weight grid (data_util.load_template)")
        sp.add_argument("--holdout_ids", default=None,
                        help="subjects excluded from training: comma-separated"
                             " ids or a file with one id per line "
                             "(data_util.filter_for_holdout)")

    t = sub.add_parser("train", help="train a model on fold lookups")
    common(t)
    t.add_argument("-resume_training", action="store_true")
    t.add_argument("-cross_val", action="store_true")
    t.add_argument("--train_lookup", default=None,
                   help="explicit training lookup CSV (overrides "
                        "splits_dir/fold; the single_split_validation "
                        "ADNI-train/A4-test driver, validation.py:392-477)")
    t.add_argument("--test_lookup_file", default=None,
                   help="explicit test lookup CSV (single-split driver)")
    t.add_argument("--epochs", type=int, default=61)
    t.add_argument("--lr", type=float, default=1e-3)
    t.add_argument("--combined", action="store_true",
                   help="combined ADNI+A4 flat dataset (lr default 1e-4)")

    v = sub.add_parser("validate", help="run the evaluation suite")
    common(v)
    v.add_argument("--test_lookup", required=True)

    i = sub.add_parser("infer", help="MRI-only tau-PET synthesis")
    common(i)
    i.add_argument("--input_lookup", default=None,
                   help="CSV with MRI (+roi) path columns (required unless "
                        "--cohort resolves it from the preset bundle)")
    i.add_argument("--cohort", default=None,
                   choices=("ucsf", "a4", "nacc", "nacc_nonscan",
                            "adni_autopsy"),
    help="named per-cohort preset (the five ready-made drivers "
                        "of VolumeDataset_Inference.py:163-293): resolves "
                        "paths CSV, covariate CSV, tau-meta/cognition/abeta "
                        "JSONs inside --cohort_dir by the reference's file "
                        "names")
    i.add_argument("--cohort_dir", default=None,
                   help="base directory of the cohort preset bundle")
    i.add_argument("--out_dir", default="synth_out")
    i.add_argument("--sliding_window", action="store_true")
    i.add_argument("--spatial_parallel", type=int, default=1,
                   help="shard the volume spatially over this many devices "
                        "(GSPMD model-parallel inference)")
    i.add_argument("--patch_size", type=int, default=128)
    i.add_argument("--overlap", type=float, default=0.25)
    i.add_argument("--save_attention", action="store_true",
                   help="also export per-level attention maps as NIfTI")
    return p


def _parse_holdout_ids(spec: Optional[str]):
    """Comma-separated ids, or a file of one id per line."""
    if not spec:
        return ()
    if os.path.isfile(spec):
        with open(spec) as f:
            return tuple(line.strip() for line in f if line.strip())
    return tuple(s.strip() for s in spec.split(",") if s.strip())


def _experiment_config(args):
    from coma_unet_tpu.config import (
        DataConfig, ExperimentConfig, LossConfig, ModelConfig, TrainConfig,
    )

    if args.config:
        with open(args.config) as f:
            cfg = ExperimentConfig.from_json(f.read())
        # data-source flags overlay the config file
        data_overrides = {}
        for flag, field_name in (
            ("splits_dir", "splits_dir"), ("covariate_csv", "covariate_csv"),
            ("quartile_csv", "quartile_csv"), ("fold", "fold"),
        ):
            v = getattr(args, flag, None)
            if v not in (None, "", "training_folds", 4):
                data_overrides[field_name] = v
        if data_overrides:
            cfg = dataclasses.replace(
                cfg, data=dataclasses.replace(cfg.data, **data_overrides)
            )
        if getattr(args, "save_path", "results") != "results":
            cfg = dataclasses.replace(cfg, save_path=args.save_path)
        if getattr(args, "model_type", "ContraAttnUNET") != "ContraAttnUNET":
            cfg = dataclasses.replace(cfg, model_type=args.model_type)
        train_overrides = {}
        if getattr(args, "data_parallel", 1) != 1:
            train_overrides["data_parallel"] = args.data_parallel
        if getattr(args, "batch_size", 2) != 2:
            train_overrides["batch_size"] = args.batch_size
        if train_overrides:
            cfg = dataclasses.replace(
                cfg, train=dataclasses.replace(cfg.train, **train_overrides)
            )
        if getattr(args, "voxel_wise", False):
            cfg = dataclasses.replace(
                cfg, loss=dataclasses.replace(cfg.loss, voxel_wise=True)
            )
        late_data = {}
        if getattr(args, "roi_template", None):
            late_data["roi_template_path"] = args.roi_template
        if getattr(args, "holdout_ids", None):
            late_data["holdout_ids"] = _parse_holdout_ids(args.holdout_ids)
        if late_data:
            cfg = dataclasses.replace(
                cfg, data=dataclasses.replace(cfg.data, **late_data)
            )
        return cfg
    model = ModelConfig(
        conditional=args.covariates,
        norm=args.norm,
        compute_dtype=args.compute_dtype,
        with_modulator=args.model_type == "ContraAttnUNET",
    )
    loss = LossConfig(
        rnc=args.rnc,
        roi_weight=1.0 if args.template_space else 225.0,
        voxel_wise=getattr(args, "voxel_wise", False),
    )
    train_cfg = TrainConfig(
        epochs=getattr(args, "epochs", 61),
        lr=getattr(args, "lr", 1e-3) if not getattr(args, "combined", False)
        else 1e-4,
        batch_size=args.batch_size,
        data_parallel=args.data_parallel,
    )
    data = DataConfig(
        splits_dir=args.splits_dir,
        covariate_csv=args.covariate_csv or "",
        quartile_csv=args.quartile_csv or "",
        fold=args.fold,
        template_space=args.template_space,
        smoothing=args.smoothing,
        roi_template_path=getattr(args, "roi_template", None) or "",
        holdout_ids=_parse_holdout_ids(getattr(args, "holdout_ids", None)),
    )
    return ExperimentConfig(
        model=model, loss=loss, train=train_cfg, data=data,
        save_path=args.save_path, description=args.description,
        model_type=args.model_type,
    )


def _build_model(config):
    from coma_unet_tpu.models.registry import build_model

    return build_model(config.model_type, config.model)


def _roi_indices(config):
    from coma_unet_tpu.config import ROI_INDICES, TEMPLATE_ROI_INDICES

    return (TEMPLATE_ROI_INDICES if config.data.template_space
            else ROI_INDICES)


def _load_json(path):
    import json

    if not path:
        return {}
    with open(path) as f:
        return json.load(f)


def _build_loaders(args, config):
    from coma_unet_tpu.data import (
        CombinedVolumeDataset, CovariateTable, DataLoader,
        PredictedMetaTauDataset, PredictionTable,
    )
    from coma_unet_tpu.data.covariates import QuartileTable

    cov = CovariateTable(config.data.covariate_csv)
    quart = (
        QuartileTable(config.data.quartile_csv)
        if config.data.quartile_csv else None
    )
    preds = (
        PredictionTable(args.predictions_json)
        if getattr(args, "predictions_json", None) else None
    )
    k = config.data.fold
    # explicit lookup files override the fold layout — the
    # `single_split_validation` driver (ADNI-train / A4-test,
    # `validation.py:392-477`)
    train_csv = getattr(args, "train_lookup", None) or os.path.join(
        config.data.splits_dir, f"training_lookup_{k}.csv"
    )
    test_csv = getattr(args, "test_lookup_file", None) or os.path.join(
        config.data.splits_dir, f"test_lookup_{k}.csv"
    )
    ds_kwargs = dict(
        template_space=config.data.template_space,
        smoothing=config.data.smoothing,
        pad_dims=config.data.volume_shape,
    )
    if getattr(args, "combined", False):
        aux = dict(
            cognition_table=_load_json(getattr(args, "cognition_json", None)),
            abeta_fallback_table=_load_json(
                getattr(args, "abeta_fallback_json", None)
            ),
        )
        train_ds = CombinedVolumeDataset(train_csv, cov, meta_tau_table=preds,
                                         **aux, **ds_kwargs)
        test_ds = CombinedVolumeDataset(test_csv, cov, meta_tau_table=preds,
                                        **aux, **ds_kwargs)
    else:
        train_ds = PredictedMetaTauDataset(train_csv, cov, quart,
                                           meta_tau_table=preds, **ds_kwargs)
        test_ds = PredictedMetaTauDataset(test_csv, cov, quart,
                                          meta_tau_table=preds, **ds_kwargs)
    roi_idx = _roi_indices(config)
    # holdout subjects are excluded from TRAINING only (the reference filters
    # every training batch, `attn_unet_data_parallel.py:785-791` — its mask
    # is broken, see data/lookup.filter_for_holdout)
    sampler = None
    if config.data.holdout_ids:
        from coma_unet_tpu.data.lookup import filter_for_holdout

        ids = [train_ds.sample_id(i) for i in range(len(train_ds))]
        keep = filter_for_holdout(ids, config.data.holdout_ids)
        sampler = [i for i, k in enumerate(keep) if k]
        logging.getLogger(__name__).info(
            "holdout filter: %d/%d training samples kept",
            len(sampler), len(train_ds),
        )
    train_loader = DataLoader(
        train_ds, config.train.batch_size, predictions=preds, shuffle=True,
        with_triplets=not config.loss.rnc, drop_last=False,
        roi_indices=roi_idx, sampler=sampler,
    )
    test_loader = DataLoader(test_ds, config.train.batch_size,
                             predictions=preds, roi_indices=roi_idx)
    return train_loader, test_loader


def _run_dir_name(args) -> str:
    """Timestamped results dir (`run.sh:9`); resuming from a checkpoint
    redirects outputs to `native_target_finetune_<original run dir>` so the
    finetune never overwrites the source run (`validation.py:225`)."""
    if getattr(args, "resume_training", False) and \
            getattr(args, "checkpoint_path", None):
        ckpt = os.path.abspath(args.checkpoint_path)
        # .../<run dir>/checkpoints/<checkpoint>
        orig = os.path.basename(os.path.dirname(os.path.dirname(ckpt)))
        return "native_target_finetune_" + orig
    return time.strftime("%Y-%m-%d_%H-%M-%S")


def cmd_train(args) -> int:
    import dataclasses as _dc

    from coma_unet_tpu.train.loop import train
    from coma_unet_tpu.utils.logging import setup_logging

    config = _experiment_config(args).normalized()
    run_dir = os.path.join(config.save_path, _run_dir_name(args))
    os.makedirs(run_dir, exist_ok=True)
    setup_logging(os.path.join(run_dir, f"train_{config.model_type}.log"))
    with open(os.path.join(run_dir, "config.json"), "w") as f:
        f.write(config.to_json())

    folds = [config.data.fold]
    if getattr(args, "cross_val", False):
        # 5-fold cross validation (`validation_combined_dataset.py:120-214`):
        # a fresh model per fold, fold_k/ subdirs, cross-fold averaging.
        folds = list(range(1, 6))

    fold_metrics = []
    for k in folds:
        fold_cfg = _dc.replace(
            config, data=_dc.replace(config.data, fold=k)
        )
        fold_dir = run_dir if len(folds) == 1 else os.path.join(
            run_dir, f"fold_{k}"
        )
        os.makedirs(fold_dir, exist_ok=True)
        model = _build_model(fold_cfg)
        train_loader, test_loader = _build_loaders(args, fold_cfg)
        resume = args.checkpoint_path if args.resume_training else None
        train(model, fold_cfg, train_loader, val_loader=test_loader,
              save_path=fold_dir, resume_from=resume,
              roi_indices=_roi_indices(fold_cfg))
        # final evaluation for cross-fold averaging
        mape_csv = os.path.join(fold_dir, "validation_metric_results",
                                "mape.csv")
        if os.path.exists(mape_csv):
            import pandas as pd

            df = pd.read_csv(mape_csv)
            if len(df.columns):
                fold_metrics.append(float(df.iloc[0, -1]))
    if len(fold_metrics) > 1:
        print(f"cross-val final MAPE per fold: {fold_metrics}; "
              f"mean {np.mean(fold_metrics):.3f}")
    return 0


def cmd_validate(args) -> int:
    import jax

    from coma_unet_tpu.data import (
        CovariateTable, DataLoader, PredictedMetaTauDataset, PredictionTable,
    )
    from coma_unet_tpu.data.covariates import QuartileTable
    from coma_unet_tpu.train import create_train_state, make_eval_step, make_optimizer
    from coma_unet_tpu.train.checkpoint import CheckpointManager
    from coma_unet_tpu.train.loop import evaluate
    from coma_unet_tpu.utils.logging import setup_logging

    config = _experiment_config(args).normalized()
    setup_logging(None)
    model = _build_model(config)
    cov = CovariateTable(config.data.covariate_csv)
    quart = (QuartileTable(config.data.quartile_csv)
             if config.data.quartile_csv else None)
    preds = (PredictionTable(args.predictions_json)
             if args.predictions_json else None)
    ds = PredictedMetaTauDataset(
        args.test_lookup, cov, quart, meta_tau_table=preds,
        template_space=config.data.template_space,
        pad_dims=config.data.volume_shape,
    )
    # template space evaluates the Yeo template ROI set, not the 36
    # FreeSurfer Braak regions (`validation.py:66-68`)
    roi_idx = _roi_indices(config)
    loader = DataLoader(ds, config.train.batch_size, predictions=preds,
                        roi_indices=roi_idx)
    example = next(iter(loader))
    state = create_train_state(
        model, make_optimizer(config.train.lr), jax.random.PRNGKey(0),
        (example["mri"], example["covars"], example["roi_loc"],
         example["roi_std"], example["roi_compact"]),
        {"train": True},
    )
    if args.checkpoint_path:
        mgr = CheckpointManager(os.path.dirname(
            os.path.dirname(args.checkpoint_path)))
        state, _, _ = mgr.restore(state, args.checkpoint_path)
    put = None
    dp = max(int(config.train.data_parallel), 1)
    if dp > 1:
        # sharded evaluation over the DP mesh (SURVEY §2.8)
        from functools import partial

        from coma_unet_tpu.parallel.mesh import (
            make_mesh, make_sharded_eval_step, replicate_state, shard_batch,
        )

        if config.train.batch_size % dp:
            raise SystemExit(
                f"batch_size {config.train.batch_size} must be divisible by "
                f"data_parallel {dp}"
            )
        mesh = make_mesh(data=dp)
        state = replicate_state(state, mesh)
        eval_step = make_sharded_eval_step(model, mesh, len(roi_idx))
        put = partial(shard_batch, mesh=mesh)
    else:
        eval_step = make_eval_step(model, len(roi_idx))
    general, pos, neg, _ = evaluate(
        eval_step, state, loader, len(roi_idx), save_path=args.save_path,
        device_put=put,
    )
    for tag, res in (("overall", general), ("abeta+", pos), ("abeta-", neg)):
        print(f"[{tag}] MAE={res.mae:.4f} MAPE={res.mape:.2f}% "
              f"RSE={res.rse:.4f} RRMSE={res.rrmse:.4f} SSIM={res.ssim:.4f} "
              f"avg_roi_corr={np.nanmean(res.roi_correlations):.4f} "
              f"(n={res.num_samples})")
    return 0


def cmd_infer(args) -> int:
    import jax

    from coma_unet_tpu.config import ROI_INDICES
    from coma_unet_tpu.data import (
        CovariateTable, DataLoader, InferenceVolumeDataset, PredictionTable,
    )
    from coma_unet_tpu.infer import make_infer_fn, sliding_window_inference
    from coma_unet_tpu.io.volume import write_tensor_to_nii
    from coma_unet_tpu.train import create_train_state, make_optimizer
    from coma_unet_tpu.train.checkpoint import CheckpointManager
    from coma_unet_tpu.utils.logging import setup_logging

    config = _experiment_config(args).normalized()
    setup_logging(None)
    model = _build_model(config)
    preds = (PredictionTable(args.predictions_json)
             if args.predictions_json else None)
    if args.cohort:
        # named per-cohort preset bundle (VolumeDataset_Inference.py:163-293)
        from coma_unet_tpu.data.cohorts import load_cohort_dataset

        if not args.cohort_dir:
            print("--cohort requires --cohort_dir", file=sys.stderr)
            return 2
        ds = load_cohort_dataset(
            args.cohort, args.cohort_dir,
            pad_dims=config.data.volume_shape,
            paths_csv=args.input_lookup,
        )
        preds = preds or ds.meta_tau_table
    else:
        if not args.input_lookup:
            print("--input_lookup is required without --cohort",
                  file=sys.stderr)
            return 2
        cov = CovariateTable(config.data.covariate_csv)
        ds = InferenceVolumeDataset(
            args.input_lookup, cov, meta_tau_table=preds,
            pad_dims=config.data.volume_shape,
        )
    loader = DataLoader(ds, 1, predictions=preds)
    example = next(iter(loader))
    state = create_train_state(
        model, make_optimizer(config.train.lr), jax.random.PRNGKey(0),
        (example["mri"], example["covars"], example["roi_loc"],
         example["roi_std"], example["roi_compact"]),
        {"train": True},
    )
    if args.checkpoint_path:
        mgr = CheckpointManager(os.path.dirname(
            os.path.dirname(args.checkpoint_path)))
        state, _, _ = mgr.restore(state, args.checkpoint_path)
    sp = max(int(getattr(args, "spatial_parallel", 1) or 1), 1)
    if sp > 1 and not args.sliding_window:
        # GSPMD model-parallel inference: the volume's (D, H) dims are sharded
        # over a ('data' x 'spatial') mesh and XLA inserts the halo exchanges
        # (SURVEY §2.8; the 2-axis mesh the reference's NCCL path never had).
        from coma_unet_tpu.parallel.mesh import make_mesh, make_spatial_infer_fn

        mesh = make_mesh(data=max(int(config.train.data_parallel), 1),
                         spatial=sp)
        infer = make_spatial_infer_fn(model, mesh)
    else:
        infer = make_infer_fn(model)
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    os.makedirs(args.out_dir, exist_ok=True)
    for bi, batch in enumerate(loader):
        if args.sliding_window:
            out = sliding_window_inference(
                infer, variables, np.asarray(batch["mri"]),
                np.asarray(batch["covars"]), np.asarray(batch["roi_loc"]),
                np.asarray(batch["roi_std"]), np.asarray(batch["roi_compact"]),
                patch_size=(args.patch_size,) * 3, overlap=args.overlap,
            )
        else:
            out = np.asarray(infer(
                variables, batch["mri"], batch["covars"], batch["roi_loc"],
                batch["roi_std"], batch["roi_compact"],
            ))
        sid = batch["sample_ids"][0].replace("/", "_") or f"sample_{bi}"
        path = os.path.join(args.out_dir, f"{sid}_synth_tau.nii")
        write_tensor_to_nii(out[0], path)
        print(f"wrote {path}")
        if getattr(args, "save_attention", False):
            from coma_unet_tpu.analysis import export_attention_maps

            export_attention_maps(
                model, variables, batch,
                os.path.join(args.out_dir, "attention"),
                sample_ids=batch["sample_ids"],
            )
    return 0


def main(argv: Optional[list] = None) -> int:
    from coma_unet_tpu.utils.compile_cache import prune_compile_cache

    prune_compile_cache()  # big-entry ingest has a slow tail; keep small hits (see util)
    args = build_parser().parse_args(argv)
    if args.command == "train":
        return cmd_train(args)
    if args.command == "validate":
        return cmd_validate(args)
    if args.command == "infer":
        return cmd_infer(args)
    return 1


if __name__ == "__main__":
    sys.exit(main())
