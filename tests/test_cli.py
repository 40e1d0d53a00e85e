"""CLI end-to-end tests over the synthetic cohort (tiny config via JSON)."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from coma_unet_tpu.cli import build_parser, main
from tests.test_data import cohort  # fixture reuse  # noqa: F401


@pytest.fixture()
def tiny_config_file(tmp_path):
    cfg = {
        "model": {
            "channels": [4, 8], "strides": [2, 2], "latent_spaces": [16, 16],
            "prompt_shape": [16, 16, 16], "num_experts": 2,
            "compute_dtype": "float32",
        },
        "loss": {"cds_weights": [0.0, 1.0]},
        "train": {"epochs": 1, "batch_size": 2, "val_iter": 1,
                  "adaptive_roi_weights": False},
        "data": {"volume_shape": [16, 16, 16]},
        "save_path": str(tmp_path / "results"),
    }
    p = str(tmp_path / "config.json")
    with open(p, "w") as f:
        json.dump(cfg, f)
    return p


def test_parser_surface():
    p = build_parser()
    args = p.parse_args([
        "train", "-save_path", "x", "-model_type", "ContraAttnUNET",
        "-batch_size", "2", "-covariates", "-rnc", "--fold", "4",
    ])
    assert args.command == "train"
    assert args.batch_size == 2


def test_cli_train_and_validate(cohort, tiny_config_file, tmp_path):  # noqa: F811
    # arrange fold lookups: fold 1 = all 8 samples train, same as test
    splits = tmp_path / "splits"
    splits.mkdir()
    df = pd.read_csv(cohort["lookup"])
    df.to_csv(str(splits / "training_lookup_1.csv"), index=False)
    df.iloc[:4].to_csv(str(splits / "test_lookup_1.csv"), index=False)

    rc = main([
        "train", "--config", tiny_config_file,
        "--splits_dir", str(splits), "--fold", "1",
        "--covariate_csv", cohort["cov"], "--quartile_csv", cohort["quart"],
        "--predictions_json", cohort["preds"],
    ])
    assert rc == 0
    # a timestamped run dir with checkpoints + metrics exists
    results = tmp_path / "results"
    runs = list(results.iterdir())
    assert len(runs) == 1
    run = runs[0]
    assert (run / "checkpoints" / "checkpoint_latest_epoch").exists()
    assert (run / "validation_metric_results" / "mae.csv").exists()
    assert (run / "config.json").exists()

    # validate from the checkpoint
    rc = main([
        "validate", "--config", tiny_config_file,
        "--test_lookup", str(splits / "test_lookup_1.csv"),
        "--covariate_csv", cohort["cov"], "--quartile_csv", cohort["quart"],
        "--predictions_json", cohort["preds"],
        "-checkpoint_path", str(run / "checkpoints" / "checkpoint_latest_epoch"),
        "-save_path", str(tmp_path / "val_out"),
    ])
    assert rc == 0


def test_holdout_filtering_excludes_training_subjects(
    cohort, tiny_config_file, tmp_path,  # noqa: F811
):
    """`--holdout_ids` removes the named subjects from the TRAINING loader
    only (ref `attn_unet_data_parallel.py:785-791` intent; the reference's
    mask is broken, `data_util.py:701-714`)."""
    from coma_unet_tpu.cli.main import _build_loaders, _experiment_config

    splits = tmp_path / "splits"
    splits.mkdir()
    df = pd.read_csv(cohort["lookup"])
    df.to_csv(str(splits / "training_lookup_1.csv"), index=False)
    df.to_csv(str(splits / "test_lookup_1.csv"), index=False)
    held = "001-S-1001/PET_2020-01-01_FTP"
    p = build_parser()
    args = p.parse_args([
        "train", "--config", tiny_config_file,
        "--splits_dir", str(splits), "--fold", "1",
        "--covariate_csv", cohort["cov"], "--quartile_csv", cohort["quart"],
        "--predictions_json", cohort["preds"],
        "--holdout_ids", held,
    ])
    config = _experiment_config(args)
    assert config.data.holdout_ids == (held,)
    train_loader, test_loader = _build_loaders(args, config)
    train_ids = [i for b in train_loader for i in b["sample_ids"]]
    test_ids = [i for b in test_loader for i in b["sample_ids"]]
    assert held not in train_ids
    assert len(set(train_ids)) == 7
    assert held in test_ids  # eval still sees the holdout subject


def test_cli_infer(cohort, tiny_config_file, tmp_path):  # noqa: F811
    out_dir = str(tmp_path / "synth")
    rc = main([
        "infer", "--config", tiny_config_file,
        "--input_lookup", cohort["lookup"],
        "--covariate_csv", cohort["cov"],
        "--predictions_json", cohort["preds"],
        "--out_dir", out_dir,
    ])
    assert rc == 0
    outs = os.listdir(out_dir)
    assert len(outs) == 8
    from coma_unet_tpu.io.volume import load_nifti_vol

    vol = load_nifti_vol(os.path.join(out_dir, outs[0]), resize=False)
    assert vol.shape == (1, 16, 16, 16)
    assert np.isfinite(vol).all()


def test_resume_run_dir_semantics():
    """Resuming redirects outputs to native_target_finetune_<orig run dir>
    (`validation.py:225`); fresh runs get a timestamp (`run.sh:9`)."""
    import re
    from types import SimpleNamespace

    from coma_unet_tpu.cli.main import _run_dir_name

    args = SimpleNamespace(
        resume_training=True,
        checkpoint_path="/results/2026-01-02_03-04-05/checkpoints/latest",
    )
    assert _run_dir_name(args) == \
        "native_target_finetune_2026-01-02_03-04-05"
    fresh = SimpleNamespace(resume_training=False, checkpoint_path=None)
    assert re.fullmatch(r"\d{4}-\d{2}-\d{2}_\d{2}-\d{2}-\d{2}",
                        _run_dir_name(fresh))


def test_cli_infer_spatial_parallel(cohort, tiny_config_file, tmp_path):  # noqa: F811
    """GSPMD model-parallel inference through the CLI: the volume's spatial
    dims shard over the ('data' x 'spatial') mesh (SURVEY §2.8)."""
    out_dir = str(tmp_path / "synth_sp")
    rc = main([
        "infer", "--config", tiny_config_file,
        "--input_lookup", cohort["lookup"],
        "--covariate_csv", cohort["cov"],
        "--predictions_json", cohort["preds"],
        "--out_dir", out_dir,
        "--spatial_parallel", "4",
    ])
    assert rc == 0
    outs = sorted(os.listdir(out_dir))
    assert len(outs) == 8
    from coma_unet_tpu.io.volume import load_nifti_vol

    vol = load_nifti_vol(os.path.join(out_dir, outs[0]), resize=False)
    assert vol.shape == (1, 16, 16, 16)
    assert np.isfinite(vol).all()


def test_cli_train_single_split(cohort, tiny_config_file, tmp_path):  # noqa: F811
    """Explicit --train_lookup/--test_lookup_file override the fold layout
    (the ADNI-train/A4-test `single_split_validation` driver,
    `validation.py:392-477`)."""
    df = pd.read_csv(cohort["lookup"])
    train_csv = str(tmp_path / "adni_train.csv")
    test_csv = str(tmp_path / "a4_test.csv")
    df.iloc[:6].to_csv(train_csv, index=False)
    df.iloc[6:].to_csv(test_csv, index=False)
    rc = main([
        "train", "--config", tiny_config_file,
        "--train_lookup", train_csv,
        "--test_lookup_file", test_csv,
        "--covariate_csv", cohort["cov"],
        "--quartile_csv", cohort["quart"],
        "--predictions_json", cohort["preds"],
    ])
    assert rc == 0
    results = os.listdir(str(tmp_path / "results"))
    assert len(results) == 1
    run_dir = str(tmp_path / "results" / results[0])
    assert os.path.exists(os.path.join(run_dir, "validation_metric_results",
                                       "mae.csv"))
