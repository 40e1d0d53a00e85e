"""Quartile-template N-pair utilities + cross-val CLI plumbing."""

import numpy as np
import pytest

from coma_unet_tpu.io.nifti import write_nifti
from coma_unet_tpu.losses.templates import (
    load_quartile_templates,
    select_npair_templates,
)
from coma_unet_tpu.losses import npair_loss
import jax.numpy as jnp


@pytest.fixture()
def template_files(tmp_path):
    pos, neg = [], []
    for i in range(4):
        for tag, lst in (("pos", pos), ("neg", neg)):
            p = str(tmp_path / f"ab{tag}_quart{i+1}.nii")
            val = float(i + (10 if tag == "pos" else 0))
            write_nifti(p, np.full((8, 8, 8), val, np.float32),
                        spacing=(2.0, 2.0, 2.0))
            lst.append(p)
    return pos, neg


def test_load_and_select(template_files):
    pos, neg = template_files
    t = load_quartile_templates(pos, neg, target=(8, 8, 8), resize=False)
    assert t["pos"].shape == (4, 512)
    p, n = select_npair_templates(t, abeta=1, quartile=2)
    assert p[0] == 11.0  # pos quartile 2 -> value 10 + 1
    assert n.shape == (7, 512)
    assert 11.0 not in n[:, 0]
    p2, n2 = select_npair_templates(t, abeta=0, quartile=1)
    assert p2[0] == 0.0
    assert n2.shape == (7, 512)


def test_npair_with_templates(template_files):
    pos, neg = template_files
    t = load_quartile_templates(pos, neg, target=(8, 8, 8), resize=False)
    p, n = select_npair_templates(t, abeta=1, quartile=1)
    anchor = jnp.asarray(p[None] + 0.01)  # near the positive
    val = float(npair_loss(anchor, jnp.asarray(p), jnp.asarray(n)))
    assert np.isfinite(val)


def test_cross_val_flag_loops_folds(tmp_path, monkeypatch):
    """-cross_val triggers fold_1..fold_5 subdirectories."""
    import importlib

    # `coma_unet_tpu.cli.main` the attribute is shadowed by the exported
    # `main` function; fetch the module object explicitly.
    M = importlib.import_module("coma_unet_tpu.cli.main")

    calls = []

    def fake_train(model, cfg, tl, val_loader, save_path, resume_from=None,
                   **kwargs):
        calls.append((cfg.data.fold, save_path))

    monkeypatch.setattr(M, "_build_model", lambda cfg: object())
    monkeypatch.setattr(M, "_build_loaders", lambda a, c: (iter(()), None))
    import coma_unet_tpu.train.loop as L

    monkeypatch.setattr(L, "train", fake_train)
    args = M.build_parser().parse_args([
        "train", "-cross_val", "-save_path", str(tmp_path),
        "--covariate_csv", "x.csv",
    ])
    M.cmd_train(args)
    assert [c[0] for c in calls] == [1, 2, 3, 4, 5]
    assert all(f"fold_{k}" in p for (k, p) in calls)


def test_config_normalized_geometry():
    """Template space pads to 216^3 and the modulator prompt grid follows
    the volume shape (`VolumeDataset.py:121-126`, `validation.py:66-68`)."""
    import dataclasses

    from coma_unet_tpu.config import DataConfig, ExperimentConfig, ModelConfig

    # template space + default volume -> 216^3 everywhere
    cfg = ExperimentConfig(
        data=DataConfig(template_space=True)
    ).normalized()
    assert tuple(cfg.data.volume_shape) == (216, 216, 216)
    assert tuple(cfg.model.prompt_shape) == (216, 216, 216)

    # explicit volume shape wins; prompts follow it
    cfg = ExperimentConfig(
        model=ModelConfig(prompt_shape=(128, 128, 128)),
        data=DataConfig(template_space=True, volume_shape=(32, 32, 32)),
    ).normalized()
    assert tuple(cfg.data.volume_shape) == (32, 32, 32)
    assert tuple(cfg.model.prompt_shape) == (32, 32, 32)

    # already consistent -> returned unchanged (same object)
    base = ExperimentConfig()
    assert base.normalized() is base
    # idempotent + JSON roundtrip stays normalized
    cfg2 = ExperimentConfig.from_json(cfg.to_json()).normalized()
    assert dataclasses.asdict(cfg2) == dataclasses.asdict(cfg)
