"""Multi-chip DP/SP tests on the forced 8-device CPU mesh."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_data import cohort  # fixture reuse  # noqa: F401

from coma_unet_tpu.config import LossConfig
from coma_unet_tpu.models import ContraAttnUNet
from coma_unet_tpu.parallel import (
    make_mesh,
    make_sharded_train_step,
    shard_batch,
)
from coma_unet_tpu.parallel.mesh import replicate_state
from coma_unet_tpu.train import create_train_state, make_optimizer, make_train_step
from tests.conftest import make_batch


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8 and mesh.shape["spatial"] == 1
    mesh2 = make_mesh(data=4, spatial=2)
    assert mesh2.shape["data"] == 4 and mesh2.shape["spatial"] == 2


def test_dp_train_step_matches_single_device(tiny_model_config, rng):
    """Gradient all-reduce over the mesh == single-device step on the full
    batch (the DP correctness invariant)."""
    batch = make_batch(rng, b=8)
    model = ContraAttnUNet(tiny_model_config)
    tx = make_optimizer(1e-3)
    state = create_train_state(
        model, tx, rng,
        (batch["mri"], batch["covars"], batch["roi_loc"], batch["roi_std"],
         batch["roi_compact"]),
        {"train": True},
    )
    roi_w = jnp.full((36,), 225.0)

    single = make_train_step(model, LossConfig(), donate=False,
                             return_grads=True)
    s1, aux1 = single(state, batch, roi_w, rng)

    mesh = make_mesh(data=8, spatial=1)
    sharded = make_sharded_train_step(model, LossConfig(), mesh, donate=False,
                                      return_grads=True)
    sbatch = shard_batch(batch, mesh)
    sstate = replicate_state(state, mesh)
    s2, aux2 = sharded(sstate, sbatch, roi_w, rng)

    np.testing.assert_allclose(
        float(aux1["loss"]), float(aux2["loss"]), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(aux1["gen_loss"]), np.asarray(aux2["gen_loss"]), rtol=1e-4
    )
    # gradient agreement: psum'd DP grads == single-device grads per-leaf
    # (pre-optimizer — Adam's first step amplifies ~1e-7 accumulation-order
    # noise on near-zero gradients to +/-lr, so compare the raw pytrees).
    # atol scales with each leaf's magnitude: leaves whose gradient is pure
    # cancellation residue (values ~1e-6 from +/-1 summands) legitimately
    # differ in f32 between per-shard-then-psum and single-sum reduction
    # orders, while a sign/value error on any meaningful leaf still fails.
    g1 = jax.tree.leaves(aux1["grads"])
    g2 = jax.tree.leaves(aux2["grads"])
    assert len(g1) == len(g2) and len(g1) > 0
    # atol 1e-4: scalar leaves like the PReLU slope sum +/- contributions
    # over every voxel, so their ~1e-5 gradients carry reduction-order noise
    # of the same size; any leaf with |grad| above ~1e-4 is still checked
    # tightly through rtol.
    for a, b in zip(g1, g2):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(
            a, b, rtol=1e-3, atol=1e-4 * (1.0 + float(np.abs(b).max()))
        )


def test_spatial_sharding_compiles(tiny_model_config, rng):
    """2-way DP x 4-way spatial sharding of the volume depth dim (XLA halo
    exchange for convs) compiles and runs."""
    batch = make_batch(rng, b=2)
    model = ContraAttnUNet(tiny_model_config)
    tx = make_optimizer(1e-3)
    state = create_train_state(
        model, tx, rng,
        (batch["mri"], batch["covars"], batch["roi_loc"], batch["roi_std"],
         batch["roi_compact"]),
        {"train": True},
    )
    mesh = make_mesh(data=2, spatial=4)
    step = make_sharded_train_step(model, LossConfig(), mesh, donate=False)
    sbatch = shard_batch(batch, mesh, spatial=True)
    sstate = replicate_state(state, mesh)
    roi_w = jnp.full((36,), 225.0)
    _, aux = step(sstate, sbatch, roi_w, rng)
    assert np.isfinite(float(aux["loss"]))


def test_cli_dp_train_matches_single_device(cohort, tmp_path):  # noqa: F811
    """The production path: `train --data_parallel 8` over the CLI produces
    validation metrics allclose to the single-device run (the reference's
    dead `DataParallel` intent, `attn_unet_data_parallel.py:32`, made real)."""
    import pandas as pd

    from coma_unet_tpu.cli import main

    splits = tmp_path / "splits"
    splits.mkdir()
    df = pd.read_csv(cohort["lookup"])
    df.to_csv(str(splits / "training_lookup_1.csv"), index=False)
    df.to_csv(str(splits / "test_lookup_1.csv"), index=False)
    cfg = {
        "model": {"channels": [4, 8], "strides": [2, 2],
                  "latent_spaces": [16, 16], "prompt_shape": [16, 16, 16],
                  "num_experts": 2, "compute_dtype": "float32"},
        "loss": {"cds_weights": [0.0, 1.0]},
        "train": {"epochs": 1, "batch_size": 8, "val_iter": 1,
                  "adaptive_roi_weights": False},
        "data": {"volume_shape": [16, 16, 16]},
    }
    cfg_path = str(tmp_path / "cfg.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)

    finals = {}
    for tag, extra in (("single", []), ("dp", ["--data_parallel", "8"])):
        save = tmp_path / f"results_{tag}"
        rc = main([
            "train", "--config", cfg_path,
            "--splits_dir", str(splits), "--fold", "1",
            "--covariate_csv", cohort["cov"],
            "--quartile_csv", cohort["quart"],
            "--predictions_json", cohort["preds"],
            "-save_path", str(save),
        ] + extra)
        assert rc == 0
        run = next(save.iterdir())
        mdir = run / "validation_metric_results"
        finals[tag] = {
            m: float(pd.read_csv(str(mdir / f"{m}.csv")).iloc[0, -1])
            for m in ("mae", "mape", "avg_corr")
        }
    for m, v in finals["single"].items():
        np.testing.assert_allclose(finals["dp"][m], v, rtol=1e-3, atol=1e-5)


def test_sharded_eval_matches_single(tiny_model_config, rng):
    from coma_unet_tpu.parallel.mesh import make_sharded_eval_step
    from coma_unet_tpu.train import make_eval_step

    batch = make_batch(rng, b=8)
    model = ContraAttnUNet(tiny_model_config)
    tx = make_optimizer(1e-3)
    state = create_train_state(
        model, tx, rng,
        (batch["mri"], batch["covars"], batch["roi_loc"], batch["roi_std"],
         batch["roi_compact"]),
        {"train": True},
    )
    single = make_eval_step(model, 36)
    pred1, vox1, roi1 = single(state, batch)

    mesh = make_mesh(data=8, spatial=1)
    sharded = make_sharded_eval_step(model, mesh, 36)
    sbatch = shard_batch(batch, mesh)
    sstate = replicate_state(state, mesh)
    pred2, vox2, roi2 = sharded(sstate, sbatch)
    np.testing.assert_allclose(np.asarray(pred1), np.asarray(pred2),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vox1["mae"]), np.asarray(vox2["mae"]),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(roi1["mae"]), np.asarray(roi2["mae"]),
                               rtol=1e-3, atol=1e-5)


def test_dp_reg_weight_and_valid_mask_match_single_device(
    tiny_model_config, rng
):
    """Sharded == single-device objective with BOTH previously-uncovered
    couplings live: `reg_weight != 0` (the pred-space triplet,
    `criterions.py:544-575`) and a wrap-pad `valid_mask` with UNEQUAL
    per-shard valid counts (batch-coupled means can't be computed per-shard;
    mesh.local_loss all-gathers the projections)."""
    batch = make_batch(rng, b=8, with_triplet=True)
    batch["valid_mask"] = jnp.asarray([1, 1, 1, 0, 1, 1, 1, 0], jnp.float32)
    cfg = LossConfig(rnc=False, reg_weight=1.0, cds_weights=(0.0, 1.0, 4.0))
    model = ContraAttnUNet(tiny_model_config)
    tx = make_optimizer(1e-3)
    state = create_train_state(
        model, tx, rng,
        (batch["mri"], batch["covars"], batch["roi_loc"], batch["roi_std"],
         batch["roi_compact"]),
        {"train": True},
    )
    roi_w = jnp.full((36,), 225.0)

    single = make_train_step(model, cfg, donate=False, return_grads=True)
    _, aux1 = single(state, batch, roi_w, rng)

    mesh = make_mesh(data=8, spatial=1)
    sharded = make_sharded_train_step(model, cfg, mesh, donate=False,
                                      return_grads=True)
    _, aux2 = sharded(replicate_state(state, mesh),
                      shard_batch(batch, mesh), roi_w, rng)

    for k in ("loss", "pred_space_loss", "tcds_loss"):
        np.testing.assert_allclose(float(aux1[k]), float(aux2[k]), rtol=1e-4)
    assert float(aux1["pred_space_loss"]) > 0.0
    g1, g2 = jax.tree.leaves(aux1["grads"]), jax.tree.leaves(aux2["grads"])
    assert len(g1) == len(g2) and len(g1) > 0
    for a, b in zip(g1, g2):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(
            a, b, rtol=1e-3, atol=1e-4 * (1.0 + float(np.abs(b).max()))
        )


import pytest


@pytest.mark.parametrize("fold_update", [True, False])
def test_sharded_split_step_matches_single_device(tiny_model_config, rng,
                                                  monkeypatch, fold_update):
    """The segmented DP step (3 shard_map programs — the multi-chip packed-
    family path; 4 with fold_update=False, the large-volume variant) == the
    single-device split step on the full batch: loss, psum'd grads, and
    updated params."""
    from coma_unet_tpu.parallel.mesh import make_sharded_split_train_step
    from coma_unet_tpu.train.step import (
        make_split_train_step,
        split_step_supported,
    )

    monkeypatch.setenv("COMA_TRAIN_SPLIT", "1")
    batch = make_batch(rng, b=8)
    model = ContraAttnUNet(tiny_model_config)
    assert split_step_supported(model, LossConfig())
    state = create_train_state(
        model, make_optimizer(1e-3), rng,
        (batch["mri"], batch["covars"], batch["roi_loc"], batch["roi_std"],
         batch["roi_compact"]),
        {"train": True},
    )
    roi_w = jnp.full((36,), 225.0)

    single = make_split_train_step(model, LossConfig(), donate=False,
                                   return_grads=True)
    s1, aux1 = single(state, batch, roi_w, rng)

    mesh = make_mesh(data=8, spatial=1)
    sharded = make_sharded_split_train_step(
        model, LossConfig(), mesh, donate=False, return_grads=True,
        fold_update=fold_update)
    s2, aux2 = sharded(replicate_state(state, mesh),
                       shard_batch(batch, mesh), roi_w, rng)

    np.testing.assert_allclose(float(aux1["loss"]), float(aux2["loss"]),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(aux1["gen_loss"]),
                               np.asarray(aux2["gen_loss"]), rtol=1e-4)
    g1, g2 = jax.tree.leaves(aux1["grads"]), jax.tree.leaves(aux2["grads"])
    assert len(g1) == len(g2) and len(g1) > 0
    # same tolerance rationale as test_dp_train_step_matches_single_device
    for a, b in zip(g1, g2):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(
            a, b, rtol=1e-3, atol=1e-4 * (1.0 + float(np.abs(b).max()))
        )
