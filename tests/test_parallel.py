"""Multi-chip DP/SP tests on the forced 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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

    single = make_train_step(model, LossConfig(), donate=False)
    s1, aux1 = single(state, batch, roi_w, rng)

    mesh = make_mesh(data=8, spatial=1)
    sharded = make_sharded_train_step(model, LossConfig(), mesh, donate=False)
    sbatch = shard_batch(batch, mesh)
    sstate = replicate_state(state, mesh)
    s2, aux2 = sharded(sstate, sbatch, roi_w, rng)

    np.testing.assert_allclose(
        float(aux1["loss"]), float(aux2["loss"]), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(aux1["gen_loss"]), np.asarray(aux2["gen_loss"]), rtol=1e-4
    )
    # gradient agreement (psum'd DP grads == single-device grads): compare
    # global norms rather than post-Adam params — Adam's first step amplifies
    # ~1e-7 accumulation-order noise on near-zero gradients to +/-lr.
    np.testing.assert_allclose(
        float(aux1["grad_norm"]), float(aux2["grad_norm"]), rtol=1e-4
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
