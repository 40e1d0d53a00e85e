"""Segment-compiled train step == monolithic train step.

`make_split_train_step` compiles the flagship step as four chained XLA
programs (encoder fwd / decoder fwd+bwd / encoder bwd-with-recompute /
optimizer update) so the full packed Pallas family fits the remote TPU
compile helper's per-module Mosaic budget. These tests pin the contract the
split relies on: staged forwards reproduce the full forward exactly, and the
split step's loss/grads/updated params match `make_train_step` (reference
objective: `attn_unet_data_parallel.py:779-910`).

CPU (f32 compute): both paths lower to the same XLA fallback convs, so
agreement is to float tolerance, not design luck.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coma_unet_tpu.config import LossConfig, ModelConfig
from coma_unet_tpu.models import ContraAttnUNet
from coma_unet_tpu.train import create_train_state, make_optimizer
from coma_unet_tpu.train.step import (
    make_split_train_step,
    make_train_step,
    split_step_supported,
)
from tests.conftest import make_batch


def _state(model, batch, lr=1e-3):
    return create_train_state(
        model, make_optimizer(lr), jax.random.PRNGKey(0),
        (batch["mri"], batch["covars"], batch["roi_loc"], batch["roi_std"],
         batch["roi_compact"]),
        {"train": True},
    )


@pytest.fixture(scope="module")
def split_model_config():
    # packed_level=True so split_step_supported passes; at 16^3 the packed
    # predicate resolves False on both paths, which is exactly what CPU sees.
    return ModelConfig(
        channels=(4, 8, 16),
        strides=(2, 2, 2),
        latent_spaces=(32, 32, 32),
        prompt_shape=(16, 16, 16),
        num_experts=4,
        compute_dtype="float32",
    )


def test_staged_forward_matches_full(split_model_config, rng):
    model = ContraAttnUNet(split_model_config)
    batch = make_batch(rng)
    state = _state(model, batch)
    args = (batch["mri"], batch["covars"], batch["roi_loc"],
            batch["roi_std"], batch["roi_compact"])
    full = model.apply({"params": state.params}, *args, train=True,
                       with_projections=True,
                       rngs={"dropout": jax.random.PRNGKey(7)})
    feats = model.apply({"params": state.params}, batch["mri"],
                        batch["covars"], train=True, stage="encoder",
                        rngs={"dropout": jax.random.PRNGKey(7)})
    assert len(feats) == split_model_config.depth
    staged = model.apply({"params": state.params}, *args, train=True,
                         with_projections=True, stage="decoder",
                         encoder_feats=feats,
                         rngs={"dropout": jax.random.PRNGKey(7)})
    np.testing.assert_allclose(staged.out, full.out, rtol=1e-5, atol=1e-5)
    for a, b in zip(staged.projections, full.projections):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(staged.final_projection, full.final_projection,
                               rtol=1e-5, atol=1e-5)


def test_split_step_matches_monolithic(split_model_config, rng, monkeypatch):
    monkeypatch.setenv("COMA_TRAIN_SPLIT", "1")  # opt-in (see step.py)
    monkeypatch.delenv("COMA_TRAIN_PACKED", raising=False)
    monkeypatch.setenv("COMA_TRAIN_PACKED", "1")  # identical model variant
    model = ContraAttnUNet(split_model_config)
    lcfg = LossConfig()
    assert split_step_supported(model, lcfg)
    batch = make_batch(rng)
    batch["valid_mask"] = jnp.asarray([1.0, 0.0])  # exercise partial batch
    roi_w = jnp.full((36,), 225.0)
    step_rng = jax.random.PRNGKey(3)

    mono = make_train_step(model, lcfg, donate=False, return_grads=True)
    split = make_split_train_step(model, lcfg, donate=False,
                                  return_grads=True)

    s_mono, aux_mono = mono(_state(model, batch), batch, roi_w, step_rng)
    s_split, aux_split = split(_state(model, batch), batch, roi_w, step_rng)

    np.testing.assert_allclose(aux_split["loss"], aux_mono["loss"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(aux_split["gen_loss"], aux_mono["gen_loss"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(aux_split["tcds_loss"], aux_mono["tcds_loss"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(aux_split["grad_norm"], aux_mono["grad_norm"],
                               rtol=1e-4, atol=1e-6)

    flat_m = jax.tree_util.tree_leaves_with_path(aux_mono["grads"])
    flat_s = jax.tree_util.tree_leaves_with_path(aux_split["grads"])
    assert len(flat_m) == len(flat_s)
    for (pm, gm), (ps, gs) in zip(flat_m, flat_s):
        assert pm == ps
        # atol floor 1e-5: bias grads are sums of ~8k cotangents of ~1e-3
        # magnitude with heavy cancellation (net ~1e-5), so the f32 error
        # floor is set by the large intermediate terms, not the tiny result
        # — measured 3e-6 divergence between the two (mathematically equal)
        # accumulation orders. Real missing-grad-path bugs are O(leaf).
        np.testing.assert_allclose(
            gs, gm, rtol=1e-4, atol=1e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(pm)}",
        )
    for ((pm, wm), (ps, ws), (_, gm)) in zip(
        jax.tree_util.tree_leaves_with_path(s_mono.params),
        jax.tree_util.tree_leaves_with_path(s_split.params),
        jax.tree_util.tree_leaves_with_path(aux_mono["grads"]),
    ):
        # Adam's first-step update is ~ +-lr * sign(g): for elements whose
        # grad is at the f32 accumulation noise floor (|g| ~ 1e-5 +- 3e-6,
        # sums of ~8k cancelling ~1e-3 cotangents), the two mathematically
        # equal accumulation orders can flip the sign and move the param by
        # a full 2*lr. Compare only elements whose grad is 10x above that
        # floor; the grad comparison above already covers the rest.
        stable = np.abs(np.asarray(gm)) > 1e-4
        np.testing.assert_allclose(
            np.asarray(ws)[stable], np.asarray(wm)[stable],
            rtol=1e-4, atol=5e-5,
            err_msg=f"param mismatch at {jax.tree_util.keystr(pm)}",
        )
    assert int(s_split.step) == 1


def test_split_step_gating(split_model_config, monkeypatch):
    model = ContraAttnUNet(split_model_config)
    # default ON (fastest measured training config, see split_step_supported)
    monkeypatch.delenv("COMA_TRAIN_SPLIT", raising=False)
    assert split_step_supported(model, LossConfig())
    # kill switch restores the monolithic step
    monkeypatch.setenv("COMA_TRAIN_SPLIT", "0")
    assert not split_step_supported(model, LossConfig())
    monkeypatch.setenv("COMA_TRAIN_SPLIT", "1")
    assert split_step_supported(model, LossConfig())
    # tCDS (3-forward) path is not split-scheduled
    assert not split_step_supported(model, LossConfig(rnc=False))
    # nothing to gain without the packed family
    import dataclasses

    cfg = dataclasses.replace(split_model_config, packed_level=False)
    assert not split_step_supported(ContraAttnUNet(cfg), LossConfig())


def test_split_step_unfolded_update_matches(split_model_config, rng,
                                            monkeypatch):
    """fold_update=False (the large-volume/216^3 path: optimizer update as a
    4th program so the encoder-backward HBM peak excludes the AdamW state)
    is bit-for-bit the same math as the folded 3-program default."""
    monkeypatch.setenv("COMA_TRAIN_SPLIT", "1")
    model = ContraAttnUNet(split_model_config)
    lcfg = LossConfig()
    batch = make_batch(rng)
    batch["valid_mask"] = jnp.asarray([1.0, 0.0])
    roi_w = jnp.full((36,), 225.0)
    step_rng = jax.random.PRNGKey(9)
    folded = make_split_train_step(model, lcfg, donate=False,
                                   fold_update=True, merge_bwd=False)
    unfolded = make_split_train_step(model, lcfg, donate=False,
                                     fold_update=False)
    assert {"enc_bwd", "update"} <= set(unfolded.segments)
    s_f, aux_f = folded(_state(model, batch), batch, roi_w, step_rng)
    s_u, aux_u = unfolded(_state(model, batch), batch, roi_w, step_rng)
    np.testing.assert_allclose(aux_u["loss"], aux_f["loss"],
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(aux_u["grad_norm"], aux_f["grad_norm"],
                               rtol=1e-5, atol=1e-7)
    for (pf, wf), (_, wu) in zip(
        jax.tree_util.tree_leaves_with_path(s_f.params),
        jax.tree_util.tree_leaves_with_path(s_u.params),
    ):
        np.testing.assert_allclose(
            wu, wf, rtol=1e-6, atol=1e-7,
            err_msg=f"param mismatch at {jax.tree_util.keystr(pf)}",
        )


def test_split_step_merged_matches_three_program(split_model_config, rng,
                                                 monkeypatch):
    """merge_bwd=True (the 2-program default: enc_fwd + one merged
    decoder-grad/encoder-bwd/update program, sized for the relay's dynamic
    executable budget — every 2-program alternation runs at the sum of
    solos while 3-program chains can thrash, split_lean_probe.log) is the
    same math as the 3-program chain."""
    monkeypatch.setenv("COMA_TRAIN_SPLIT", "1")
    model = ContraAttnUNet(split_model_config)
    lcfg = LossConfig()
    batch = make_batch(rng)
    batch["valid_mask"] = jnp.asarray([1.0, 0.0])
    roi_w = jnp.full((36,), 225.0)
    step_rng = jax.random.PRNGKey(11)
    merged = make_split_train_step(model, lcfg, donate=False,
                                   merge_bwd=True, return_grads=True)
    assert set(merged.segments) == {"enc_fwd", "dec_bwd_update"}
    three = make_split_train_step(model, lcfg, donate=False,
                                  merge_bwd=False, return_grads=True)
    assert "dec_grad" in three.segments
    s_m, aux_m = merged(_state(model, batch), batch, roi_w, step_rng)
    s_t, aux_t = three(_state(model, batch), batch, roi_w, step_rng)
    np.testing.assert_allclose(aux_m["loss"], aux_t["loss"],
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(aux_m["grad_norm"], aux_t["grad_norm"],
                               rtol=1e-5, atol=1e-7)
    # fusing dec-grad + enc-bwd + add into one program reorders the f32
    # accumulation; compare params only where the grad is 10x above the
    # measured ~3e-6 noise floor (same rationale as the monolithic test)
    for ((pt, wt), (_, wm), (_, gm)) in zip(
        jax.tree_util.tree_leaves_with_path(s_t.params),
        jax.tree_util.tree_leaves_with_path(s_m.params),
        jax.tree_util.tree_leaves_with_path(aux_t["grads"]),
    ):
        stable = np.abs(np.asarray(gm)) > 1e-4
        np.testing.assert_allclose(
            np.asarray(wm)[stable], np.asarray(wt)[stable],
            rtol=1e-4, atol=5e-5,
            err_msg=f"param mismatch at {jax.tree_util.keystr(pt)}",
        )
    flat_t = jax.tree_util.tree_leaves_with_path(aux_t["grads"])
    flat_m = jax.tree_util.tree_leaves_with_path(aux_m["grads"])
    for (pt, gt), (_, gm) in zip(flat_t, flat_m):
        np.testing.assert_allclose(
            gm, gt, rtol=1e-4, atol=1e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(pt)}",
        )


def test_split_step_remat_variant_matches(split_model_config, rng,
                                          monkeypatch):
    """remat_blocks=True (the large-volume/216^3 path) produces the same
    loss/grads as the default remat-free segments — remat changes the
    recompute schedule, never the math."""
    monkeypatch.setenv("COMA_TRAIN_SPLIT", "1")
    model = ContraAttnUNet(split_model_config)
    lcfg = LossConfig()
    batch = make_batch(rng)
    roi_w = jnp.full((36,), 225.0)
    step_rng = jax.random.PRNGKey(5)
    s_off = make_split_train_step(model, lcfg, donate=False,
                                  remat_blocks=False)
    s_on = make_split_train_step(model, lcfg, donate=False,
                                 remat_blocks=True)
    _, aux_off = s_off(_state(model, batch), batch, roi_w, step_rng)
    _, aux_on = s_on(_state(model, batch), batch, roi_w, step_rng)
    np.testing.assert_allclose(aux_on["loss"], aux_off["loss"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(aux_on["grad_norm"], aux_off["grad_norm"],
                               rtol=1e-4, atol=1e-6)


def test_merged_fallback_path_matches_merged(split_model_config, rng,
                                             monkeypatch):
    """The merged step's 3-program compile fallback (COMA_SPLIT_MERGE_DEAD=1
    presets it; in production it engages when the remote compile helper
    rejects the merged module — r4) is numerically identical to the merged
    path."""
    monkeypatch.setenv("COMA_TRAIN_SPLIT", "1")
    monkeypatch.setenv("COMA_TRAIN_PACKED", "1")
    monkeypatch.setenv("COMA_SPLIT_MERGE", "1")
    model = ContraAttnUNet(split_model_config)
    lcfg = LossConfig()
    batch = make_batch(rng)
    roi_w = jnp.full((36,), 225.0)
    step_rng = jax.random.PRNGKey(3)

    merged = make_split_train_step(model, lcfg, donate=False,
                                   return_grads=True)
    monkeypatch.setenv("COMA_SPLIT_MERGE_DEAD", "1")
    fallback = make_split_train_step(model, lcfg, donate=False,
                                     return_grads=True)

    s_m, aux_m = merged(_state(model, batch), batch, roi_w, step_rng)
    s_f, aux_f = fallback(_state(model, batch), batch, roi_w, step_rng)

    np.testing.assert_allclose(aux_f["loss"], aux_m["loss"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(aux_f["grad_norm"], aux_m["grad_norm"],
                               rtol=1e-4, atol=1e-6)
    for (pm, gm), (pf, gf) in zip(
        jax.tree_util.tree_leaves_with_path(aux_m["grads"]),
        jax.tree_util.tree_leaves_with_path(aux_f["grads"]),
    ):
        assert pm == pf
        # atol 3e-5: same rationale as the monolithic-parity test above,
        # one more accumulation-order change (vjp-replay vs merged grad)
        np.testing.assert_allclose(
            gf, gm, rtol=1e-4, atol=3e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(pm)}",
        )
