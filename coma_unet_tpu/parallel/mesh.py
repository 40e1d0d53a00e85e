"""Device-mesh parallelism.

The reference imports torch `DataParallel` but never enables it
(`attn_unet_data_parallel.py:32`, wrap sites commented at
`validation.py:268-269`); its parallelism story is aspirational. Here data
parallelism is real and TPU-native, expressed as explicit SPMD:

  * TRAINING — `jax.shard_map` over a `Mesh(('data',))`: each shard runs the
    full model on its local batch slice (the expert-mixture CondConv folds
    batch into conv feature groups, so the per-device program must see the
    local batch — explicit SPMD, not GSPMD sharding propagation), gradients
    are `psum` over ICI, and the batch-coupled RnC loss stays *globally
    exact* by all-gathering the (tiny) projection embeddings before ranking.
  * INFERENCE — GSPMD `jit` with the volume's spatial dims sharded across the
    mesh (XLA inserts conv halo exchanges automatically); per-device batch of
    1 makes the conditional conv a plain conv, which partitions fine.

The same code runs on one chip, a v5e-8 slice, or a forced-host-device CPU
mesh for tests; multi-host DCN extends through the same mesh abstraction.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from coma_unet_tpu.config import LossConfig


def make_mesh(
    data: int = -1,
    spatial: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Mesh over ('data', 'spatial'). data=-1 uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % spatial == 0
        data = n // spatial
    if data * spatial > n:
        raise ValueError(f"mesh {data}x{spatial} > {n} devices")
    dev_array = np.asarray(devices[: data * spatial]).reshape(data, spatial)
    return Mesh(dev_array, ("data", "spatial"))


def batch_sharding(mesh: Mesh, ndim: int, spatial_axis: Optional[int] = None):
    spec = [None] * ndim
    spec[0] = "data"
    if spatial_axis is not None and mesh.shape["spatial"] > 1 and ndim > spatial_axis:
        spec[spatial_axis] = "spatial"
    return NamedSharding(mesh, P(*spec))


def replicate_sharding(mesh: Mesh):
    return NamedSharding(mesh, P())


# Batch keys that stay on host (strings / bookkeeping masks), never sharded.
HOST_BATCH_KEYS = ("sample_ids", "tau_paths", "valid")


def shard_batch(batch: Dict[str, jnp.ndarray], mesh: Mesh, spatial: bool = False):
    """Place a host batch dict onto the mesh: batch dim over 'data' (and the
    volume depth over 'spatial' when requested, for GSPMD inference).
    Host-side bookkeeping entries (`HOST_BATCH_KEYS`) pass through untouched,
    so the loader's `device_put` hook can take the whole collated batch."""

    def _put(x):
        x = jnp.asarray(x)
        # NCDHW: depth is axis 2 for 5-d volumes, axis 1 for [B, D, H, W] ids
        ax = (2 if x.ndim == 5 else 1) if (spatial and x.ndim >= 4) else None
        return jax.device_put(x, batch_sharding(mesh, x.ndim, ax))

    return {
        k: (v if k in HOST_BATCH_KEYS else _put(v)) for k, v in batch.items()
    }


def replicate_state(state, mesh: Mesh):
    return jax.device_put(state, replicate_sharding(mesh))


def _batch_specs(batch: Dict[str, Any]) -> Dict[str, P]:
    return {k: P("data") for k in batch}


def make_sharded_train_step(model, loss_config: LossConfig, mesh: Mesh,
                            donate: bool = True, return_grads: bool = False):
    """DP train step via shard_map; numerically identical to the single-device
    `train.step.make_train_step` on the concatenated batch.

    Per-shard: forward + composite loss with
      * gen loss summed locally then `psum` over 'data';
      * RnC computed on `all_gather`ed final projections + labels (exact
        global ranking; the embeddings are [B, latent] — bytes, not volumes);
      * grads `psum` over 'data' (total-loss gradient, matching the
        reference's sum-reduced objective).
    """
    from coma_unet_tpu.train.step import train_model_variant

    model = train_model_variant(model)
    from coma_unet_tpu.losses.contrastive import (
        rnc_loss,
        triplet_loss,
        truncated_cds,
    )
    from coma_unet_tpu.losses.roi_losses import roi_mse
    from coma_unet_tpu.train.step import (
        _apply,
        optax_global_norm,
        pack_host_metrics,
    )

    cfg = loss_config
    n_shards = mesh.shape["data"]

    # Gradient-correctness note: each shard differentiates a *local*
    # objective whose shard-coupled terms (the globally-gathered RnC / the
    # global triplet mean) are scaled by 1/n_shards. Every shard computes the
    # identical coupled value, so after `psum(grads)` the coupled term's
    # gradient is counted exactly once and the summed gen term exactly once —
    # psum(local_obj) is then exactly the reference's total loss.
    def local_loss(params, batch_stats, batch, roi_weights, rng, voxel_weights):
        gather = lambda t: jax.lax.all_gather(t, "data", axis=0, tiled=True)  # noqa: E731
        valid = batch.get("valid_mask")
        gvalid = gather(valid) if valid is not None else None
        outs, new_bs = _apply(model, params, batch_stats, batch, "", True, rng, True)
        gen = roi_mse(outs.out, batch["tau"], batch["roi_compact"], roi_weights,
                      voxel_weights=voxel_weights, reduction=None)
        vsum = gen if valid is None else gen * valid.reshape(-1).astype(gen.dtype)
        obj = cfg.gen_weight * jnp.sum(vsum)
        pred_space = jnp.asarray(0.0, jnp.float32)
        if cfg.rnc:
            feats = gather(outs.projections[-1])
            labels = gather(batch["covars"])
            tcds_full = cfg.ds_reg_weight * rnc_loss(
                feats, labels, cfg.rnc_temperature, valid=gvalid
            )
        else:
            pos_outs, new_bs = _apply(model, params, new_bs, batch, "pos_", True, rng, True)
            neg_outs, new_bs = _apply(model, params, new_bs, batch, "neg_", True, rng, True)
            # batch-coupled means (the per-level triplet means and the
            # pred-space triplet) are computed on the GLOBAL batch by
            # all-gathering the projections (tiny [B, latent] embeddings) —
            # exact under wrap-pad masks with unequal per-shard valid counts;
            # scaled 1/n_shards so psum(grads) counts the coupled term once
            # (the all_gather transpose psums the replicated cotangents).
            tcds_full = cfg.ds_reg_weight * truncated_cds(
                [gather(p) for p in outs.projections],
                [gather(p) for p in pos_outs.projections],
                [gather(p) for p in neg_outs.projections],
                cfg.cds_weights, margin=cfg.triplet_margin, valid=gvalid,
            )
            if cfg.reg_weight != 0.0:
                # pred-space slot (`criterions.py:544-575`): same global
                # treatment — restores sharded == single-device objective
                # parity for reg_weight != 0.
                a, p, n = (gather(outs.final_projection),
                           gather(pos_outs.final_projection),
                           gather(neg_outs.final_projection))
                pred_space = cfg.reg_weight * triplet_loss(
                    a, p, n, margin=cfg.triplet_margin, valid=gvalid
                )
                obj = obj + pred_space / n_shards
        obj = obj + tcds_full / n_shards
        aux = {
            "gen_loss": gen,
            "tcds_loss": tcds_full / n_shards,
            "pred_space_loss": pred_space / n_shards,
            "batch_stats": new_bs,
        }
        return obj, aux

    state_spec = P()  # replicated

    def spmd_step(state, batch, roi_weights, rng, voxel_weights):
        (obj, aux), grads = jax.value_and_grad(local_loss, has_aux=True)(
            state.params, state.batch_stats, batch, roi_weights, rng,
            voxel_weights,
        )
        grads = jax.lax.psum(grads, "data")
        # batch_stats come from each shard's local slice; pmean keeps the
        # replicated state actually replicated (SyncBN semantics when
        # ModelConfig.norm == 'batch').
        new_bs = aux.pop("batch_stats")
        if new_bs:
            new_bs = jax.lax.pmean(new_bs, "data")
        new_state = state.apply_gradients(grads).replace(batch_stats=new_bs)
        aux["loss"] = jax.lax.psum(jax.lax.stop_gradient(obj), "data")
        aux["gen_loss"] = jax.lax.all_gather(
            aux["gen_loss"], "data", axis=0, tiled=True
        )  # [B_total], replicated
        # coupled terms are reported as value/n_shards per shard; psum
        # restores the full (replicated) value.
        for k in ("tcds_loss", "pred_space_loss"):
            aux[k] = jax.lax.psum(jax.lax.stop_gradient(aux[k]), "data")
        aux["grad_norm"] = optax_global_norm(grads)
        pack_host_metrics(aux)  # after the psums: fused leaf = global values
        if return_grads:
            aux["grads"] = grads  # psum'd (replicated) — test/debug only
        return new_state, aux

    def step(state, batch, roi_weights, rng, voxel_weights=None):
        shard = jax.shard_map(
            spmd_step,
            mesh=mesh,
            in_specs=(state_spec, _batch_specs(batch), P(), P(), P()),
            out_specs=(state_spec, P()),
            check_vma=False,
        )
        return shard(state, batch, roi_weights, rng, voxel_weights)

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_sharded_split_train_step(model, loss_config: LossConfig, mesh: Mesh,
                                  donate: bool = True,
                                  return_grads: bool = False,
                                  remat_blocks=None,
                                  fold_update=None):
    """DP composition of `train.step.make_split_train_step`: the three
    chained programs (encoder fwd / decoder grad / encoder bwd + update)
    each wrap a `shard_map` over the 'data' axis, so multi-chip training
    runs the FULL packed/strided Pallas family — the monolithic sharded
    step must trace the packed-off variant for the same compile-budget
    reason as the single-device one (each per-device fwd+bwd module carries
    every Mosaic kernel). Collective accounting matches
    `make_sharded_train_step` exactly: the RnC term ranks all-gathered
    projections scaled 1/n_shards, decoder grads psum in program 2, encoder
    grads psum in program 3, and psum(local objectives) reproduces the
    single-device total loss. Flagship RnC path, no BatchNorm
    (`split_step_supported` gates callers)."""
    from coma_unet_tpu.losses.contrastive import rnc_loss
    from coma_unet_tpu.losses.roi_losses import roi_mse
    from coma_unet_tpu.train.step import (
        _compile_retry,
        _with_policy,
        default_segment_policies,
        optax_global_norm,
        pack_host_metrics,
        train_remat_variant,
    )

    seg_policies = default_segment_policies()

    cfg = loss_config
    if not cfg.rnc:
        raise ValueError("sharded split step supports the RnC path only")
    model = train_remat_variant(model, remat_blocks)
    n_shards = mesh.shape["data"]

    def enc_local(params, batch, rng):
        return model.apply(
            {"params": params}, batch["mri"], batch["covars"],
            train=True, rngs={"dropout": rng}, stage="encoder",
        )

    def _shard(fn, in_specs, out_specs):
        return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)

    def _enc_fwd(params, batch, rng):
        return _shard(
            enc_local,
            (P(), _batch_specs(batch), P()),
            P("data"),
        )(params, batch, rng)

    def dec_local(params, feats, batch, roi_weights, rng, voxel_weights):
        gather = lambda t: jax.lax.all_gather(t, "data", axis=0, tiled=True)  # noqa: E731
        valid = batch.get("valid_mask")

        def loss_fn(p, f):
            outs = model.apply(
                {"params": p}, batch["mri"], batch["covars"],
                batch.get("roi_loc"), batch.get("roi_std"),
                batch.get("roi_compact"), train=True, with_projections=True,
                rngs={"dropout": rng}, stage="decoder", encoder_feats=f,
            )
            gen = roi_mse(outs.out, batch["tau"], batch["roi_compact"],
                          roi_weights, voxel_weights=voxel_weights,
                          reduction=None)
            vsum = (gen if valid is None
                    else gen * valid.reshape(-1).astype(gen.dtype))
            obj = cfg.gen_weight * jnp.sum(vsum)
            gvalid = gather(valid) if valid is not None else None
            tcds_full = cfg.ds_reg_weight * rnc_loss(
                gather(outs.projections[-1]), gather(batch["covars"]),
                cfg.rnc_temperature, valid=gvalid,
            )
            # 1/n_shards: every shard computes the identical coupled value,
            # so psum(grads) counts its gradient exactly once (see
            # make_sharded_train_step's accounting note)
            obj = obj + tcds_full / n_shards
            return obj, (gen, tcds_full)

        (obj, (gen, tcds_full)), (g_dec, g_feats) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, feats)
        aux = {
            "loss": jax.lax.psum(jax.lax.stop_gradient(obj), "data"),
            "gen_loss": jax.lax.all_gather(gen, "data", axis=0, tiled=True),
            "tcds_loss": jax.lax.stop_gradient(tcds_full),
            "pred_space_loss": jnp.asarray(0.0, jnp.float32),
        }
        pack_host_metrics(aux)  # post-psum/gather values: global metrics
        return aux, jax.lax.psum(g_dec, "data"), g_feats

    def _dec_grad(params, feats, batch, roi_weights, rng, voxel_weights):
        return _shard(
            dec_local,
            (P(), P("data"), _batch_specs(batch), P(), P(), P()),
            (P(), P(), P("data")),
        )(params, feats, batch, roi_weights, rng, voxel_weights)

    def ebu_local(state, batch, rng, g_feats, g_dec):
        _, vjp_fn = jax.vjp(lambda p: enc_local(p, batch, rng), state.params)
        g_enc = vjp_fn(g_feats)[0]
        grads = jax.tree.map(
            jnp.add, jax.lax.psum(g_enc, "data"), g_dec
        )
        new_state = state.apply_gradients(grads)
        gn = optax_global_norm(grads)
        return new_state, (gn, grads) if return_grads else (gn,)

    def _ebu(state, batch, rng, g_feats, g_dec):
        return _shard(
            ebu_local,
            (P(), _batch_specs(batch), P(), P("data"), P()),
            (P(), P()),
        )(state, batch, rng, g_feats, g_dec)

    def _seg(fn, name):
        # same per-segment kernel-family mix as the single-device split
        # step (relay executable-cache budget, train/step.py)
        return _with_policy(_compile_retry(fn, "sharded_" + name),
                            seg_policies.get(name))

    enc_fwd = _seg(jax.jit(_enc_fwd), "enc_fwd")
    dec_grad = _seg(
        jax.jit(_dec_grad, donate_argnums=(1,) if donate else ()),
        "dec_grad")
    if fold_update is None:
        import os

        fold_update = os.environ.get("COMA_SPLIT_FOLD", "1") == "1"
    if fold_update:
        enc_bwd_update = _seg(
            jax.jit(_ebu, donate_argnums=(0, 3, 4) if donate else ()),
            "enc_bwd_update")
    else:
        # unfolded (4-program) variant for large volumes — mirrors
        # train.step.make_split_train_step(fold_update=False): folding the
        # AdamW update into the encoder backward adds the optimizer state +
        # new params to that segment's per-device HBM peak (ResourceExhausted
        # at 216^3 on v5e, artifacts/r3/probe_216_reduce_fix.log)
        def eb_local(params, batch, rng, g_feats):
            _, vjp_fn = jax.vjp(lambda p: enc_local(p, batch, rng), params)
            return jax.lax.psum(vjp_fn(g_feats)[0], "data")

        def _enc_bwd(params, batch, rng, g_feats):
            return _shard(
                eb_local,
                (P(), _batch_specs(batch), P(), P("data")),
                P(),
            )(params, batch, rng, g_feats)

        def _update(state, g_dec, g_enc):
            grads = jax.tree.map(jnp.add, g_dec, g_enc)
            new_state = state.apply_gradients(grads)
            gn = optax_global_norm(grads)
            return new_state, (gn, grads) if return_grads else (gn,)

        enc_bwd = _seg(
            jax.jit(_enc_bwd, donate_argnums=(3,) if donate else ()),
            "enc_bwd")
        upd = _seg(
            jax.jit(_update, donate_argnums=(0, 1, 2) if donate else ()),
            "update")

        def enc_bwd_update(state, batch, rng, g_feats, g_dec):
            g_enc = enc_bwd(state.params, batch, rng, g_feats)
            return upd(state, g_dec, g_enc)

    def train_step(state, batch, roi_weights, rng, voxel_weights=None):
        if state.batch_stats:
            raise ValueError(
                "sharded split step does not thread batch_stats; use "
                "norm='instance' or make_sharded_train_step"
            )
        feats = enc_fwd(state.params, batch, rng)
        aux, g_dec, g_feats = dec_grad(
            state.params, feats, batch, roi_weights, rng, voxel_weights
        )
        new_state, extra = enc_bwd_update(state, batch, rng, g_feats, g_dec)
        aux = dict(aux)
        aux["grad_norm"] = extra[0]
        if return_grads:
            aux["grads"] = extra[1]
        return new_state, aux

    train_step.segments = {
        "enc_fwd": enc_fwd, "dec_grad": dec_grad,
        "enc_bwd_update": enc_bwd_update,
    }
    if not fold_update:
        train_step.segments.update(enc_bwd=enc_bwd, update=upd)
    return train_step


def make_spatial_infer_fn(model, mesh: Mesh):
    """GSPMD full-volume inference with the depth dim sharded over the whole
    mesh (both axes). Use batch=1 per call; XLA partitions the convs with
    halo exchange over ICI."""

    @jax.jit
    def infer(variables, mri, covars, roi_loc, roi_std, roi_compact):
        mri = jax.lax.with_sharding_constraint(
            mri, NamedSharding(mesh, P(None, None, "data", "spatial", None))
        )
        outs = model.apply(
            variables, mri, covars, roi_loc, roi_std, roi_compact,
            train=False, with_projections=False,
        )
        return outs.out

    return infer


def make_sharded_eval_step(model, mesh: Mesh, num_rois: int):
    """DP evaluation over the mesh: each shard evaluates its local batch
    slice; per-sample metric arrays are all-gathered so the host accumulator
    sees the full batch (the multi-chip `contrastive_test` data path)."""
    from coma_unet_tpu.metrics.roi import roi_metrics
    from coma_unet_tpu.metrics.voxel import voxel_metrics
    from coma_unet_tpu.train.step import _apply

    def local_eval(state, batch):
        outs, _ = _apply(
            model, state.params, state.batch_stats, batch, "", False, None,
            False,
        )
        pred = outs.out
        vox = voxel_metrics(pred, batch["tau"])
        roi = roi_metrics(pred, batch["tau"], batch["roi_compact"], num_rois)
        gather = lambda t: jax.lax.all_gather(t, "data", axis=0, tiled=True)  # noqa: E731
        return (
            gather(pred),
            {k: gather(v) for k, v in vox.items()},
            {k: gather(v) for k, v in roi.items()},
        )

    def step(state, batch):
        return jax.shard_map(
            local_eval,
            mesh=mesh,
            in_specs=(P(), _batch_specs(batch)),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )(state, batch)

    return jax.jit(step)
