"""Jitted train / eval steps.

The reference's per-batch work (`train_dp` inner loop,
`attn_unet_data_parallel.py:779-910`) — forward, composite loss, backward,
AdamW update — is one compiled XLA program here. Batches are dict pytrees:

    mri         [B, D, H, W, 1]   float
    tau         [B, D, H, W, 1]   float
    roi_compact [B, D, H, W]      int32 ids in [0, R]
    covars      [B, K]            float  ([abeta, age, sex, edu, cog, meta])
    abeta       [B]               float
    roi_loc     [B, R]            float  (predicted per-ROI tau mean)
    roi_std     [B, R]            float  (predicted per-ROI tau std)
    (+ pos_*/neg_* mirrors of mri/covars/roi_loc/roi_std/roi_compact when the
     tCDS triplet path is active, i.e. loss.rnc == False)
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp

from coma_unet_tpu.config import LossConfig
from coma_unet_tpu.losses.composite import GenerativeContrastiveLoss
from coma_unet_tpu.metrics.roi import roi_metrics
from coma_unet_tpu.metrics.voxel import voxel_metrics
from coma_unet_tpu.train.state import TrainState


@flax.struct.dataclass
class _PlainOutputs:
    out: jnp.ndarray
    projections: tuple = ()
    final_projection: Any = None


def _takes_with_projections(model) -> bool:
    import inspect

    try:
        return "with_projections" in inspect.signature(
            type(model).__call__
        ).parameters
    except (TypeError, ValueError):
        return False


def _apply(model, params, batch_stats, batch, prefix, train, rng, with_projections):
    variables = {"params": params}
    kwargs: Dict[str, Any] = dict(train=train)
    if _takes_with_projections(model):
        kwargs["with_projections"] = with_projections
    if rng is not None:
        kwargs["rngs"] = {"dropout": rng}
    has_bn = bool(batch_stats)
    if has_bn:
        variables["batch_stats"] = batch_stats
        kwargs["mutable"] = ["batch_stats"] if train else []
    p = prefix
    result = model.apply(
        variables,
        batch[p + "mri"],
        batch[p + "covars"],
        batch.get(p + "roi_loc"),
        batch.get(p + "roi_std"),
        batch.get(p + "roi_compact"),
        **kwargs,
    )
    if has_bn and train:
        outs, new_vars = result
        new_bs = new_vars.get("batch_stats", {})
    else:
        outs, new_bs = result, batch_stats
    if not hasattr(outs, "out"):  # baseline models return a plain volume
        outs = _PlainOutputs(out=outs)
    return outs, new_bs


def train_model_variant(model):
    """The model variant traced inside TRAIN steps.

    The packed-64^3-level Pallas family (s2/t2/packed, conv3d_strided.py) is
    disabled for training: the fwd+bwd module would contain ~8 large Mosaic
    kernels and the remote TPU compile helper is OOM-killed past a cumulative
    kernel budget (measured: forward-only with all families compiles in
    ~7 min; the train step is SIGKILLed even with per-level remat off and
    pre-warmed kernel caches). Training keeps the r1-proven graph plus the
    batched CondConv stride-1 kernels; eval/inference — the latency-critical
    serving path — run the full kernel set. Re-enable with
    COMA_TRAIN_PACKED=1 once the toolchain's compile budget allows.
    """
    import dataclasses
    import os

    if os.environ.get("COMA_TRAIN_PACKED") == "1":
        return model
    cfg = getattr(model, "config", None)
    if cfg is not None and getattr(cfg, "packed_level", False):
        return type(model)(dataclasses.replace(cfg, packed_level=False))
    return model


def _pin_default_layouts(tree):
    """Constrain every rank>=2 leaf to the row-major (default) device layout.

    The loop-carried TrainState re-enters the next step's jit call with
    whatever layouts the previous executable emitted; any leaf whose layout
    differs from the default the step was first traced with makes jax
    re-lower and recompile the segment (~242 s for dec_bwd_update, paid on
    the FIRST post-step call of every process). Donation does not prevent
    it — the aliased buffer's output layout is still compiler-chosen
    (artifacts/r3/donate_probe.log). Pinning the state outputs to the
    default layout makes call 2's input formats identical to call 1's, so
    the first lowering is also the last. TPU-only (CPU/virtual-mesh tests
    trace the same functions; layouts are trivial there).

    DEFAULT OFF (r4): on this toolchain the layout constraints break the
    backend compile of big train modules — the identical enc_bwd_update
    module compiles in 517 s without the pin and dies
    (tpu_compile_helper exit 1, deterministic, 2x) with it
    (artifacts/r4/donate_fold.log vs donate_foldpin.log); small pinned
    modules compile fine, so it is a size-dependent backend limit, not
    the API form (bare Layout traces and lowers correctly). Without the
    pin the first post-step call re-lowers with executable-produced
    layouts (~242 s once per process, absorbed by warm-up —
    artifacts/r3/donate_probe.log). COMA_PIN_LAYOUTS=1 re-enables for
    future toolchains."""
    import os

    from coma_unet_tpu.models.blocks import _on_tpu

    if os.environ.get("COMA_PIN_LAYOUTS", "0") != "1" or not _on_tpu():
        return tree
    from jax.experimental.layout import Layout, with_layout_constraint

    def pin(t):
        if getattr(t, "ndim", 0) < 2:
            return t  # rank-0/1 leaves have a single possible layout
        # NOTE: must be a bare Layout — wrapping in Format(Layout(...)) with
        # no sharding raises "Sharding has to be concrete when layout is of
        # type Layout ... Got sharding None" at trace time on this jax
        # (0.9.0), which is what killed every TPU train step in r3
        # (VERDICT r3 weak-1 / ADVICE r3 high).
        return with_layout_constraint(t, Layout(tuple(range(t.ndim))))

    return jax.tree.map(pin, tree)


def make_train_step(
    model,
    loss_config: LossConfig,
    donate: bool = True,
    return_grads: bool = False,
) -> Callable:
    """Returns train_step(state, batch, roi_weights, rng) -> (state, metrics).
    `return_grads` adds the raw gradient pytree to the metrics dict (test /
    debug only — doubles the step's live memory)."""
    model = train_model_variant(model)
    criterion = GenerativeContrastiveLoss(loss_config)
    rnc = loss_config.rnc

    def loss_fn(params, batch_stats, batch, roi_weights, rng, voxel_weights):
        # wrap-padded duplicate rows (loader `valid_mask`) are excluded from
        # every loss term — the reference trains on the true partial batch
        # (`attn_unet_data_parallel.py:779`).
        valid = batch.get("valid_mask")
        outs, new_bs = _apply(
            model, params, batch_stats, batch, "", True, rng, True
        )
        if not outs.projections:
            # baseline models (no contrastive heads): generative loss only,
            # mirroring the reference's non-contrastive `unetr.train` path.
            from coma_unet_tpu.losses.roi_losses import roi_mse

            gen = roi_mse(outs.out, batch["tau"], batch["roi_compact"],
                          roi_weights, voxel_weights=voxel_weights,
                          reduction=None)
            vsum = gen if valid is None else gen * valid.reshape(-1).astype(gen.dtype)
            total = loss_config.gen_weight * jnp.sum(vsum)
            zero = jnp.asarray(0.0, jnp.float32)
            return total, {
                "loss": total, "gen_loss": gen, "pred_space_loss": zero,
                "tcds_loss": zero, "batch_stats": new_bs,
            }
        kwargs: Dict[str, Any] = {"voxel_weights": voxel_weights,
                                  "valid": valid}
        if rnc:
            # RnC pseudo-batch (`attn_unet_data_parallel.py:833-845`): features
            # are the final-level projections; labels the covariate vectors.
            kwargs["rnc_features"] = outs.projections[-1]
            kwargs["rnc_labels"] = batch["covars"]
        else:
            pos_outs, new_bs = _apply(
                model, params, new_bs, batch, "pos_", True, rng, True
            )
            neg_outs, new_bs = _apply(
                model, params, new_bs, batch, "neg_", True, rng, True
            )
            kwargs["anchor_projs"] = outs.projections
            kwargs["pos_projs"] = pos_outs.projections
            kwargs["neg_projs"] = neg_outs.projections
            kwargs["final_reprs"] = (
                outs.final_projection,
                pos_outs.final_projection,
                neg_outs.final_projection,
            )
        losses = criterion(
            outs.out, batch["tau"], batch["roi_compact"], roi_weights, **kwargs
        )
        aux = {
            "loss": losses.total,
            "gen_loss": losses.gen,          # per-sample [B]
            "pred_space_loss": losses.pred_space,
            "tcds_loss": losses.tcds,
            "batch_stats": new_bs,
        }
        return losses.total, aux

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(
        state: TrainState,
        batch: Dict[str, jnp.ndarray],
        roi_weights: jnp.ndarray,
        rng: jax.Array,
        voxel_weights: jnp.ndarray = None,
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, roi_weights, rng,
            voxel_weights,
        )
        new_state = _pin_default_layouts(state.apply_gradients(grads).replace(
            batch_stats=aux.pop("batch_stats")
        ))
        aux["grad_norm"] = optax_global_norm(grads)
        pack_host_metrics(aux)
        if return_grads:
            aux["grads"] = grads
        return new_state, aux

    return train_step


def _retryable(e) -> bool:
    """ONLY transient compile/transport failures: these surface before
    execution, so no donated buffer has been consumed yet. Runtime failures
    (post-donation) and deterministic trace errors re-raise immediately —
    retrying them would burn minutes-long remote compiles and mask the real
    error with 'Array has been deleted'."""
    msg = str(e)
    return any(s in msg for s in (
        "remote_compile", "SIGKILL", "Connection", "UNAVAILABLE",
        "compile helper", "tpu_compile_helper",
    ))


def _fmt_aval(a):
    """Abstract aval for `a` that PRESERVES its concrete device format
    (layout). The dispatch path keys compiled programs on input layouts:
    a chained segment's inputs carry the upstream executable's output
    layouts, so an AOT compile from bare (shape, dtype) avals writes a
    persistent-cache entry the dispatch can never load (it re-lowers with
    the real layouts and misses — the r4 'AOT fallback compiled OK' /
    SIGKILL loop, ADVICE r4). COMMITTED arrays only: lowering a
    format-carrying aval is byte-identical to lowering the committed
    array it came from, but an UNCOMMITTED array (jnp.full roi_weights,
    host-converted batch, PRNG keys) lowers with NO sharding attribute —
    stamping a format on those injects `sdy.sharding` attrs the dispatch
    module doesn't have, which is the cache-key mismatch that made the
    r5 cold populate compile everything twice (CPU HLO diff:
    committed == fmt-aval, uncommitted != fmt-aval). Falls back to bare
    avals where formats are unavailable (abstract inputs, CPU tests)."""
    if not hasattr(a, "shape"):
        return a
    fmt = getattr(a, "format", None)
    committed = getattr(a, "_committed", True)  # avals keep given formats
    wt = bool(getattr(a, "weak_type", False))  # weak-typed args trace with
    # an extra convert; dropping the flag changes the module (cache miss)
    if (committed and fmt is not None
            and getattr(fmt, "layout", None) is not None):
        try:
            return jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=fmt,
                                        weak_type=wt)
        except (TypeError, ValueError):
            pass
    return jax.ShapeDtypeStruct(a.shape, a.dtype, weak_type=wt)


def _any_deleted(args) -> bool:
    """True when any concrete array in `args` has been consumed by
    donation — re-invoking a donated computation on such buffers masks
    the real error with 'Array has been deleted' (ADVICE r4)."""
    for leaf in jax.tree.leaves(args):
        is_del = getattr(leaf, "is_deleted", None)
        try:
            if callable(is_del) and is_del():
                return True
        except Exception:  # noqa: BLE001 — liveness probe must not raise
            continue
    return False


def _compile_retry(fn, tag, tries=4):
    """Compile retries on EVERY call: the remote TPU compile helper's
    SIGKILL/SIGABRT is load-dependent (the same program compiled fine and
    died an hour apart, r3; a 3x-in-a-row SIGABRT right after a 560 s
    compile succeeded standalone minutes later — the helper needs time to
    recover after big compiles, hence the escalating backoff). Only errors
    matching `_retryable` (compile-time transport/helper failures, which
    surface BEFORE buffer donation) are retried.

    Not just the first call: the step's second invocation RE-LOWERS with
    the executable-produced input layouts and compiles a second program
    (ROUND_NOTES "Persistent compile cache" §3), and that compile is as
    SIGKILL-prone as the first — a warm-gated passthrough left it
    unprotected and cost bench r3 its train-step section
    (artifacts: /tmp/bench_cachewarm.log, one SIGKILL, zero retries)."""

    def _aot_compile(args):
        """Chipless-AOT escape hatch (r4): the dispatch-path remote compile
        began failing DETERMINISTICALLY on big train modules (SIGKILL /
        exit-1 across every kernel configuration, even all-XLA —
        artifacts/r4/pin_ab_*.log, probe_3prog_pin.log) while the same
        modules compile through the AOT path (donate_{dec,fold}.log:
        dec_grad+donate 570 s OK, enc_bwd_update+donate 517 s OK). An AOT
        compile from the dispatch's avals (formats preserved — see
        `_fmt_aval`; bare avals produce a different cache entry the
        layout-keyed dispatch can never load, ADVICE r4) writes the
        persistent-cache entry; the retry dispatch then loads it instead
        of re-entering the broken path. Consumes no donated buffers
        (avals only)."""
        avals = jax.tree.map(_fmt_aval, args)
        fn.lower(*avals).compile()

    def call(*args):
        import logging as _logging
        import time as _time

        for i in range(tries):
            try:
                return fn(*args)
            except Exception as e:  # noqa: BLE001
                if i == tries - 1 or not _retryable(e):
                    raise
                if _any_deleted(args):
                    # failure happened AFTER donation consumed an input
                    # (transport errors during/after execution match
                    # `_retryable` too); a retry would run on deleted
                    # arrays — surface the original error (ADVICE r4).
                    raise
                try:
                    _aot_compile(args)
                    _logging.getLogger(__name__).warning(
                        "%s: dispatch compile failed (%s); AOT fallback "
                        "compiled OK, retrying dispatch", tag, str(e)[:120])
                    # short pause even on the warm path: the helper needs
                    # recovery time after big compiles (r4: three
                    # back-to-back AOT-then-SIGKILL rounds with zero
                    # delay — ADVICE r4)
                    _time.sleep(15)
                    continue
                except Exception as e2:  # noqa: BLE001
                    _logging.getLogger(__name__).warning(
                        "%s: dispatch and AOT compile both failed "
                        "(%s / %s)", tag, str(e)[:120], str(e2)[:120])
                _time.sleep(30 * (2 ** i))  # 30/60/120 s

    call.jitted = fn  # raw jit-wrapped fn, for AOT lower/memory probes
    call.policy = None  # kernel-family policy; set by _with_policy
    return call


def train_remat_variant(model, remat_blocks: Optional[bool]):
    """Resolve the split-step block-remat policy and return the model to
    trace: inside a segmented step the encoder/decoder boundary already
    acts as the remat cut, so block-level remat (default OFF,
    COMA_SPLIT_REMAT=1 keeps it) only re-buys compute at 128^3; pass
    remat_blocks=True for large-volume configs."""
    import os

    if remat_blocks is None:
        remat_blocks = os.environ.get("COMA_SPLIT_REMAT", "0") == "1"
    cfg_model = getattr(model, "config", None)
    if (not remat_blocks and cfg_model is not None
            and getattr(cfg_model, "remat", False)):
        import dataclasses

        model = type(model)(dataclasses.replace(cfg_model, remat=False))
    return model


def split_step_supported(model, loss_config: LossConfig) -> bool:
    """Whether `make_split_train_step` can serve this model/loss combo: the
    flagship single-forward (RnC) path on a stage-aware model with no
    BatchNorm cross-segment mutation. Default ON — the measured fastest
    training configuration (v5e, b=2 128^3): the merged 2-program step
    (enc_fwd + dec_bwd_update) at ~280 ms/step steady state with the full
    packed Pallas family (artifacts/r3/thread_bisect.log, BENCH_AUX r3),
    vs 632 ms for the packed-off monolithic step. The monolithic step with
    the packed family on either SIGKILLs the compile helper (v1 kernels)
    or runs a ~54 s/step dispatch anomaly (v2,
    artifacts/r3/mono_v2_probe.log). `COMA_TRAIN_SPLIT=0` forces the
    monolithic step."""
    import inspect
    import os

    if os.environ.get("COMA_TRAIN_SPLIT", "1") == "0":
        return False
    cfg = getattr(model, "config", None)
    if cfg is None or getattr(cfg, "norm", "instance") == "batch":
        return False
    if not (getattr(cfg, "pallas_convs", False)
            and getattr(cfg, "packed_level", False)):
        return False  # nothing to gain: the monolithic step compiles fine
    if not loss_config.rnc:
        return False  # tCDS needs 3 forwards; not split-scheduled (yet)
    try:
        return "stage" in inspect.signature(type(model).__call__).parameters
    except (TypeError, ValueError):
        return False


def default_segment_policies() -> Dict[str, object]:
    """The split step's per-segment kernel-family mix.

    The relay keeps compiled executables in a SIZE-bounded cache: a
    chain over the cap re-uploads an executable on EVERY dispatch
    (~106 s/step vs the 260 ms sum of segment solos —
    artifacts/r3/alternation_probe.log). Caveat on the r3 brackets: the
    thread-bisect re-measurement (artifacts/r3/thread_bisect.log) showed
    short timed loops sit inside a ~250-400 s post-compile warm-up tail,
    so the triple-chain "thrash" readings (split_lean/normoff probes)
    are warm-up-contaminated to an unknown degree; only the directly
    measured alternation brackets stand. The proven-good configuration
    is the pre-p1, pre-norm-fusion family in the merged 2-program step
    (~280 ms/step, BENCH_AUX r3).

    Default: disable the two post-close families (p1, fused norm) inside
    every split segment — reproducing the proven chain — while leaving
    single-program surfaces (inference forward, monolithic step) on the
    full family set, where there is no alternation to thrash.
    `COMA_SPLIT_POLICY` (ops/pallas/policy.py:parse_segment_policies)
    overrides, e.g. "dec_grad:norm=0;enc_bwd_update:norm=0,p1"."""
    import os

    from coma_unet_tpu.ops.pallas.policy import (
        KernelPolicy,
        parse_segment_policies,
    )

    spec = os.environ.get("COMA_SPLIT_POLICY")
    if spec is not None:
        return parse_segment_policies(spec)
    lean = KernelPolicy(disable={"p1"}, norm_fused=False)
    return {
        "enc_fwd": lean,
        "dec_grad": lean,
        "dec_bwd_update": lean,
        "enc_bwd_update": lean,
        "enc_bwd": lean,
        "update": lean,
    }


def _with_policy(fn, policy):
    """Run every invocation of `fn` under `policy` so first-call tracing
    (and any retrace on new shapes) sees the same kernel-family mix."""
    if policy is None:
        return fn

    def call(*args):
        with policy:
            return fn(*args)

    call.jitted = getattr(fn, "jitted", fn)
    call.policy = policy  # exposed so AOT precompile traces under it too
    return call


def make_split_train_step(
    model,
    loss_config: LossConfig,
    donate: bool = True,
    return_grads: bool = False,
    remat_blocks: Optional[bool] = None,
    fold_update: Optional[bool] = None,
    segment_policies: Optional[Dict[str, object]] = None,
    merge_bwd: Optional[bool] = None,
) -> Callable:
    """Train step compiled as TWO to FOUR chained XLA programs instead of
    one. Default (merge_bwd, 128^3-class): TWO programs —

        enc_fwd       : params, batch, rng        -> encoder feats
        dec_bwd_update: state, feats, batch, ...  -> new state, aux

    (the merged program differentiates decoder+loss, replays the encoder
    forward under vjp, and applies the AdamW update). Large-volume configs
    (fold_update=False) unfold into FOUR programs for HBM:

        enc_fwd : params, batch, rng              -> encoder feats
        dec_grad: params, feats, batch, ...       -> loss aux, d(params), d(feats)
        enc_bwd : params, batch, rng, d(feats)    -> d(params)   (recomputes fwd)
        update  : state, grads                    -> new state

    Same math as `make_train_step` (the decoder program differentiates the
    decoder+modulator+heads+loss; the encoder program replays the encoder
    forward under `jax.vjp` — i.e. remat at the segment boundary, which the
    per-block remat inside the segments already pays anyway), but each
    compiled module carries only its own segment's Mosaic kernels. That is
    what lets the full packed/strided Pallas family
    (ops/pallas/conv3d_strided.py) run in TRAINING: the single-module
    fwd+bwd exceeds the remote TPU compile helper's memory budget
    (measured r2-r3: 53 Mosaic calls compile, 47 with >=8 large
    strided/packed programs SIGKILL), while each segment stays well under.

    The chained programs dispatch back-to-back with no host sync between
    them, so the relay dispatch floor is paid once per step, not four times.
    Flagship path only (see `split_step_supported`): single forward (RnC),
    no BatchNorm. Reference workload: `attn_unet_data_parallel.py:779-910`.
    """
    criterion = GenerativeContrastiveLoss(loss_config)
    if not loss_config.rnc:
        raise ValueError("make_split_train_step supports the RnC path only")
    import os

    if fold_update is None:
        fold_update = os.environ.get("COMA_SPLIT_FOLD", "1") == "1"
    if merge_bwd is None:
        # merged default OFF (r4): the helper's module-memory budget shrank
        # below the ~1.36 MB merged mlir — SIGKILL on a quiet box with the
        # pin off and every kernel-family configuration
        # (artifacts/r4/pin_ab_off_quiet.log + pin_ab_*.log), while the
        # 3-program segments compile individually (donate ladder logs).
        # COMA_SPLIT_MERGE=1 re-enables (the in-step fallback still
        # catches a failed merged compile).
        merge_bwd = os.environ.get("COMA_SPLIT_MERGE", "0") == "1"

    # Block-level remat inside the segments only re-buys compute (~70 ms at
    # b=2 128^3) for ~2 GB of activations that fit HBM comfortably — see
    # `train_remat_variant` (large-volume configs pass remat_blocks=True).
    model = train_remat_variant(model, remat_blocks)

    def _enc(params, batch, rng):
        return model.apply(
            {"params": params}, batch["mri"], batch["covars"],
            train=True, rngs={"dropout": rng}, stage="encoder",
        )

    def _dec_loss(params, feats, batch, roi_weights, rng, voxel_weights):
        outs = model.apply(
            {"params": params}, batch["mri"], batch["covars"],
            batch.get("roi_loc"), batch.get("roi_std"),
            batch.get("roi_compact"), train=True, with_projections=True,
            rngs={"dropout": rng}, stage="decoder", encoder_feats=feats,
        )
        valid = batch.get("valid_mask")
        losses = criterion(
            outs.out, batch["tau"], batch["roi_compact"], roi_weights,
            rnc_features=outs.projections[-1], rnc_labels=batch["covars"],
            voxel_weights=voxel_weights, valid=valid,
        )
        aux = {
            "loss": losses.total,
            "gen_loss": losses.gen,
            "pred_space_loss": losses.pred_space,
            "tcds_loss": losses.tcds,
        }
        pack_host_metrics(aux)
        return losses.total, aux

    if segment_policies is None:
        segment_policies = default_segment_policies()

    def _seg(fn, name):
        return _with_policy(_compile_retry(fn, name),
                            segment_policies.get(name))

    enc_fwd = _seg(jax.jit(_enc), "enc_fwd")

    if merge_bwd and fold_update:
        # TWO-program variant (the default): enc_fwd + ONE merged
        # decoder-grad/encoder-bwd/update program. The relay's executable
        # budget is dynamic (helper crash-restarts shrink it): post-crash
        # it held every 2-program alternation at the sum of solo times
        # (even 91 MB) while EVERY 3-program chain thrashed — including
        # the lean 62.5 MB triple at 32.7 s/step
        # (artifacts/r3/split_lean_probe.log). Merging costs no extra
        # compute (same ops, one module) and stays under the helper's
        # compile budget with the lean per-segment policy. Large-volume
        # configs (fold_update=False, 216^3) keep the 4-program chain:
        # their HBM peak needs the smaller programs, and at 2.5 s/step
        # the thrash re-upload is a smaller relative cost.
        def _dec_bwd_update(state, feats, batch, roi_weights, rng,
                            voxel_weights):
            (_, aux), (g_dec, g_feats) = jax.value_and_grad(
                _dec_loss, argnums=(0, 1), has_aux=True
            )(state.params, feats, batch, roi_weights, rng, voxel_weights)
            _, vjp_fn = jax.vjp(lambda p: _enc(p, batch, rng), state.params)
            g_enc = vjp_fn(g_feats)[0]
            grads = jax.tree.map(jnp.add, g_dec, g_enc)
            new_state = _pin_default_layouts(state.apply_gradients(grads))
            aux = dict(aux)
            aux["grad_norm"] = optax_global_norm(grads)
            if return_grads:
                aux["grads"] = grads
            return new_state, aux

        dec_bwd_update = _seg(
            jax.jit(_dec_bwd_update,
                    donate_argnums=(0, 1) if donate else ()),
            "dec_bwd_update")

        def _build_unmerged():
            # merged-compile fallback (r4): the remote compile helper's
            # module budget is DYNAMIC — mid-r4 it stopped compiling the
            # ~1.36 MB merged mlir in every kernel configuration (even
            # all-XLA; artifacts/r4/pin_ab_*.log) while dec_grad and the
            # folded enc_bwd_update still compile separately
            # (artifacts/r4/bisect_{dec2,update}.log). Same math, same
            # policies, one extra chained dispatch (~20 ms).
            dg = _seg(jax.jit(
                jax.value_and_grad(_dec_loss, argnums=(0, 1), has_aux=True),
                donate_argnums=(1,) if donate else (),
            ), "dec_grad")

            def _enc_bwd_update(state, batch, rng, g_feats, g_dec):
                _, vjp_fn = jax.vjp(lambda p: _enc(p, batch, rng),
                                    state.params)
                g_enc = vjp_fn(g_feats)[0]
                grads = jax.tree.map(jnp.add, g_dec, g_enc)
                new_state = _pin_default_layouts(state.apply_gradients(grads))
                gn = optax_global_norm(grads)
                return new_state, (gn, grads) if return_grads else (gn,)

            ebu = _seg(jax.jit(
                _enc_bwd_update,
                donate_argnums=(0, 3, 4) if donate else ()),
                "enc_bwd_update")
            return dg, ebu

        # COMA_SPLIT_MERGE_DEAD=1 presets the fallback (manual lever +
        # lets the CPU suite pin the fallback path's numerics directly)
        cell = {"merged_dead": os.environ.get("COMA_SPLIT_MERGE_DEAD") == "1",
                "unmerged": None}

        def train_step(
            state: TrainState,
            batch: Dict[str, jnp.ndarray],
            roi_weights: jnp.ndarray,
            rng: jax.Array,
            voxel_weights: jnp.ndarray = None,
        ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
            if state.batch_stats:
                raise ValueError(
                    "split train step does not thread batch_stats; use "
                    "norm='instance' or the monolithic make_train_step"
                )
            feats = enc_fwd(state.params, batch, rng)
            if not cell["merged_dead"]:
                try:
                    return dec_bwd_update(state, feats, batch, roi_weights,
                                          rng, voxel_weights)
                except Exception as e:  # noqa: BLE001
                    # compile-class failures surface BEFORE execution, so
                    # state/feats buffers are still live — safe to fall
                    # back. Verify liveness rather than trust the message
                    # match: a transport error DURING execution matches
                    # `_retryable` too but has consumed the donated
                    # buffers (ADVICE r4).
                    if not _retryable(e) or _any_deleted((state, feats)):
                        raise
                    import logging

                    logging.getLogger(__name__).warning(
                        "merged dec_bwd_update compile failed (%s); "
                        "falling back to the 3-program chain",
                        str(e)[:160])
                    cell["merged_dead"] = True
            if cell["unmerged"] is None:
                cell["unmerged"] = _build_unmerged()
            dg, ebu = cell["unmerged"]
            (_, aux), (g_dec, g_feats) = dg(state.params, feats, batch,
                                            roi_weights, rng, voxel_weights)
            new_state, extra = ebu(state, batch, rng, g_feats, g_dec)
            aux = dict(aux)
            aux["grad_norm"] = extra[0]
            if return_grads:
                aux["grads"] = extra[1]
            return new_state, aux

        train_step.segments = {
            "enc_fwd": enc_fwd, "dec_bwd_update": dec_bwd_update,
        }
        return train_step

    dec_grad = _seg(jax.jit(
        jax.value_and_grad(_dec_loss, argnums=(0, 1), has_aux=True),
        donate_argnums=(1,) if donate else (),
    ), "dec_grad")

    if fold_update:
        def _enc_bwd_update(state, batch, rng, g_feats, g_dec):
            # encoder backward + optimizer update in ONE program: each
            # chained dispatch through the relay costs ~20 ms, so the 4th
            # program paid more in dispatch than its 18 ms of work
            _, vjp_fn = jax.vjp(lambda p: _enc(p, batch, rng), state.params)
            g_enc = vjp_fn(g_feats)[0]
            grads = jax.tree.map(jnp.add, g_dec, g_enc)
            new_state = _pin_default_layouts(state.apply_gradients(grads))
            gn = optax_global_norm(grads)
            return new_state, (gn, grads) if return_grads else (gn,)

        enc_bwd_update = _seg(
            jax.jit(_enc_bwd_update,
                    donate_argnums=(0, 3, 4) if donate else ()),
            "enc_bwd_update")
    else:
        # Unfolded (4-program) variant for large volumes: the encoder
        # backward's HBM peak at 216^3 is the replayed-forward residuals +
        # g_enc + conv temps; folding the AdamW update in adds the whole
        # optimizer state + new params (~2.5 GB at flagship width) to that
        # same peak — measured ResourceExhausted on v5e (15.75 GB,
        # artifacts/r3/probe_216_reduce_fix.log) where the three other
        # segments fit. The 4th program costs one extra ~20 ms relay
        # dispatch; at 216^3 step times that is noise.
        def _enc_bwd(params, batch, rng, g_feats):
            _, vjp_fn = jax.vjp(lambda p: _enc(p, batch, rng), params)
            return vjp_fn(g_feats)[0]

        def _update(state, g_dec, g_enc):
            grads = jax.tree.map(jnp.add, g_dec, g_enc)
            new_state = _pin_default_layouts(state.apply_gradients(grads))
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

    def train_step(
        state: TrainState,
        batch: Dict[str, jnp.ndarray],
        roi_weights: jnp.ndarray,
        rng: jax.Array,
        voxel_weights: jnp.ndarray = None,
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        if state.batch_stats:
            raise ValueError(
                "split train step does not thread batch_stats; use "
                "norm='instance' or the monolithic make_train_step"
            )
        feats = enc_fwd(state.params, batch, rng)
        (_, aux), (g_dec, g_feats) = dec_grad(
            state.params, feats, batch, roi_weights, rng, voxel_weights
        )
        new_state, extra = enc_bwd_update(state, batch, rng, g_feats, g_dec)
        aux = dict(aux)
        aux["grad_norm"] = extra[0]
        if return_grads:
            aux["grads"] = extra[1]
        return new_state, aux

    # expose the compiled segments for per-program probing/warming
    # (scripts/train_step_probe.py) — same jitted callables the step chains
    train_step.segments = {
        "enc_fwd": enc_fwd, "dec_grad": dec_grad,
        "enc_bwd_update": enc_bwd_update,
    }
    if not fold_update:
        train_step.segments.update(enc_bwd=enc_bwd, update=upd)
    return train_step


def _formats_of(compiled):
    """Output formats (layout + sharding) pytree of an AOT-compiled
    executable, or None when the backend does not expose them."""
    try:
        return compiled.output_formats
    except Exception:  # noqa: BLE001
        return None


def _apply_formats(avals, formats):
    """Stamp a formats pytree onto a matching avals pytree so a subsequent
    `lower()` reproduces the layouts the runtime will actually present."""
    if formats is None:
        return avals

    def one(a, f):
        if not hasattr(a, "shape") or f is None:
            return a
        try:
            return jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=f)
        except (TypeError, ValueError):
            return a

    try:
        return jax.tree.map(one, avals, formats)
    except ValueError:  # structure mismatch — keep bare avals
        return avals


def _formats_equal(a, b) -> bool:
    try:
        la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
        return len(la) == len(lb) and all(x == y for x, y in zip(la, lb))
    except Exception:  # noqa: BLE001
        return False


def aot_precompile_segments(step, state, batch, roi_weights,
                            voxel_weights=None, budget_s=None) -> bool:
    """AOT-compile a split step's segments from ABSTRACT avals (consumes no
    donated buffers), writing their persistent-cache entries so the first
    dispatches load instead of compiling.

    Three properties make the entries actually loadable (r5; their absence
    is why the r4 bench burned 1200 s precompiling and then another
    1000+ s in dispatch compiles — VERDICT r4 weak-1, ADVICE r4):
    1. Each segment is lowered UNDER ITS KernelPolicy — the same
       kernel-family mix the dispatch path traces with.
    2. Downstream segments are lowered with the upstream executable's
       OUTPUT FORMATS on their chained inputs (feats, grads): the dispatch
       path keys programs on input layouts, so bare-aval entries miss.
    3. The loop-carried second signature is precompiled too: the next
       step re-enters with the update segment's output layouts on `state`
       (and `params` for enc_fwd/dec_grad), which otherwise re-lowers and
       recompiles once per process (~242-1292 s, VERDICT r4 weak-6).
       Signatures are chained to a fixed point (skipping compiles whose
       input formats already match a compiled signature).

    `budget_s` bounds wall-clock: remaining segment compiles are skipped
    (logged) once exceeded — the step's own `_compile_retry` AOT rung is
    the backstop. Returns True when every planned signature compiled."""
    import contextlib
    import logging
    import time as _time

    segs = getattr(step, "segments", None)
    if not segs:
        return True
    log = logging.getLogger(__name__)
    t_start = _time.time()
    sds = lambda t: jax.tree.map(_fmt_aval, t)  # noqa: E731
    p_s, b_s, st_s = sds(state.params), sds(dict(batch)), sds(state)
    rng_s = jax.ShapeDtypeStruct((2,), jnp.uint32)
    rw_s = sds(roi_weights)
    vw_s = None if voxel_weights is None else sds(voxel_weights)
    ok = True

    def pol_ctx(name):
        pol = getattr(segs.get(name), "policy", None)
        return pol if pol is not None else contextlib.nullcontext()

    def over_budget(name):
        if budget_s is not None and _time.time() - t_start > budget_s:
            log.warning("AOT precompile budget exceeded before %s; "
                        "skipping remaining signatures", name)
            return True
        return False

    done = {}  # name -> list of (input_formats, compiled)

    def compile_sig(name, *args):
        """Compile one (segment, input-signature) pair under the segment's
        policy; dedupes signatures whose input formats already compiled.
        Returns the compiled executable or None."""
        nonlocal ok
        seg = segs.get(name)
        fn = getattr(seg, "jitted", None)
        if fn is None:
            return None
        in_key = jax.tree.map(
            lambda a: getattr(a, "format", None), args,
            is_leaf=lambda a: a is None or hasattr(a, "shape"))
        for prev_key, prev_c in done.get(name, ()):
            if _formats_equal(prev_key, in_key):
                return prev_c
        if over_budget(name):
            ok = False
            return None
        t0 = _time.time()
        try:
            with pol_ctx(name):
                compiled = fn.lower(*args).compile()
            log.info("AOT %s: %.1fs", name, _time.time() - t0)
            done.setdefault(name, []).append((in_key, compiled))
            return compiled
        except Exception as e:  # noqa: BLE001
            log.warning("AOT %s failed (%.1fs): %s", name,
                        _time.time() - t0, str(e)[:160])
            ok = False
            return None

    def state_formats(compiled):
        """Output formats of the (new_state, aux) pair's state half."""
        fmts = _formats_of(compiled)
        return None if fmts is None else fmts[0]

    try:
        enc = segs["enc_fwd"].jitted
        with pol_ctx("enc_fwd"):
            feats_s = jax.eval_shape(enc, p_s, b_s, rng_s)
        c_enc = compile_sig("enc_fwd", p_s, b_s, rng_s)
        feats_f = _apply_formats(feats_s, _formats_of(c_enc)) \
            if c_enc is not None else feats_s

        def chain_from(p_in, st_in, feats_in):
            """Compile dec(+bwd/update) for one params/state signature;
            return the update segment's new_state formats (or None)."""
            if "dec_grad" in segs:
                dec = segs["dec_grad"].jitted
                with pol_ctx("dec_grad"):
                    (_, g_s) = jax.eval_shape(dec, p_in, feats_in, b_s,
                                              rw_s, rng_s, vw_s)
                c_dec = compile_sig("dec_grad", p_in, feats_in, b_s, rw_s,
                                    rng_s, vw_s)
                g_f = g_s if c_dec is None else _apply_formats(
                    g_s, _formats_of(c_dec)[1])
                g_dec_f, g_feats_f = g_f
                if hasattr(segs.get("enc_bwd_update"), "jitted"):
                    c_u = compile_sig("enc_bwd_update", st_in, b_s, rng_s,
                                      g_feats_f, g_dec_f)
                    return None if c_u is None else state_formats(c_u)
                if "enc_bwd" in segs:  # unfolded large-volume chain
                    eb = segs["enc_bwd"].jitted
                    with pol_ctx("enc_bwd"):
                        g_enc_s = jax.eval_shape(eb, p_in, b_s, rng_s,
                                                 g_feats_f)
                    c_eb = compile_sig("enc_bwd", p_in, b_s, rng_s,
                                       g_feats_f)
                    g_enc_f = g_enc_s if c_eb is None else _apply_formats(
                        g_enc_s, _formats_of(c_eb))
                    c_u = compile_sig("update", st_in, g_dec_f, g_enc_f)
                    return None if c_u is None else state_formats(c_u)
                return None
            if "dec_bwd_update" in segs:
                c_u = compile_sig("dec_bwd_update", st_in, feats_in, b_s,
                                  rw_s, rng_s, vw_s)
                return None if c_u is None else state_formats(c_u)
            return None

        st_f = chain_from(p_s, st_s, feats_f)
        # loop-carried signature(s): next step's state/params carry the
        # update executable's output layouts. Chase to a fixed point
        # (compile_sig dedupes signatures already compiled), bounded.
        for _ in range(2):
            if st_f is None:
                break
            st2 = _apply_formats(st_s, st_f)
            p2 = st2.params
            c_enc2 = compile_sig("enc_fwd", p2, b_s, rng_s)
            feats2 = feats_f if c_enc2 is None else _apply_formats(
                feats_s, _formats_of(c_enc2))
            st_f2 = chain_from(p2, st2, feats2)
            if st_f2 is None or _formats_equal(st_f2, st_f):
                break
            st_f = st_f2
    except Exception as e:  # noqa: BLE001
        log.warning("AOT precompile aborted: %s", str(e)[:200])
        return False
    return ok


def optax_global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.vdot(x, x).real for x in leaves))


def pack_host_metrics(aux: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Fuse the values the train loop reads EVERY step (loss, tcds, per-sample
    gen) into one f32 leaf [2 + B], computed inside the compiled step.

    Each per-leaf device fetch through the relay pays the ~28 ms floor
    (CLAUDE.md); the loop's three reads cost ~84 ms against a 280 ms step.
    One fused leaf = one fetch."""
    aux["host_metrics"] = jnp.concatenate([
        jnp.reshape(aux["loss"], (1,)).astype(jnp.float32),
        jnp.reshape(aux["tcds_loss"], (1,)).astype(jnp.float32),
        jnp.reshape(aux["gen_loss"], (-1,)).astype(jnp.float32),
    ])
    return aux


def make_eval_step(model, num_rois: int) -> Callable:
    """Returns eval_step(state, batch) -> (pred, vox_metrics, roi_metrics) —
    the device half of `contrastive_test` (`attn_unet_data_parallel.py:
    1197-1293`)."""

    @jax.jit
    def eval_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        outs, _ = _apply(
            model, state.params, state.batch_stats, batch, "", False, None, False
        )
        pred = outs.out
        vox = voxel_metrics(pred, batch["tau"])
        roi = roi_metrics(pred, batch["tau"], batch["roi_compact"], num_rois)
        return pred, vox, roi

    return eval_step
