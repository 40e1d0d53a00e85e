"""Fused instance-norm + FiLM + activation, AD-complete ("norm" family).

Every `Convolution` block is conv -> InstanceNorm -> act, and every
`CondConvolution` block is conv -> InstanceNorm -> FiLM -> act (MONAI ADN
+ covariate modulation; reference call sites
`attn_unet_data_parallel.py:285-306`). Since the convs moved to Pallas
(r2-r3), the norm/film/act chain between two pallas_call boundaries is an
XLA elementwise island: a stats reduce plus an apply pass over
layout-padded bf16 small-channel volumes at ~1/15 of HBM bandwidth
(~5 ms/site at [2,16,128^3], measured r1 — and r1's "wired net-neutral"
verdict predates the Pallas convs, when XLA could still fuse the norm
into the conv; it no longer can). This module streams the whole chain in
two Pallas passes forward and two backward:

    yhat = (x - mu) * r,  r = rsqrt(var + eps)     per-(b,c) f32 stats
    u    = s * yhat + t                             FiLM ([B,C] f32; s=1,
                                                    t=0 for plain blocks)
    z    = act(u)                                   none|relu|leakyrelu|prelu

    fwd:  stats (read x)              -> apply (read x, write z)
    bwd:  reduce (read x,g; 5 sums)   -> apply (read x,g, write dx)

with gt = g * act'(u), gy = gt * s, and

    dx      = r * (gy - mean(gy) - yhat * mean(gy * yhat))
    dalpha  = sum(g * u * [u < 0])          (PReLU, torch single shared slope)
    dscale  = sum_spatial(gt * yhat)        (per (b, c))
    dshift  = sum_spatial(gt)

Stats and normalization are f32 (CLAUDE.md convention); volumes stream in
their storage dtype. Works unchanged on the PACKED 64^3 layout
([B, C, D/2, H, 2W]): packing is a pure spatial permutation and
instance-norm stats are permutation-invariant. C == 1 volumes (the
modulator's single-channel outputs) reshape to [1, B, ...] — per-(b, 1)
stats are exactly per-(1, b) stats, and the reshape is layout-free.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CPARAMS = pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)

_ACTS = ("none", "relu", "leakyrelu", "prelu")
_SLOPE = 1e-2  # leakyrelu negative slope (models/blocks.get_act)


def _interp(interpret: bool) -> bool:
    if interpret:
        return True
    try:
        return jax.default_backend() != "tpu"
    except RuntimeError:
        return True


def _dtile(c: int, d: int, h: int, w: int) -> int:
    """Largest power-of-two divisor of d whose [C, dt, H, W] bf16 block
    stays <= 4 MB (two in-flight blocks + f32 temps fit VMEM)."""
    dt = 1
    while (d % (dt * 2) == 0
           and c * (dt * 2) * h * w * 2 <= 4 * 1024 * 1024):
        dt *= 2
    return dt


def _act_fwd(u, act: str, a):
    if act == "relu":
        return jnp.maximum(u, 0.0)
    if act == "leakyrelu":
        return jnp.where(u >= 0, u, _SLOPE * u)
    if act == "prelu":
        return jnp.where(u >= 0, u, a * u)
    return u


def _act_deriv(u, act: str, a):
    if act == "relu":
        return jnp.where(u > 0, 1.0, 0.0)
    if act == "leakyrelu":
        return jnp.where(u >= 0, 1.0, _SLOPE)
    if act == "prelu":
        return jnp.where(u >= 0, 1.0, a)
    return jnp.ones_like(u)


def _csum(x):
    """Reduce all non-leading axes of [C, ...] to [C, 1] (stepwise sums:
    Mosaic's layout pass rejects rank-1 intermediates)."""
    while x.ndim > 2:
        x = jnp.sum(x, axis=-1)
    return jnp.sum(x, axis=-1, keepdims=True)


def _col(aux_ref, i):
    return aux_ref[:, i:i + 1][:, :, None, None]  # [C, 1, 1, 1]


def _stats_kernel(x_ref, o_ref):
    di = pl.program_id(1)

    @pl.when(di == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    x = x_ref[...].astype(jnp.float32)  # [C, dt, H, W]
    c = x.shape[0]
    s = _csum(x)
    q = _csum(x * x)
    pad = jnp.zeros((c, o_ref.shape[1] - 2), jnp.float32)
    o_ref[...] += jnp.concatenate([s, q, pad], axis=1)


def _apply_kernel(x_ref, aux_ref, o_ref, *, act: str):
    x = x_ref[...].astype(jnp.float32)  # [C, dt, H, W]
    yhat = (x - _col(aux_ref, 0)) * _col(aux_ref, 1)
    u = _col(aux_ref, 3) * yhat + _col(aux_ref, 4)
    o_ref[...] = _act_fwd(u, act, _col(aux_ref, 2)).astype(o_ref.dtype)


def _bwd_reduce_kernel(x_ref, g_ref, aux_ref, o_ref, *, act: str):
    di = pl.program_id(1)

    @pl.when(di == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    x = x_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    c = x.shape[0]
    s = _col(aux_ref, 3)
    yhat = (x - _col(aux_ref, 0)) * _col(aux_ref, 1)
    u = s * yhat + _col(aux_ref, 4)
    gt = g * _act_deriv(u, act, _col(aux_ref, 2))
    gy = gt * s
    s0 = _csum(gy)
    s1 = _csum(gy * yhat)
    if act == "prelu":
        s2 = _csum(g * jnp.where(u < 0, u, 0.0))
    else:
        s2 = jnp.zeros((c, 1), jnp.float32)
    s3 = _csum(gt * yhat)  # dscale
    s4 = _csum(gt)         # dshift
    pad = jnp.zeros((c, o_ref.shape[1] - 5), jnp.float32)
    o_ref[...] += jnp.concatenate([s0, s1, s2, s3, s4, pad], axis=1)


def _bwd_apply_kernel(x_ref, g_ref, aux_ref, o_ref, *, act: str):
    x = x_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    r = _col(aux_ref, 1)
    s = _col(aux_ref, 3)
    yhat = (x - _col(aux_ref, 0)) * r
    u = s * yhat + _col(aux_ref, 4)
    gy = g * _act_deriv(u, act, _col(aux_ref, 2)) * s
    dx = r * (gy - _col(aux_ref, 5) - yhat * _col(aux_ref, 6))
    o_ref[...] = dx.astype(o_ref.dtype)


def _vol_spec(c: int, dt: int, h: int, w: int):
    return pl.BlockSpec((None, c, dt, h, w),
                        lambda bi, di: (bi, 0, di, 0, 0),
                        memory_space=pltpu.VMEM)


def _aux_spec(c: int):
    return pl.BlockSpec((None, c, 128), lambda bi, di: (bi, 0, 0),
                        memory_space=pltpu.VMEM)


def _pack_aux(cols, c: int):
    """Stack per-(b,c) f32 columns into the [B, C, 128] aux block."""
    b = cols[0].shape[0]
    pad = jnp.zeros((b, c, 128 - len(cols)), jnp.float32)
    return jnp.concatenate([col[:, :, None] for col in cols] + [pad], axis=2)


@partial(jax.jit, static_argnames=("act", "eps", "interpret"))
def _norm_act_fwd_impl(x, alpha, scale, shift, act: str, eps: float,
                       interpret: bool):
    interpret = _interp(interpret)
    b, c, d, h, w = x.shape
    n_vox = float(d * h * w)
    dt = _dtile(c, d, h, w)
    stats = pl.pallas_call(
        _stats_kernel,
        grid=(b, d // dt),
        in_specs=[_vol_spec(c, dt, h, w)],
        out_specs=_aux_spec(c),
        out_shape=jax.ShapeDtypeStruct((b, c, 128), jnp.float32),
        compiler_params=_CPARAMS,
        interpret=interpret,
    )(x)
    mu = stats[:, :, 0] / n_vox
    var = jnp.maximum(stats[:, :, 1] / n_vox - mu * mu, 0.0)
    r = jax.lax.rsqrt(var + eps)
    a = jnp.broadcast_to(alpha.astype(jnp.float32).reshape(-1)[0], (b, c))
    aux = _pack_aux(
        [mu, r, a, scale.astype(jnp.float32), shift.astype(jnp.float32)], c
    )
    z = pl.pallas_call(
        partial(_apply_kernel, act=act),
        grid=(b, d // dt),
        in_specs=[_vol_spec(c, dt, h, w), _aux_spec(c)],
        out_specs=_vol_spec(c, dt, h, w),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=_CPARAMS,
        interpret=interpret,
    )(x, aux)
    return z, aux


@partial(jax.jit, static_argnames=("act", "interpret"))
def _norm_act_bwd_impl(x, aux, g, act: str, interpret: bool):
    interpret = _interp(interpret)
    b, c, d, h, w = x.shape
    n_vox = float(d * h * w)
    dt = _dtile(c, d, h, w)
    sums = pl.pallas_call(
        partial(_bwd_reduce_kernel, act=act),
        grid=(b, d // dt),
        in_specs=[_vol_spec(c, dt, h, w), _vol_spec(c, dt, h, w),
                  _aux_spec(c)],
        out_specs=_aux_spec(c),
        out_shape=jax.ShapeDtypeStruct((b, c, 128), jnp.float32),
        compiler_params=_CPARAMS,
        interpret=interpret,
    )(x, g, aux)
    aux2 = _pack_aux(
        [aux[:, :, 0], aux[:, :, 1], aux[:, :, 2], aux[:, :, 3],
         aux[:, :, 4], sums[:, :, 0] / n_vox, sums[:, :, 1] / n_vox], c
    )
    dx = pl.pallas_call(
        partial(_bwd_apply_kernel, act=act),
        grid=(b, d // dt),
        in_specs=[_vol_spec(c, dt, h, w), _vol_spec(c, dt, h, w),
                  _aux_spec(c)],
        out_specs=_vol_spec(c, dt, h, w),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=_CPARAMS,
        interpret=interpret,
    )(x, g, aux2)
    dalpha = jnp.sum(sums[:, :, 2])
    return dx, dalpha, sums[:, :, 3], sums[:, :, 4]


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def pallas_norm_act(x: jnp.ndarray, alpha: jnp.ndarray, scale: jnp.ndarray,
                    shift: jnp.ndarray, act: str = "none", eps: float = 1e-5,
                    interpret: bool = False) -> jnp.ndarray:
    """Instance norm + per-(b,c) affine (FiLM) + activation in two streamed
    Pallas passes. `alpha`: PReLU slope [1] f32 (ignored for other acts);
    `scale`/`shift`: [B, C] f32 (pass ones/zeros for plain blocks — their
    cotangents come from the same backward reduce pass either way)."""
    assert act in _ACTS, act
    z, _ = _norm_act_fwd_impl(x, alpha, scale, shift, act, eps, interpret)
    return z


def _vjp_fwd(x, alpha, scale, shift, act, eps, interpret):
    z, aux = _norm_act_fwd_impl(x, alpha, scale, shift, act, eps, interpret)
    return z, (x, aux, alpha)


def _vjp_bwd(act, eps, interpret, res, g):
    x, aux, alpha = res
    dx, dalpha, dscale, dshift = _norm_act_bwd_impl(
        x, aux, g.astype(x.dtype), act, interpret
    )
    da = (dalpha if act == "prelu" else jnp.zeros(())).astype(jnp.float32)
    return (dx, jnp.full(alpha.shape, da, alpha.dtype), dscale, dshift)


pallas_norm_act.defvjp(_vjp_fwd, _vjp_bwd)


def norm_act(x: jnp.ndarray, alpha: Optional[jnp.ndarray],
             act: Optional[str], scale: Optional[jnp.ndarray] = None,
             shift: Optional[jnp.ndarray] = None,
             eps: float = 1e-5) -> jnp.ndarray:
    """Shape-adapting entry: fills identity FiLM, routes C == 1 through the
    layout-free [1, B, ...] view (per-(b, 1) stats == per-(1, b) stats).
    Caller must have checked `norm_act_supported`."""
    act = act or "none"
    b, c = x.shape[:2]
    if alpha is None:
        alpha = jnp.zeros((1,), jnp.float32)
    if scale is None:
        scale = jnp.ones((b, c), jnp.float32)
    if shift is None:
        shift = jnp.zeros((b, c), jnp.float32)
    if c == 1 and b > 1:
        z = pallas_norm_act(
            x.reshape((1, b) + x.shape[2:]), alpha,
            scale.reshape(1, b), shift.reshape(1, b), act, eps,
        )
        return z.reshape(x.shape)
    return pallas_norm_act(x, alpha, scale, shift, act, eps)


def norm_act_supported(x_shape) -> bool:
    """Gate: lane-aligned W, sublane-friendly H, channel count inside the
    VMEM plan. C == 1 qualifies through the [1, B, ...] view when B > 1."""
    if len(x_shape) != 5:
        return False
    b, c, d, h, w = x_shape
    if c == 1:
        b, c = 1, b
    return (w % 128 == 0 and h % 8 == 0 and h >= 8 and d >= 2
            and 2 <= c <= 64 and c * h * w * 2 <= 4 * 1024 * 1024)
