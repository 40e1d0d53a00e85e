"""Pallas two-pass instance norm (+ fused activation), forward-only.

XLA's elementwise passes over full-resolution small-channel volumes run at
~1/15 of HBM bandwidth (layout-padded); at 128^3 each norm+act site costs
~5 ms. This kernel does: pass 1 accumulates per-(b, c) sum/sumsq in a
VMEM-resident [2, C] block across the (B, D) grid; pass 2 normalizes and
applies the activation in one read+write.

Forward-only (no custom VJP). MEASURED OUTCOME (round 1): standalone the
kernel beats the XLA norm+act 4.4 vs 5.6 ms at [2,16,128^3], but wired into
the full model it is net-neutral (174.8 vs 171.8 ms forward) — XLA already
fuses the norm chains with neighboring ops, and extra pallas_call boundaries
break that fusion. Kept unwired as groundwork; revisit if norm sites stop
being fusion-adjacent (e.g. after conv+norm+act fuse into one kernel).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stats_kernel(x_ref, o_ref):
    d = pl.program_id(1)

    @pl.when(d == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    x = x_ref[...].astype(jnp.float32)  # [C, H, W]
    # all intermediates rank >= 2 (Mosaic's layout pass rejects rank-1)
    c = x.shape[0]
    s2 = jnp.sum(jnp.sum(x, axis=2), axis=1, keepdims=True)        # [C, 1]
    q2 = jnp.sum(jnp.sum(x * x, axis=2), axis=1, keepdims=True)    # [C, 1]
    pad = jnp.zeros((c, o_ref.shape[1] - 2), jnp.float32)
    o_ref[...] += jnp.concatenate([s2, q2, pad], axis=1)


def _apply_kernel(x_ref, stats_ref, o_ref, *, n_vox: float, eps: float,
                  act: Optional[str], negative_slope: float):
    x = x_ref[...]  # [C, H, W]
    mean = stats_ref[:, 0:1] / n_vox                       # [C, 1]
    var = jnp.maximum(stats_ref[:, 1:2] / n_vox - mean * mean, 0.0)
    r = jax.lax.rsqrt(var + eps)
    y = (x.astype(jnp.float32) - mean[:, :, None]) * r[:, :, None]
    if act == "relu":
        y = jnp.maximum(y, 0.0)
    elif act == "leakyrelu":
        y = jnp.where(y >= 0, y, negative_slope * y)
    o_ref[...] = y.astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("eps", "act", "negative_slope", "interpret"))
def pallas_instance_norm(
    x: jnp.ndarray,
    eps: float = 1e-5,
    act: Optional[str] = None,
    negative_slope: float = 1e-2,
    interpret: bool = False,
) -> jnp.ndarray:
    """[B, C, D, H, W] -> instance-normalized (+activated) volume."""
    b, c, d, h, w = x.shape
    stats = pl.pallas_call(
        _stats_kernel,
        grid=(b, d),
        in_specs=[pl.BlockSpec((None, c, None, h, w),
                               lambda bi, di: (bi, 0, di, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((None, c, 128), lambda bi, di: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, 128), jnp.float32),
        interpret=interpret,
    )(x)
    return pl.pallas_call(
        partial(_apply_kernel, n_vox=float(d * h * w), eps=eps, act=act,
                negative_slope=negative_slope),
        grid=(b, d),
        in_specs=[
            pl.BlockSpec((None, c, None, h, w),
                         lambda bi, di: (bi, 0, di, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, c, 128), lambda bi, di: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, c, None, h, w),
                               lambda bi, di: (bi, 0, di, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, stats)


def pallas_instance_norm_supported(x_shape) -> bool:
    if len(x_shape) != 5:
        return False
    try:
        if jax.default_backend() != "tpu":
            return False
    except RuntimeError:
        return False
    b, c, d, h, w = x_shape
    # c == 1 trips a Mosaic relayout bug (replicated singleton dim)
    if w % 128 != 0 or h < 8 or c < 2 or c > 64 or d < 2:
        return False
    # one slab (+double buffering) must fit VMEM comfortably
    return (c * h * w * 4) * 3 < 12 * 1024 * 1024
