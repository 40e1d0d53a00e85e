"""Pallas conv for W=64 volumes via D-slice packing (the 64^3 U-Net level).

The base kernel (conv3d.py) requires W % 128 == 0 — at W=64, Mosaic rejects
the 64-lane shift/select patterns. Here two consecutive D-slices pack along W
([B, C, D, H, 64] -> [B, C, D/2, H, 128]) so every in-kernel vector is
128-lane:

  * D-taps become static half-slab slice+concats:
      slice sequence shifted by -1  =  concat(prev[:, :, 64:], cur[:, :, :64])
      slice sequence shifted by +1  =  concat(cur[:, :, 64:], next[:, :, :64])
  * W-taps shift one lane with an extra (w % 64) boundary mask so columns
    never leak across the packed-slice boundary.
  * H-taps are unchanged.

Standalone for now (not wired into the model): the net win at the 64^3 level
depends on keeping activations packed across consecutive ops, which is a
round-2 integration (see ROUND_NOTES.md).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HALF = 64


def _shift_w_packed(x: jnp.ndarray, dw: int) -> jnp.ndarray:
    """Shift the packed W axis by dw with zero fill at BOTH the outer edges
    and the packed-slice boundary (w % 64 edges)."""
    c, h, w = x.shape
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w), 2)
    if dw > 0:  # out[w] = in[w+dw]
        x = jnp.concatenate(
            [x[:, :, dw:], jnp.zeros((c, h, dw), x.dtype)], axis=2
        )
        x = jnp.where(cols % _HALF < _HALF - dw, x, 0.0)
    elif dw < 0:
        x = jnp.concatenate(
            [jnp.zeros((c, h, -dw), x.dtype), x[:, :, :dw]], axis=2
        )
        x = jnp.where(cols % _HALF >= -dw, x, 0.0)
    return x


def _shift_h(x: jnp.ndarray, dh: int) -> jnp.ndarray:
    c, h, w = x.shape
    if dh > 0:
        return jnp.concatenate(
            [x[:, dh:], jnp.zeros((c, dh, w), x.dtype)], axis=1
        )
    if dh < 0:
        return jnp.concatenate(
            [jnp.zeros((c, -dh, w), x.dtype), x[:, :dh]], axis=1
        )
    return x


def _packed_kernel(xm_ref, x0_ref, xp_ref, w_ref, o_ref, *, dsize2: int):
    """dsize2 = number of packed slabs (D/2). Output packed slab p holds
    slices (2p | 2p+1); the D-taps per output slice map to half-slab
    concats of (prev, cur, next) packed slabs."""
    p = pl.program_id(1)
    prev, cur, nxt = xm_ref[...], x0_ref[...], xp_ref[...]

    # packed input streams shifted in D by -1 / 0 / +1:
    #  left half of shifted(-1) = slice 2p-1 (right half of prev slab)
    sm = jnp.concatenate([prev[:, :, _HALF:], cur[:, :, :_HALF]], axis=2)
    sm = jnp.where(p > 0, sm,
                   jnp.concatenate([jnp.zeros_like(prev[:, :, _HALF:]),
                                    cur[:, :, :_HALF]], axis=2))
    s0 = cur
    sp = jnp.concatenate([cur[:, :, _HALF:], nxt[:, :, :_HALF]], axis=2)
    sp = jnp.where(p < dsize2 - 1, sp,
                   jnp.concatenate([cur[:, :, _HALF:],
                                    jnp.zeros_like(nxt[:, :, :_HALF])], axis=2))

    acc = jnp.zeros(o_ref.shape, dtype=jnp.float32)
    for kd, s in enumerate((sm, s0, sp)):
        for kh in (-1, 0, 1):
            sh = _shift_h(s, kh)
            for kw in (-1, 0, 1):
                sw = _shift_w_packed(sh, kw)
                tap = (kd * 3 + (kh + 1)) * 3 + (kw + 1)
                acc += jax.lax.dot_general(
                    w_ref[tap], sw, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
    o_ref[...] = acc.astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def pallas_conv3d_w64(x: jnp.ndarray, w: jnp.ndarray,
                      interpret: bool = False) -> jnp.ndarray:
    """Stride-1 SAME k=3 conv for [B, C, D, H, 64] volumes (D even).

    Packs D-pairs along W outside the kernel; the conv itself runs on
    128-lane packed slabs.
    """
    b, cin, dsz, h, wd = x.shape
    assert wd == _HALF and dsz % 2 == 0
    cout = w.shape[0]
    # pack: [B, C, D, H, 64] -> [B, C, D/2, H, 128]
    xp = (
        x.reshape(b, cin, dsz // 2, 2, h, wd)
        .transpose(0, 1, 2, 4, 3, 5)
        .reshape(b, cin, dsz // 2, h, 2 * wd)
    )
    w_taps = jnp.transpose(w.reshape(cout, cin, -1), (2, 0, 1)).astype(
        jnp.float32
    )
    d2 = dsz // 2

    def idx(off):
        def f(bi, pi):
            return (bi, 0, jnp.clip(pi + off, 0, d2 - 1), 0, 0)

        return f

    spec = lambda off: pl.BlockSpec(  # noqa: E731
        (None, cin, None, h, 2 * wd), idx(off), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        partial(_packed_kernel, dsize2=d2),
        grid=(b, d2),
        in_specs=[
            spec(-1), spec(0), spec(1),
            pl.BlockSpec((27, cout, cin), lambda bi, pi: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, cout, None, h, 2 * wd), lambda bi, pi: (bi, 0, pi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, cout, d2, h, 2 * wd), x.dtype),
        interpret=interpret,
    )(xp, xp, xp, w_taps)
    # unpack
    return (
        out.reshape(b, cout, d2, h, 2, wd)
        .transpose(0, 1, 2, 4, 3, 5)
        .reshape(b, cout, dsz, h, wd)
    )
