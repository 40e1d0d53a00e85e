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

# Mosaic stack-allocates unrolled tap temporaries; at the 64^3 level's
# 64-128 channel convs the default 16 MB scoped-vmem cap is too small
# (v5e has 128 MB physical VMEM).
_CPARAMS = pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)


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

    # stack the kd streams along channels: each (kh, kw) tap is one dot with
    # contraction dim 3*Cin (3x the MXU utilization of per-kd dots)
    cat = jnp.concatenate([sm, s0, sp], axis=0)  # [3*Cin, H, 128]
    acc = jnp.zeros(o_ref.shape, dtype=jnp.float32)
    for kh in (-1, 0, 1):
        sh = _shift_h(cat, kh)
        for kw in (-1, 0, 1):
            sw = _shift_w_packed(sh, kw)
            tap = (kh + 1) * 3 + (kw + 1)
            acc += jax.lax.dot_general(
                w_ref[tap].astype(sw.dtype), sw, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    o_ref[...] = acc.astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def _packed_fwd(xp: jnp.ndarray, w: jnp.ndarray,
                interpret: bool = False) -> jnp.ndarray:
    """Stride-1 SAME k=3 conv on PACKED slabs [B, C, D/2, H, 128] ->
    [B, Cout, D/2, H, 128] (no pack/unpack transposes)."""
    b, cin, d2, h, w2 = xp.shape
    assert w2 == 2 * _HALF
    batched = w.ndim == 6
    cout = w.shape[1] if batched else w.shape[0]
    # [(B,) 9, Cout, 3*Cin]: (kh, kw)-indexed taps, kd stacked on the
    # contraction axis in concat(kd=-1, 0, +1) order; a leading B dim means
    # per-sample CondConv kernels — still one pallas instance.
    if batched:
        w_taps = jnp.transpose(w, (0, 4, 5, 1, 3, 2)).reshape(
            b, 9, cout, 3 * cin
        ).astype(jnp.float32)
        w_spec = pl.BlockSpec((None, 9, cout, 3 * cin),
                              lambda bi, pi: (bi, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    else:
        w_taps = jnp.transpose(w, (3, 4, 0, 2, 1)).reshape(
            9, cout, 3 * cin
        ).astype(jnp.float32)
        w_spec = pl.BlockSpec((9, cout, 3 * cin),
                              lambda bi, pi: (0, 0, 0),
                              memory_space=pltpu.VMEM)

    def idx(off):
        def f(bi, pi):
            return (bi, 0, jnp.clip(pi + off, 0, d2 - 1), 0, 0)

        return f

    spec = lambda off: pl.BlockSpec(  # noqa: E731
        (None, cin, None, h, w2), idx(off), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        partial(_packed_kernel, dsize2=d2),
        grid=(b, d2),
        in_specs=[spec(-1), spec(0), spec(1), w_spec],
        out_specs=pl.BlockSpec(
            (None, cout, None, h, w2), lambda bi, pi: (bi, 0, pi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, cout, d2, h, w2), xp.dtype),
        compiler_params=_CPARAMS,
        interpret=interpret,
    )(xp, xp, xp, w_taps)


def _dw_packed_kernel(xm_ref, x0_ref, xp_ref, g_ref, o_ref, *, dsize2: int,
                      batched: bool = False):
    """Weight grad on packed slabs: accumulate dw[tap, Cout, Cin] over the
    (B, D/2) grid (per batch item when `batched`) — contraction over packed
    pixels sums both D-slices of a slab, which is exactly the unpacked-pixel
    sum."""
    b = pl.program_id(0)
    p = pl.program_id(1)

    @pl.when(p == 0 if batched else jnp.logical_and(b == 0, p == 0))
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    prev, cur, nxt = xm_ref[...], x0_ref[...], xp_ref[...]
    sm = jnp.concatenate([prev[:, :, _HALF:], cur[:, :, :_HALF]], axis=2)
    sm = jnp.where(p > 0, sm,
                   jnp.concatenate([jnp.zeros_like(prev[:, :, _HALF:]),
                                    cur[:, :, :_HALF]], axis=2))
    s0 = cur
    sp = jnp.concatenate([cur[:, :, _HALF:], nxt[:, :, :_HALF]], axis=2)
    sp = jnp.where(p < dsize2 - 1, sp,
                   jnp.concatenate([cur[:, :, _HALF:],
                                    jnp.zeros_like(nxt[:, :, :_HALF])],
                                   axis=2))
    g = g_ref[...]  # [Cout, H, 128]
    hw = g.shape[1] * g.shape[2]
    ga = g.reshape(g.shape[0], hw)
    for kd, s in enumerate((sm, s0, sp)):
        for kh in (-1, 0, 1):
            sh = _shift_h(s, kh)
            for kw in (-1, 0, 1):
                sw = _shift_w_packed(sh, kw)
                tap = (kd * 3 + (kh + 1)) * 3 + (kw + 1)
                o_ref[tap] += jax.lax.dot_general(
                    ga, sw.reshape(sw.shape[0], hw),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )


@partial(jax.jit, static_argnames=("batched", "interpret"))
def _packed_dw(xp: jnp.ndarray, g: jnp.ndarray, batched: bool = False,
               interpret: bool = False) -> jnp.ndarray:
    """Weight grad of the packed stride-1 conv: [Cout, Cin, 3, 3, 3], or
    per-sample [B, Cout, Cin, 3, 3, 3] when `batched`."""
    b, cin, d2, h, w2 = xp.shape
    cout = g.shape[1]

    def idx(off):
        def f(bi, pi):
            return (bi, 0, jnp.clip(pi + off, 0, d2 - 1), 0, 0)

        return f

    spec = lambda off: pl.BlockSpec(  # noqa: E731
        (None, cin, None, h, w2), idx(off), memory_space=pltpu.VMEM
    )
    if batched:
        out_spec = pl.BlockSpec((None, 27, cout, cin),
                                lambda bi, pi: (bi, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((b, 27, cout, cin), jnp.float32)
    else:
        out_spec = pl.BlockSpec((27, cout, cin), lambda bi, pi: (0, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((27, cout, cin), jnp.float32)
    dw_taps = pl.pallas_call(
        partial(_dw_packed_kernel, dsize2=d2, batched=batched),
        grid=(b, d2),
        in_specs=[
            spec(-1), spec(0), spec(1),
            pl.BlockSpec((None, cout, None, h, w2),
                         lambda bi, pi: (bi, 0, pi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        compiler_params=_CPARAMS,
        interpret=interpret,
    )(xp, xp, xp, g)
    if batched:
        return jnp.transpose(dw_taps, (0, 2, 3, 1)).reshape(
            b, cout, cin, 3, 3, 3
        )
    return jnp.transpose(dw_taps, (1, 2, 0)).reshape(cout, cin, 3, 3, 3)


@jax.custom_vjp
def pallas_conv3d_packed(xp: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Stride-1 SAME k=3 conv on packed slabs, AD-complete."""
    return _packed_fwd(xp, w)


def _vjp_fwd(xp, w):
    return _packed_fwd(xp, w), (xp, w)


def _vjp_bwd(res, g):
    xp, w = res
    g = g.astype(xp.dtype)
    # dx: same packed conv with the spatially-flipped, io-swapped kernel
    w_t = jnp.flip(w, axis=(2, 3, 4)).transpose(1, 0, 2, 3, 4)
    dxp = _packed_fwd(g, w_t.astype(w.dtype))
    dw = _packed_dw(xp, g)
    return dxp.astype(xp.dtype), dw.astype(w.dtype)


pallas_conv3d_packed.defvjp(_vjp_fwd, _vjp_bwd)


def pallas_conv3d_w64(x: jnp.ndarray, w: jnp.ndarray,
                      interpret: bool = False) -> jnp.ndarray:
    """Stride-1 SAME k=3 conv for [B, C, D, H, 64] volumes (D even).

    Packs D-pairs along W outside the kernel; the conv itself runs on
    128-lane packed slabs. Kept for standalone use/benchmarks — the model
    path uses `pallas_conv3d_packed` on already-packed activations.
    """
    b, cin, dsz, h, wd = x.shape
    assert wd == _HALF and dsz % 2 == 0
    cout = w.shape[0]
    xp = (
        x.reshape(b, cin, dsz // 2, 2, h, wd)
        .transpose(0, 1, 2, 4, 3, 5)
        .reshape(b, cin, dsz // 2, h, 2 * wd)
    )
    out = _packed_fwd(xp, w, interpret=interpret)
    d2 = dsz // 2
    return (
        out.reshape(b, cout, d2, h, 2, wd)
        .transpose(0, 1, 2, 4, 3, 5)
        .reshape(b, cout, dsz, h, wd)
    )


@jax.custom_vjp
def pallas_conv3d_packed_b(xp: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """`pallas_conv3d_packed` with PER-SAMPLE kernels w [B, Cout, Cin, 3,3,3]
    (CondConv expert mixture) — one pallas instance for the whole batch."""
    return _packed_fwd(xp, w)


def _vjp_b_fwd(xp, w):
    return _packed_fwd(xp, w), (xp, w)


def _vjp_b_bwd(res, g):
    xp, w = res
    g = g.astype(xp.dtype)
    w_t = jnp.flip(w, axis=(3, 4, 5)).transpose(0, 2, 1, 3, 4, 5)
    dxp = _packed_fwd(g, w_t.astype(w.dtype))
    dw = _packed_dw(xp, g, batched=True)
    return dxp.astype(xp.dtype), dw.astype(w.dtype)


pallas_conv3d_packed_b.defvjp(_vjp_b_fwd, _vjp_b_bwd)
