"""Phase-decomposed stride-1 k=3 conv ("p1") — the M-starved s1 fix.

The base stride-1 kernel (conv3d.py) computes dots of shape
[Cout, 3*Cin] x [3*Cin, H*W]: at the flagship's Cout = 16..32 the MXU's
128 result rows are 12-25% filled, and each of 9 taps shifts a full
[3Cin, H, W] slab (27 slab-copies of VPU work per D-slice) behind a
3-slab halo fetch (3x HBM read amplification). This kernel decomposes the
conv by D/H PARITY instead (the `conv3d_strided.py` v2 treatment applied
to stride 1):

    out[2u+pd, 2v+ph] = sum_taps  w . x[2u+pd+td-1, 2v+ph+th-1]

Stacking the 4 output phases (pd, ph) x Cout along the dot's M dim and the
16 distinct (D-slot, H-variant) x Cin input combinations along K gives,
per W tap,

    [4*Cout, 16*Cin] x [16*Cin, H/2 * W]

— M = 128 at Cout = 32 (full MXU rows), 3 lane-shifted operands per grid
step instead of 9 (2.25x less VPU copy traffic per output voxel), 2x HBM
read amplification instead of 3x, and half the grid steps (each emits a
packed D-pair). The weight matrix zero-pads the 9-of-16 (slot, variant)
slots a given output phase actually reads — 16/9 redundant MXU work, paid
at ~4x better utilization. Output D-pairs store interleaved directly
([Cout, 2, H, W] blocks; the H interleave is the f32 reshape-merge proven
in the t2 v1 kernel) so there is NO XLA phase-merge epilogue — the lesson
of t2-v2's losing 10 ms merge.

Same SAME-padding exactness story as the rest of the family: all shifts
zero-fill, out-of-volume D slabs are masked, and the XLA phase-split
prologue (`_phase_split4`) is the same strided-slice pattern the measured
s2-v2 winner pays.

Replaces cuDNN's role for MONAI `Convolution` stride-1 blocks
(`attn_unet_data_parallel.py:285-306` call sites); per-sample-kernel
(CondConv expert mixture) variants included, like every family here.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from coma_unet_tpu.ops.pallas.conv3d import _shift_hw

_CPARAMS = pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)

# (pd, td) -> D-slot  /  (ph, th) -> H-variant (identical tables):
#   D-slots:    0 = D0[u]   1 = D0[u+1]   2 = D1[u-1]   3 = D1[u]
#   H-variants: 0 = H0[v]   1 = H0[v+1]   2 = H1[v-1]   3 = H1[v]
_SLOT = {(0, 0): 2, (0, 1): 0, (0, 2): 3,
         (1, 0): 0, (1, 1): 3, (1, 2): 1}


def _phase_split4(x: jnp.ndarray):
    """[B, C, D, H, W] -> 4 tensors P[pd][ph] = x[:, :, pd::2, ph::2, :],
    each [B, C, D/2, H/2, W]."""
    return tuple(
        tuple(x[:, :, pd::2, ph::2, :] for ph in (0, 1)) for pd in (0, 1)
    )


def _w_taps_p1(w: jnp.ndarray) -> jnp.ndarray:
    """[Cout, Cin, 3, 3, 3] -> [3(tw), 4*Cout, 16*Cin] f32 with the 9-of-16
    (slot, variant) zero structure; leading B dim passes through (per-sample
    CondConv kernels)."""
    batched = w.ndim == 6
    cout, cin = w.shape[-5], w.shape[-4]
    lead = w.shape[:1] if batched else ()
    wt = jnp.zeros(lead + (3, 2, 2, cout, 4, 4, cin), jnp.float32)
    wf = w.astype(jnp.float32)
    for td in range(3):
        for th in range(3):
            for tw in range(3):
                tap = wf[..., :, :, td, th, tw]  # [(B,) Cout, Cin]
                for pd in (0, 1):
                    for ph in (0, 1):
                        sd = _SLOT[(pd, td)]
                        sh = _SLOT[(ph, th)]
                        wt = wt.at[..., tw, pd, ph, :, sd, sh, :].add(tap)
    return wt.reshape(lead + (3, 4 * cout, 16 * cin))


def _variants(h0, h1):
    """The 4 H-variants of one D-slot from its two H-phase slabs:
    [H0[v], H0[v+1], H1[v-1], H1[v]] (order = variant index)."""
    return (h0, _shift_hw(h0, 1, 0), _shift_hw(h1, -1, 0), h1)


def _p1_kernel(p00_0, p00_1, p01_0, p01_1, p10_m, p10_0, p11_m, p11_0,
               w_ref, o_ref, *, usize: int):
    """Grid (B, D/2). Output block = interleaved D-pair [Cout, 2, H, W]."""
    u = pl.program_id(1)
    # D-slots (each as its two H-phase slabs), out-of-volume slabs zeroed
    a1_mask = u < usize - 1
    bm_mask = u > 0
    slots = (
        (p00_0[...], p01_0[...]),                             # 0: D0[u]
        (jnp.where(a1_mask, p00_1[...], 0.0),
         jnp.where(a1_mask, p01_1[...], 0.0)),                # 1: D0[u+1]
        (jnp.where(bm_mask, p10_m[...], 0.0),
         jnp.where(bm_mask, p11_m[...], 0.0)),                # 2: D1[u-1]
        (p10_0[...], p11_0[...]),                             # 3: D1[u]
    )
    cat = jnp.concatenate(
        [v for h0, h1 in slots for v in _variants(h0, h1)], axis=0
    )  # [16*Cin, H/2, W]
    acc = None
    for tw in (0, 1, 2):
        opnd = _shift_hw(cat, 0, tw - 1)
        prec = (jax.lax.Precision.HIGHEST
                if opnd.dtype == jnp.float32 else None)
        d = jax.lax.dot_general(
            w_ref[tw].astype(opnd.dtype), opnd, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )  # [4*Cout, H/2, W]
        acc = d if acc is None else acc + d
    cout = o_ref.shape[0]
    h2, wd = acc.shape[1], acc.shape[2]
    outs = []
    for pd in (0, 1):
        e = acc[pd * 2 * cout: pd * 2 * cout + cout]        # ph = 0 rows
        o = acc[pd * 2 * cout + cout: (pd + 1) * 2 * cout]  # ph = 1 rows
        # interleave H phases: out[2v] = e[v], out[2v+1] = o[v] — the f32
        # reshape-merge (sublane reshapes only lower in f32), t2-v1 pattern
        outs.append(
            jnp.concatenate([e[:, :, None, :], o[:, :, None, :]],
                            axis=2).reshape(cout, 2 * h2, wd)
        )
    o_ref[...] = jnp.stack(outs, axis=1).astype(o_ref.dtype)


def _phase_in_specs(cin: int, h2: int, wd: int, usize: int):
    """The 8 (phase tensor, D-offset) BlockSpecs of the fwd/dw kernels:
    P00@{u, u+1}, P01@{u, u+1}, P10@{u-1, u}, P11@{u-1, u}."""

    def idx(off):
        def f(bi, ui):
            return (bi, 0, jnp.clip(ui + off, 0, usize - 1), 0, 0)

        return f

    spec = lambda off: pl.BlockSpec(  # noqa: E731
        (None, cin, None, h2, wd), idx(off), memory_space=pltpu.VMEM
    )
    return [spec(0), spec(1), spec(0), spec(1),
            spec(-1), spec(0), spec(-1), spec(0)]


def _phase_operands(x):
    (p00, p01), (p10, p11) = _phase_split4(x)
    return [p00, p00, p01, p01, p10, p10, p11, p11]


@partial(jax.jit, static_argnames=("interpret",))
def _p1_fwd(x: jnp.ndarray, w: jnp.ndarray,
            interpret: bool = False) -> jnp.ndarray:
    """Stride-1 SAME k=3 conv, NCDHW (even D and H) -> NCDHW. w is
    [Cout, Cin, 3, 3, 3] or per-sample [B, Cout, Cin, 3, 3, 3]."""
    b, cin, dsz, h, wd = x.shape
    assert dsz % 2 == 0 and h % 2 == 0
    batched = w.ndim == 6
    cout = w.shape[1] if batched else w.shape[0]
    w_taps = _w_taps_p1(w)
    if batched:
        w_spec = pl.BlockSpec((None, 3, 4 * cout, 16 * cin),
                              lambda bi, ui: (bi, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    else:
        w_spec = pl.BlockSpec((3, 4 * cout, 16 * cin),
                              lambda bi, ui: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    usize = dsz // 2
    return pl.pallas_call(
        partial(_p1_kernel, usize=usize),
        grid=(b, usize),
        in_specs=_phase_in_specs(cin, h // 2, wd, usize) + [w_spec],
        out_specs=pl.BlockSpec(
            (None, cout, 2, h, wd), lambda bi, ui: (bi, 0, ui, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, cout, dsz, h, wd), x.dtype),
        compiler_params=_CPARAMS,
        interpret=interpret,
    )(*_phase_operands(x), w_taps)


def _p1_dw_kernel(p00_0, p00_1, p01_0, p01_1, p10_m, p10_0, p11_m, p11_0,
                  g00, g01, g10, g11, o_ref, *, usize: int,
                  batched: bool = False):
    """dw accumulator [3(tw), 4*Cout, 16*Cin] over the (B, D/2) grid
    (per batch item when `batched`); XLA folds it to [Cout, Cin, 3,3,3]
    via `_dw_untap` (exactly inverting the `_w_taps_p1` scatter)."""
    b = pl.program_id(0)
    u = pl.program_id(1)
    first = u == 0
    if not batched:
        first = jnp.logical_and(b == 0, first)

    @pl.when(first)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    a1_mask = u < usize - 1
    bm_mask = u > 0
    slots = (
        (p00_0[...], p01_0[...]),
        (jnp.where(a1_mask, p00_1[...], 0.0),
         jnp.where(a1_mask, p01_1[...], 0.0)),
        (jnp.where(bm_mask, p10_m[...], 0.0),
         jnp.where(bm_mask, p11_m[...], 0.0)),
        (p10_0[...], p11_0[...]),
    )
    cat = jnp.concatenate(
        [v for h0, h1 in slots for v in _variants(h0, h1)], axis=0
    )  # [16*Cin, H/2, W]
    ga = jnp.concatenate(
        [g00[...], g01[...], g10[...], g11[...]], axis=0
    )  # [4*Cout, H/2, W] — row order (pd, ph, o) matches _w_taps_p1
    m, h2, wd = ga.shape
    gf = ga.reshape(m, h2 * wd)
    for tw in (0, 1, 2):
        opnd = _shift_hw(cat, 0, tw - 1)
        o_ref[tw] += jax.lax.dot_general(
            gf, opnd.reshape(opnd.shape[0], h2 * wd),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def _dw_untap(dw_taps: jnp.ndarray, cout: int, cin: int) -> jnp.ndarray:
    """[(B,) 3, 4*Cout, 16*Cin] -> [(B,) Cout, Cin, 3, 3, 3]: sum the
    (pd, ph) phase blocks back onto their (td, th) taps (the exact inverse
    of the `_w_taps_p1` scatter — each (pd/ph, td/th) pair maps to one
    slot/variant)."""
    lead = dw_taps.shape[:-3]
    m = dw_taps.reshape(lead + (3, 2, 2, cout, 4, 4, cin))
    rows = []
    for td in range(3):
        cols = []
        for th in range(3):
            acc = None
            for pd in (0, 1):
                for ph in (0, 1):
                    t = m[..., :, pd, ph, :, _SLOT[(pd, td)],
                          _SLOT[(ph, th)], :]  # [(B,) 3, Cout, Cin]
                    acc = t if acc is None else acc + t
            cols.append(acc)
        rows.append(jnp.stack(cols, axis=-1))  # [(B,) 3(tw), Co, Ci, 3(th)]
    dw = jnp.stack(rows, axis=-1)  # [(B,) 3(tw), Cout, Cin, 3(th), 3(td)]
    # -> [(B,) Cout, Cin, td, th, tw]
    perm = tuple(range(len(lead))) + tuple(
        len(lead) + i for i in (1, 2, 4, 3, 0)
    )
    return jnp.transpose(dw, perm)


@partial(jax.jit, static_argnames=("batched", "interpret"))
def _p1_dw(x: jnp.ndarray, g: jnp.ndarray, batched: bool = False,
           interpret: bool = False) -> jnp.ndarray:
    """Weight gradient of the stride-1 SAME k=3 conv: [Cout, Cin, 3, 3, 3]
    (leading B when `batched`) — one full-M/N dot per W tap per grid step
    ([4*Cout, H2*W] x [16*Cin, H2*W]^T) instead of 27 M=Cout, N=Cin
    contractions."""
    b, cin, dsz, h, wd = x.shape
    cout = g.shape[1]
    assert dsz % 2 == 0 and h % 2 == 0
    usize = dsz // 2
    h2 = h // 2
    (g00, g01), (g10, g11) = _phase_split4(g)
    g_spec = pl.BlockSpec((None, cout, None, h2, wd),
                          lambda bi, ui: (bi, 0, ui, 0, 0),
                          memory_space=pltpu.VMEM)
    if batched:
        out_spec = pl.BlockSpec((None, 3, 4 * cout, 16 * cin),
                                lambda bi, ui: (bi, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((b, 3, 4 * cout, 16 * cin),
                                         jnp.float32)
    else:
        out_spec = pl.BlockSpec((3, 4 * cout, 16 * cin),
                                lambda bi, ui: (0, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((3, 4 * cout, 16 * cin), jnp.float32)
    dw_taps = pl.pallas_call(
        partial(_p1_dw_kernel, usize=usize, batched=batched),
        grid=(b, usize),
        in_specs=_phase_in_specs(cin, h2, wd, usize) + [g_spec] * 4,
        out_specs=out_spec,
        out_shape=out_shape,
        compiler_params=_CPARAMS,
        interpret=interpret,
    )(*_phase_operands(x), g00, g01, g10, g11)
    return _dw_untap(dw_taps, cout, cin)


def p1_supported(x_shape, cout: int) -> bool:
    """Shape gate for the p1 family: W = one 128-lane tile, even D/H, H/2
    still >= 8 sublanes, channel budget inside the VMEM plan (callers
    channel-chunk wider convs, conv being linear in Cin)."""
    if len(x_shape) != 5:
        return False
    b, c, d, h, wd = x_shape
    return (wd == 128 and d % 2 == 0 and h % 2 == 0 and h >= 16
            and d >= 4 and c <= 32 and cout <= 32 and b * d >= 4)


@jax.custom_vjp
def pallas_conv3d_p1(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Stride-1 SAME k=3 conv (phase-decomposed), AD-complete."""
    return _p1_fwd(x, w)


def _p1_vjp_fwd(x, w):
    return _p1_fwd(x, w), (x, w)


def _p1_vjp_bwd(res, g):
    x, w = res
    g = g.astype(x.dtype)
    w_t = jnp.flip(w, axis=(2, 3, 4)).transpose(1, 0, 2, 3, 4)
    dx = _p1_fwd(g, w_t.astype(w.dtype))
    dw = _p1_dw(x, g)
    return dx.astype(x.dtype), dw.astype(w.dtype)


pallas_conv3d_p1.defvjp(_p1_vjp_fwd, _p1_vjp_bwd)


@jax.custom_vjp
def pallas_conv3d_p1_b(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """`pallas_conv3d_p1` with PER-SAMPLE kernels w [B, Cout, Cin, 3, 3, 3]
    (CondConv expert mixture) — one pallas instance for the whole batch."""
    return _p1_fwd(x, w)


def _p1_b_vjp_fwd(x, w):
    return _p1_fwd(x, w), (x, w)


def _p1_b_vjp_bwd(res, g):
    x, w = res
    g = g.astype(x.dtype)
    w_t = jnp.flip(w, axis=(3, 4, 5)).transpose(0, 2, 1, 3, 4, 5)
    dx = _p1_fwd(g, w_t.astype(w.dtype))
    dw = _p1_dw(x, g, batched=True)
    return dx.astype(x.dtype), dw.astype(w.dtype)


pallas_conv3d_p1_b.defvjp(_p1_b_vjp_fwd, _p1_b_vjp_bwd)
