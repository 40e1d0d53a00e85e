"""D-phase-stacked stride-1 k=3 conv ("p1") — the M-starved s1 fix.

The base stride-1 kernel (conv3d.py) computes dots of shape
[Cout, 3*Cin] x [3*Cin, H*W]: at the flagship's Cout = 16..32 the MXU's
128 result rows are 12-25% filled, behind 9 full-slab tap shifts and a 3x
D-halo refetch. This kernel stacks FOUR consecutive output D-slices along
the dot's M dim instead:

    out[4u+q] = sum_td  w[td] . x[4u + q + td - 1],   q in 0..3

The six distinct input D-slices 4u-1 .. 4u+4 ("slots" j = q + td) stack
along K, so each of the 9 (kh, kw) taps is ONE dot

    [4*Cout, 6*Cin] x [6*Cin, H * W]

— M = 128 at Cout = 32 (full MXU rows), K = 192 at Cin = 32. Each output
row reads 3 of its 6 K-slots (w_taps zero-pads the rest): 2x redundant
MXU work, paid at ~4x better fill. Design constraints learned the hard
way (artifacts/r3/{anatomy,split}_probe.log, kernel_probe_p1*):

  * D is the ONLY cheap phase axis: D-slice selection is pure BlockSpec
    index-map arithmetic. H/W-parity decompositions all lose — every XLA
    formulation of a sublane/lane parity split costs 4.3-7 ms per
    bf16[2,32,128^3] tensor (~10x off the memory roofline), a streaming
    Pallas prepass still pays a full extra HBM round trip, and the
    in-kernel f32 reshape-split doubles the whole kernel's time.
  * Fetch: 6 slices per step at D/4 steps = 1.5x read amplification
    (vs the base kernel's 3x halo), and the output block is 4 consecutive
    D-slices in natural order — no interleave epilogue of any kind.
  * Assembly: the 9 tap shifts move a [6*Cin, H, W] concat per step at
    1/4 the step count — half the base kernel's total shifted bytes.

dw gets the same stacking ([4*Cout, H*W] x [6*Cin, H*W]^T per tap, full
M/N fill vs the base kernel's [Cout] x [Cin] contractions) and handles
Cin = 1 natively (no [1, H*W] reshape).

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

_Q = 4           # output D-slices per grid step (M = _Q * Cout)
_NSLOT = _Q + 2  # input D-slices 4u-1 .. 4u+4


def _interp(interpret: bool) -> bool:
    """Auto-interpret off-TPU: CPU tests drive the REAL custom-VJP entry
    points (no monkeypatching); the chip gets Mosaic."""
    if interpret:
        return True
    try:
        return jax.default_backend() != "tpu"
    except RuntimeError:
        return True


def _stack_mode() -> int:
    """How many dots the 9 (kh, kw) taps fold into (trace-time env gate,
    like every kernel-family switch here): 9 = one dot per tap (the r1-r4
    kernel), 3 = kh stacked along K (one dot per kw), 1 = all 9 taps
    stacked (single dot). Fewer dots = fewer full-size f32 accumulator
    round-trips through VMEM — the cost component that p1's M-fill win
    did NOT touch and the r4 attribution left on the table (VERDICT r4
    item 2: merge0/head_c1 shift-bound at ~4x their MXU time while the
    shifted-bytes halving of p1 measured zero net win, so the invariant
    accumulator traffic was the remaining suspect). Measured r5
    (artifacts/r5/s1_stack_probe.log, solo-chip pairs): stack=1 beats
    stack=9 by 10% fwd / 6% fwd+bwd on head_c1 (8.68/20.73 vs
    9.67/22.16 ms) and 4% on mod16 fwd+bwd, with ~2x faster compiles —
    a modest, consistent win; the kernel class is otherwise at its
    im2col-shift bandwidth floor (~10 GB of irreducible shifted-copy
    VMEM traffic per call at ~1.2 TB/s). Default 1; COMA_P1_STACK
    overrides."""
    import os

    v = os.environ.get("COMA_P1_STACK", "1")
    return {"1": 1, "3": 3, "9": 9}.get(v, 1)


def _w_taps_p1(w: jnp.ndarray) -> jnp.ndarray:
    """[Cout, Cin, 3, 3, 3] -> [9(kh,kw), _Q*Cout, _NSLOT*Cin] f32 with the
    3-of-6 slot structure (row q tap td reads slot j = q + td); leading B
    dim passes through (per-sample CondConv kernels).

    Built from pure concats of weight slices and zero blocks — NO
    scatter/.at[].add: the VJP calls `_p1_fwd(g, flip(w))`, and XLA's TPU
    fusion emitter aborts (fusion_emitter.cc `window.pad_low[i] == 0`)
    when it folds that `reverse` into the pad ops a zeros-scatter lowers
    to (minimal repro: grad of pallas_conv3d_p1_b at [2,32,128^3])."""
    batched = w.ndim == 6
    cout, cin = w.shape[-5], w.shape[-4]
    lead = w.shape[:1] if batched else ()
    wf = w.astype(jnp.float32)
    zeros = jnp.zeros(lead + (cout, cin), jnp.float32)
    taps = []
    for kh in range(3):
        for kw in range(3):
            rows = []
            for q in range(_Q):
                blocks = [
                    wf[..., :, :, slot - q, kh, kw]
                    if 0 <= slot - q <= 2 else zeros
                    for slot in range(_NSLOT)
                ]
                rows.append(jnp.concatenate(blocks, axis=-1))
            taps.append(jnp.concatenate(rows, axis=-2))
    return jnp.stack(taps, axis=-3)  # [(B,) 9, _Q*Cout, _NSLOT*Cin]


def _w_taps_stacked(w: jnp.ndarray, stack: int) -> jnp.ndarray:
    """Regroup `_w_taps_p1` for the stacked-K kernel variants: the rhs is
    built kw-outer / kh-inner (`_p1_kernel`), so K blocks must follow the
    same order. stack=3 -> [(B,) 3(kw), M, 3(kh)*K0]; stack=1 ->
    [(B,) 1, M, 9*K0]."""
    w9 = _w_taps_p1(w)
    if stack == 9:
        return w9

    def tap(kh, kw):
        return w9[..., (kh + 1) * 3 + (kw + 1), :, :]

    groups = [
        jnp.concatenate([tap(kh, kw) for kh in (-1, 0, 1)], axis=-1)
        for kw in (-1, 0, 1)
    ]
    if stack == 3:
        return jnp.stack(groups, axis=-3)
    return jnp.concatenate(groups, axis=-1)[..., None, :, :]


def _slot_cat(refs, u, usize):
    """The shared [_NSLOT*Cin, H, W] operand: input D-slices 4u-1 .. 4u+4,
    out-of-volume edges zeroed (only slots 0 and _NSLOT-1 can fall off)."""
    slabs = []
    for j, r in enumerate(refs):
        slab = r[...]
        if j == 0:
            slab = jnp.where(u > 0, slab, 0.0)
        if j == _NSLOT - 1:
            slab = jnp.where(u < usize - 1, slab, 0.0)
        slabs.append(slab)
    return jnp.concatenate(slabs, axis=0)


def _p1_kernel(*refs, usize: int, stack: int = 9):
    """Grid (B, D/4). Output block = _Q consecutive D-slices
    [Cout, _Q, H, W] in natural order.

    `stack` folds taps along the contraction dim (see `_stack_mode`):
    stack=9 dots per-tap ([M, K0] x [K0, H, W] x9); stack=3 concatenates
    the 3 kh-shifted copies per kw and dots once per kw ([M, 3*K0]); and
    stack=1 concatenates all 9 shifted copies for ONE [M, 9*K0] dot —
    same shifted bytes, but 1 instead of 9 full-size f32 accumulator
    read-modify-writes (and the 9-tap sum accumulates in the MXU's f32
    pipeline instead of explicit VMEM adds). The W (lane) shift is hoisted
    per kw — the factorized order also matches the Mosaic constraint that
    concatenate rejects sublane-offset operands (conv3d.py htiled)."""
    x_refs, w_ref, o_ref = refs[:_NSLOT], refs[_NSLOT], refs[_NSLOT + 1]
    u = pl.program_id(1)
    cat = _slot_cat(x_refs, u, usize)
    prec = (jax.lax.Precision.HIGHEST
            if cat.dtype == jnp.float32 else None)

    def dot(wk, rhs):
        return jax.lax.dot_general(
            wk.astype(rhs.dtype), rhs, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )  # [_Q*Cout, H, W]

    if stack == 9:
        acc = None
        for kh in (-1, 0, 1):
            for kw in (-1, 0, 1):
                s = _shift_hw(cat, kh, kw)
                tap = (kh + 1) * 3 + (kw + 1)
                d = dot(w_ref[tap], s)
                acc = d if acc is None else acc + d
    elif stack == 1:
        parts = []
        for kw in (-1, 0, 1):
            sw = _shift_hw(cat, 0, kw)
            # kh-inner order matches _w_taps_stacked
            parts += [_shift_hw(sw, kh, 0) for kh in (-1, 0, 1)]
        acc = dot(w_ref[0], jnp.concatenate(parts, axis=0))
    else:  # stack == 3: build/dot one kw group at a time (1 rhs live)
        acc = None
        for i, kw in enumerate((-1, 0, 1)):
            sw = _shift_hw(cat, 0, kw)
            rhs = jnp.concatenate(
                [_shift_hw(sw, kh, 0) for kh in (-1, 0, 1)], axis=0
            )  # [3*K0, H, W]
            d = dot(w_ref[i], rhs)
            acc = d if acc is None else acc + d
    cout = o_ref.shape[0]
    o_ref[...] = jnp.stack(
        [acc[q * cout:(q + 1) * cout] for q in range(_Q)], axis=1
    ).astype(o_ref.dtype)


def _x_in_specs(cin: int, h: int, wd: int, dsz: int):
    """BlockSpecs for the _NSLOT raw input D-slices at element indices
    _Q*u + (-1 .. _Q)."""

    def idx(off):
        def f(bi, ui):
            return (bi, 0, jnp.clip(_Q * ui + off, 0, dsz - 1), 0, 0)

        return f

    return [
        pl.BlockSpec((None, cin, None, h, wd), idx(off),
                     memory_space=pltpu.VMEM)
        for off in range(-1, _Q + 1)
    ]


@partial(jax.jit, static_argnames=("interpret",))
def _p1_fwd(x: jnp.ndarray, w: jnp.ndarray,
            interpret: bool = False) -> jnp.ndarray:
    """Stride-1 SAME k=3 conv, NCDHW (D % 4 == 0) -> NCDHW. w is
    [Cout, Cin, 3, 3, 3] or per-sample [B, Cout, Cin, 3, 3, 3]."""
    interpret = _interp(interpret)
    b, cin, dsz, h, wd = x.shape
    assert dsz % _Q == 0
    batched = w.ndim == 6
    cout = w.shape[1] if batched else w.shape[0]
    stack = _stack_mode()
    w_taps = _w_taps_stacked(w, stack)
    ngrp, kdim = w_taps.shape[-3], w_taps.shape[-1]
    if batched:
        w_spec = pl.BlockSpec((None, ngrp, _Q * cout, kdim),
                              lambda bi, ui: (bi, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    else:
        w_spec = pl.BlockSpec((ngrp, _Q * cout, kdim),
                              lambda bi, ui: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    usize = dsz // _Q
    return pl.pallas_call(
        partial(_p1_kernel, usize=usize, stack=stack),
        grid=(b, usize),
        in_specs=_x_in_specs(cin, h, wd, dsz) + [w_spec],
        out_specs=pl.BlockSpec(
            (None, cout, _Q, h, wd), lambda bi, ui: (bi, 0, ui, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, cout, dsz, h, wd), x.dtype),
        compiler_params=_CPARAMS,
        interpret=interpret,
    )(*([x] * _NSLOT), w_taps)


def _p1_dw_kernel(*refs, usize: int, batched: bool = False):
    """dw accumulator [9(kh,kw), _Q*Cout, _NSLOT*Cin] over the (B, D/4)
    grid (per batch item when `batched`); XLA folds it to
    [Cout, Cin, 3, 3, 3] via `_dw_untap`."""
    x_refs, g_ref, o_ref = refs[:_NSLOT], refs[_NSLOT], refs[_NSLOT + 1]
    b = pl.program_id(0)
    u = pl.program_id(1)
    first = u == 0
    if not batched:
        first = jnp.logical_and(b == 0, first)

    @pl.when(first)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    cat = _slot_cat(x_refs, u, usize)
    g = g_ref[...]  # [Cout, _Q, H, W] — _Q consecutive cotangent slices
    cout, _, h, wd = g.shape
    # row order (q, cout) matches _w_taps_p1
    ga = jnp.concatenate([g[:, q] for q in range(_Q)], axis=0)
    gf = ga.reshape(_Q * cout, h * wd)
    for kh in (-1, 0, 1):
        for kw in (-1, 0, 1):
            s = _shift_hw(cat, kh, kw)
            tap = (kh + 1) * 3 + (kw + 1)
            o_ref[tap] += jax.lax.dot_general(
                gf, s.reshape(s.shape[0], h * wd),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )


def _dw_untap(dw_taps: jnp.ndarray, cout: int, cin: int) -> jnp.ndarray:
    """[(B,) 9, _Q*Cout, _NSLOT*Cin] -> [(B,) Cout, Cin, 3, 3, 3]: sum the
    q phase blocks back onto their td taps (row q, tap td <-> slot q+td —
    the exact inverse of the `_w_taps_p1` scatter)."""
    lead = dw_taps.shape[:-3]
    m = dw_taps.reshape(lead + (3, 3, _Q, cout, _NSLOT, cin))
    dw_td = []
    for td in range(3):
        acc = None
        for q in range(_Q):
            t = m[..., :, :, q, :, q + td, :]  # [(B,) 3, 3, Cout, Cin]
            acc = t if acc is None else acc + t
        dw_td.append(acc)
    dw = jnp.stack(dw_td, axis=-5)  # [(B,) td, kh, kw, Cout, Cin]
    perm = tuple(range(len(lead))) + tuple(
        len(lead) + i for i in (3, 4, 0, 1, 2)
    )
    return jnp.transpose(dw, perm)


@partial(jax.jit, static_argnames=("batched", "interpret"))
def _p1_dw(x: jnp.ndarray, g: jnp.ndarray, batched: bool = False,
           interpret: bool = False) -> jnp.ndarray:
    """Weight gradient of the stride-1 SAME k=3 conv: [Cout, Cin, 3, 3, 3]
    (leading B when `batched`) — one [_Q*Cout, H*W] x [_NSLOT*Cin, H*W]^T
    dot per tap per grid step instead of 27 M=Cout, N=Cin contractions."""
    interpret = _interp(interpret)
    b, cin, dsz, h, wd = x.shape
    cout = g.shape[1]
    assert dsz % _Q == 0
    usize = dsz // _Q
    g_spec = pl.BlockSpec((None, cout, _Q, h, wd),
                          lambda bi, ui: (bi, 0, ui, 0, 0),
                          memory_space=pltpu.VMEM)
    if batched:
        out_spec = pl.BlockSpec((None, 9, _Q * cout, _NSLOT * cin),
                                lambda bi, ui: (bi, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((b, 9, _Q * cout, _NSLOT * cin),
                                         jnp.float32)
    else:
        out_spec = pl.BlockSpec((9, _Q * cout, _NSLOT * cin),
                                lambda bi, ui: (0, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((9, _Q * cout, _NSLOT * cin),
                                         jnp.float32)
    dw_taps = pl.pallas_call(
        partial(_p1_dw_kernel, usize=usize, batched=batched),
        grid=(b, usize),
        in_specs=_x_in_specs(cin, h, wd, dsz) + [g_spec],
        out_specs=out_spec,
        out_shape=out_shape,
        compiler_params=_CPARAMS,
        interpret=interpret,
    )(*([x] * _NSLOT), g)
    return _dw_untap(dw_taps, cout, cin)


def p1_supported(x_shape, cout: int) -> bool:
    """Shape gate for the p1 family: W = one 128-lane tile, D % 4 == 0,
    channel budget inside the VMEM plan (callers channel-chunk wider
    convs, conv being linear in Cin)."""
    if len(x_shape) != 5:
        return False
    b, c, d, h, wd = x_shape
    return (wd == 128 and d % _Q == 0 and d >= _Q and h >= 8
            and c <= 32 and cout <= 32 and b * d >= 4)


@jax.custom_vjp
def pallas_conv3d_p1(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Stride-1 SAME k=3 conv (D-phase-stacked), AD-complete."""
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
