"""Pallas TPU kernel for the stride-2 encoder downsample at the U-Net's
full-resolution boundary (128^3 -> 64^3, the level-transition convs of
`attn_unet_data_parallel.py:310-346` / MONAI ConvBlock(strides=2)).

Why: XLA's TPU conv path relayouts small-channel NCDHW activations into
feature-minor tilings padded up to 128x; the measured stride-2 conv
(32ch 128^3 -> 64ch 64^3) costs 7-14 ms against a ~1 ms roofline
(ROUND_NOTES r1).

Design (constraints measured on this chip):

  * strided LANE slices are unsupported in Mosaic -> taps accumulate at full
    128-lane width (the proven conv3d.py shift+dot pattern) and lanes are
    decimated at the very end with ONE selection matmul per output slice
    (0/1 matrix through the MXU at HIGHEST precision: exact on the f32
    accumulator);
  * strided SUBLANE slices of computed values lower to an unsupported 3D
    gather, but a reshape-split compiles for f32 -> H decimation is a
    reshape-split on the f32 accumulator (exact, no round trip);
  * the kernel pays 2x H and 2x W tap redundancy for Mosaic-friendliness —
    still far under the 7-14x XLA layout penalty.

Layout contract at the 64^3 level: activations are PACKED — two consecutive
D-slices side by side on lanes, [B, C, D, H, 64] <-> [B, C, D/2, H, 128]
(`conv3d_packed.py`). The stride-2 kernel EMITS packed output directly, so
the whole 64^3 level runs 128-lane with no pack transpose after it.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from coma_unet_tpu.ops.pallas.conv3d import _shift_hw

# Mosaic stack-allocates the unrolled tap temporaries; the default 16 MB
# scoped-vmem limit rejects the production-size kernels even though v5e has
# 128 MB of physical VMEM. Raise the cap; the pipeline buffers still fit.
_CPARAMS = pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)


def pack_w(x: jnp.ndarray) -> jnp.ndarray:
    """[B, C, D, H, W] -> [B, C, D/2, H, 2W]: D-pairs side by side on lanes."""
    b, c, d, h, w = x.shape
    return (
        x.reshape(b, c, d // 2, 2, h, w)
        .transpose(0, 1, 2, 4, 3, 5)
        .reshape(b, c, d // 2, h, 2 * w)
    )


def unpack_w(x: jnp.ndarray) -> jnp.ndarray:
    """[B, C, D/2, H, 2W] -> [B, C, D, H, W] (inverse of pack_w)."""
    b, c, d2, h, w2 = x.shape
    w = w2 // 2
    return (
        x.reshape(b, c, d2, h, 2, w)
        .transpose(0, 1, 2, 4, 3, 5)
        .reshape(b, c, 2 * d2, h, w)
    )


def _sel_even(w: int) -> np.ndarray:
    """[W, W/2] 0/1 matrix: out[w_out] = in[2*w_out]."""
    s = np.zeros((w, w // 2), np.float32)
    s[np.arange(0, w, 2), np.arange(w // 2)] = 1.0
    return s


# ---------------------------------------------------------------------------
# stride-2 forward: [B, Cin, D, H, W] -> packed [B, Cout, D/4, H/2, W]
# (output spatial D/2 x H/2 x W/2, D-pairs packed on lanes)
# ---------------------------------------------------------------------------


def _s2_kernel(x0_ref, x1_ref, x2_ref, x3_ref, x4_ref, w_ref, sel_ref,
               o_ref):
    """Grid (B, P): output packed slab p holds output D-slices (2p, 2p+1);
    input D-slices 4p-1 .. 4p+3 arrive as five slab refs.

    The three kd-slabs are CONCATENATED along channels so each (kh, kw) tap
    is one dot with contraction dim 3*Cin — e.g. 96 for the flagship's
    32-channel encoder transition, 3x the MXU utilization of per-kd dots."""
    p = pl.program_id(1)
    slab_refs = (x0_ref, x1_ref, x2_ref, x3_ref, x4_ref)
    sel = sel_ref[...]  # [W, W/2] f32

    halves = []
    for o in (0, 1):  # output D-slice 2p + o, input center 4p + 2o
        slabs = []
        for kd in (-1, 0, 1):
            slab = slab_refs[2 * o + kd + 1][...]  # D-slice 4p + 2o + kd
            if 2 * o + kd + 1 == 0:  # only the leading halo can fall off
                slab = jnp.where(p > 0, slab, 0.0)
            slabs.append(slab)
        cat = jnp.concatenate(slabs, axis=0)  # [3*Cin, H, W]
        acc = None
        for kh in (-1, 0, 1):
            for kw in (-1, 0, 1):
                # stride-1 tap at FULL resolution (proven bf16 pattern);
                # the decimations below discard the odd rows/lanes
                s = _shift_hw(cat, kh, kw)
                tap = (kh + 1) * 3 + (kw + 1)
                wk = w_ref[tap].astype(s.dtype)  # [Cout, 3*Cin]
                # HIGHEST only matters for f32 test inputs (the MXU's
                # default pass is bf16); production data is bf16.
                prec = (jax.lax.Precision.HIGHEST
                        if s.dtype == jnp.float32 else None)
                d = jax.lax.dot_general(
                    wk, s, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec,
                )  # [Cout, H, W] f32
                acc = d if acc is None else acc + d
        # H decimation: reshape-split on the f32 accumulator (strided sublane
        # slices of computed values don't lower; the f32 reshape-split does)
        c, h, wd = acc.shape
        hd = acc.reshape(c, h // 2, 2, wd)[:, :, 0, :]  # rows 2*h_out
        # W decimation: out[w_out] = hd[2*w_out] via an exact 0/1 matmul
        halves.append(
            jax.lax.dot_general(
                hd, sel, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # [Cout, H/2, W/2]
        )
    o_ref[...] = jnp.concatenate(halves, axis=2).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def _s2_fwd_v1(x: jnp.ndarray, w: jnp.ndarray,
               interpret: bool = False) -> jnp.ndarray:
    """k=3 stride-2 SAME conv; returns PACKED output
    [B, Cout, D/4, H/2, W]."""
    b, cin, dsz, h, wd = x.shape
    batched = w.ndim == 6
    cout = w.shape[1] if batched else w.shape[0]
    assert dsz % 4 == 0 and h % 2 == 0 and wd % 2 == 0
    # [(B,) 9, Cout, 3*Cin]: (kh, kw)-indexed taps, kd stacked along the
    # contraction axis in concat(kd=-1, 0, +1) order; a leading B dim means
    # PER-SAMPLE kernels (CondConv) — same single pallas instance.
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
    sel = jnp.asarray(_sel_even(wd))
    p_count = dsz // 4  # packed output slabs

    def idx(off):
        def f(bi, pi):
            return (bi, 0, jnp.clip(4 * pi + off, 0, dsz - 1), 0, 0)

        return f

    spec = lambda off: pl.BlockSpec(  # noqa: E731
        (None, cin, None, h, wd), idx(off), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _s2_kernel,
        grid=(b, p_count),
        in_specs=[
            spec(-1), spec(0), spec(1), spec(2), spec(3),
            w_spec,
            pl.BlockSpec((wd, wd // 2), lambda bi, pi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, cout, None, h // 2, wd), lambda bi, pi: (bi, 0, pi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, cout, p_count, h // 2, wd), x.dtype
        ),
        compiler_params=_CPARAMS,
        interpret=interpret,
    )(x, x, x, x, x, w_taps, sel)


# ---------------------------------------------------------------------------
# stride-2 forward, PHASE-SPLIT (v2): the v1 kernel computes every tap at
# full H x W resolution and decimates afterwards — 4x redundant MXU work and
# shift bytes. v2 splits the INPUT by H/W parity in XLA (cheap strided
# slices, fused into the producer) into two half-height tensors whose lanes
# hold [even-w pixels | odd-w pixels]; each of the 9 (t_h, t_w) taps then
# picks the right parity piece per lane half of the PACKED output pair
# (d' = 2p from D-slices 4p+t_d-1, d' = 2p+1 from 4p+t_d+1), so every dot is
# quarter-area at FULL 128-lane width and the packed output slab assembles
# directly — no H reshape-split, no W selection matmul, no decimation at
# all. Total MXU work == the conv's minimal FLOPs.
# ---------------------------------------------------------------------------


def _phase_split_xla(x: jnp.ndarray):
    """[B, C, D, H, W] -> (P0, P1), each [B, C, D, H/2, W]:
    P[hp][..., h', :] = row 2h'+hp of x with W-parity grouped on lanes —
    lanes [0, W/2) = even-w pixels, lanes [W/2, W) = odd-w pixels."""
    return tuple(
        jnp.concatenate(
            [x[:, :, :, hp::2, 0::2], x[:, :, :, hp::2, 1::2]], axis=-1
        )
        for hp in (0, 1)
    )


def _phase_split(x: jnp.ndarray, interpret: bool = False):
    """`_phase_split_xla` via the Pallas streaming prepass on the chip:
    every XLA formulation of the parity rearrangement (strided slice,
    reshape+index, one-hot einsum) measures 5-8 ms at bf16[2,32,128^3] —
    ~10x off the memory roofline and ~90% of the s2-v2 kernel's whole
    budget (artifacts/r3/{anatomy,split}_probe.log). The prepass streams
    slab-wise: f32 sublane reshape-split for H parity + an exact one-hot
    MXU matmul for the W-parity lane grouping (phase_split.py)."""
    from coma_unet_tpu.ops.pallas.phase_split import pallas_hwsplit

    return pallas_hwsplit(x, interpret=interpret)


def _w_piece(slab: jnp.ndarray, tw: int) -> jnp.ndarray:
    """Tap t_w's W-parity half of a phase-split slab [C, H2, W]: returns
    [C, H2, W/2] holding in[2w' + tw - 1] at half-lane w'. Static contiguous
    lane slices only (Mosaic-safe at bf16)."""
    w2 = slab.shape[-1] // 2
    if tw == 1:  # in[2w']: even pixels
        return slab[..., :w2]
    if tw == 2:  # in[2w'+1]: odd pixels
        return slab[..., w2:]
    # tw == 0: in[2w'-1] = odd pixel (w'-1); zero at w' == 0 (SAME pad)
    return jnp.concatenate(
        [jnp.zeros_like(slab[..., :1]), slab[..., w2:-1]], axis=-1
    )


def _s2_kernel_v2(*refs):
    """Grid (B, P). refs: P0 at D-offsets (-1..3), P1 at (-1..3), w, out.
    Output slab p = packed pair (2p, 2p+1): lane half 0 needs input
    D-slices 4p+t_d-1 (slots 0..2), half 1 needs 4p+t_d+1 (slots 2..4)."""
    (p0m, p00, p01, p02, p03, p1m, p10, p11, p12, p13, w_ref,
     o_ref) = refs
    p = pl.program_id(1)
    hp_slots = ((p0m, p00, p01, p02, p03), (p1m, p10, p11, p12, p13))
    acc = None
    for th in (0, 1, 2):
        slots = hp_slots[0 if th == 1 else 1]
        for tw in (0, 1, 2):
            parts = []
            for td in (0, 1, 2):
                a = _w_piece(slots[td][...], tw)  # d' = 2p
                if td == 0:  # D-slice 4p-1 off the volume at p == 0
                    a = jnp.where(p > 0, a, 0.0)
                bb = _w_piece(slots[td + 2][...], tw)  # d' = 2p+1
                parts.append(jnp.concatenate([a, bb], axis=-1))
            cat = jnp.concatenate(parts, axis=0)  # [3*Cin, H2, W]
            if th == 0:  # in[2h'-1] = odd row (h'-1); zero row at h' == 0
                cat = _shift_hw(cat, -1, 0)
            prec = (jax.lax.Precision.HIGHEST
                    if cat.dtype == jnp.float32 else None)
            d = jax.lax.dot_general(
                w_ref[th * 3 + tw].astype(cat.dtype), cat,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )  # [Cout, H2, W]
            acc = d if acc is None else acc + d
    o_ref[...] = acc.astype(o_ref.dtype)


def _phase_specs(cin: int, h2: int, wd: int, dsz: int):
    """The 10 phase-slab BlockSpecs shared by the v2 fwd and dw kernels:
    P[hp] fetched at D-offsets 4p + (-1..3), clipped at the volume edge."""

    def idx(off):
        def f(bi, pi):
            return (bi, 0, jnp.clip(4 * pi + off, 0, dsz - 1), 0, 0)

        return f

    return [
        pl.BlockSpec((None, cin, None, h2, wd), idx(off),
                     memory_space=pltpu.VMEM)
        for _hp in (0, 1) for off in (-1, 0, 1, 2, 3)
    ]


@partial(jax.jit, static_argnames=("interpret",))
def _s2_fwd_v2(x: jnp.ndarray, w: jnp.ndarray,
               interpret: bool = False) -> jnp.ndarray:
    """Phase-split k=3 stride-2 SAME conv; PACKED output
    [B, Cout, D/4, H/2, W] (same contract as `_s2_fwd_v1`)."""
    b, cin, dsz, h, wd = x.shape
    batched = w.ndim == 6
    cout = w.shape[1] if batched else w.shape[0]
    assert dsz % 4 == 0 and h % 2 == 0 and wd % 2 == 0
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
    p0, p1 = _phase_split(x, interpret=interpret)
    p_count = dsz // 4
    return pl.pallas_call(
        _s2_kernel_v2,
        grid=(b, p_count),
        in_specs=_phase_specs(cin, h // 2, wd, dsz) + [w_spec],
        out_specs=pl.BlockSpec(
            (None, cout, None, h // 2, wd), lambda bi, pi: (bi, 0, pi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, cout, p_count, h // 2, wd), x.dtype
        ),
        compiler_params=_CPARAMS,
        interpret=interpret,
    )(*([p0] * 5 + [p1] * 5 + [w_taps]))


# ---------------------------------------------------------------------------
# stride-2 transposed: packed [B, Cin, D/2, H, 2W] -> [B, Cout, 2D, 2H, 2W]
# (the MONAI 'SAME' deconv: k=3, s=2, p=1, output_padding=1 —
#  `transposed_padding` in models/blocks.py, ref UpBlock
#  `attn_unet_data_parallel.py:120-131`)
# ---------------------------------------------------------------------------


def _scatter_half(w2: int, half: int) -> np.ndarray:
    """[2W, 2W] 0/1 matrix taking a packed slab's lane half `half` (a W-wide
    input D-slice) to even lanes of a 2W-wide W-dilated row: for even w',
    out[w'] = in[64*half + w'/2]."""
    w = w2 // 2
    s = np.zeros((w2, w2), np.float32)
    s[half * w + np.arange(w), np.arange(0, w2, 2)] = 1.0
    return s


def _t2_kernel(pa_ref, pb_ref, w_ref, s0_ref, s1_ref, o_ref, *, jsize: int):
    """Grid (B, J): output D-slices (2j, 2j+1) from input slices j and j+1
    (slice j lives in lane half j%2 of packed slab j//2).

    Inputs are dilated in W ONLY (scatter matmul onto even lanes); the H
    dimension is handled by PHASE: even output rows take the t_h=1 taps on
    rows i, odd rows take t_h=0 on rows i plus t_h=2 on rows i+1 — computed
    as two half-height accumulators that interleave at the end (f32
    reshape-merge). Halves the tap FLOPs and the shifted bytes vs running
    27 taps on an H-dilated operand, and keeps the Mosaic program small.
    Contributing t_d slabs (and the t_h variants of the odd phase) stack
    along channels so each t_w tap is ONE dot with contraction up to 4*Cin."""
    j = pl.program_id(1)
    pa = pa_ref[...]  # packed slab j//2       [Cin, H, 2W]
    pb = pb_ref[...]  # packed slab (j+1)//2   [Cin, H, 2W]
    s0 = s0_ref[...]  # scatter half 0 -> even lanes [2W, 2W]
    s1 = s1_ref[...]  # scatter half 1 -> even lanes

    def wdilate(slab, parity):
        # pick the slice's lane half and spread onto even lanes (one-hot
        # scatter: exact in the operand dtype; parity is traced — select
        # between both halves; HIGHEST only for f32 test data)
        sel = jnp.where(parity == 0, s0, s1).astype(slab.dtype)
        prec = (jax.lax.Precision.HIGHEST
                if slab.dtype == jnp.float32 else None)
        de = jax.lax.dot_general(
            slab, sel, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )  # [Cin, H, 2W] f32, odd lanes zero
        return de.astype(slab.dtype)

    dil_j = wdilate(pa, j % 2)
    dil_j1 = wdilate(pb, (j + 1) % 2)
    # out-of-volume top halo: slice j+1 doesn't exist for the last j
    dil_j1 = jnp.where(j < jsize - 1, dil_j1, 0.0)

    def wk_cat(pairs, dtype):
        # [Cout, sum(Cin)] tap-weight stack matching a channel-concatenated
        # operand; pairs = ((t_d, t_h), ...)
        return jnp.concatenate(
            [w_ref[(t_d * 3 + t_h) * 3 + t_w] for (t_d, t_h) in pairs],
            axis=1,
        ).astype(dtype)

    outs = []
    for r_d in (0, 1):  # output D-slice 2j + r_d
        # nonzero dilated-D taps: r_d=0 -> t_d=1 on slice j;
        # r_d=1 -> t_d=0 on slice j, t_d=2 on slice j+1
        if r_d == 0:
            cat = dil_j
            tds = (1,)
        else:
            cat = jnp.concatenate([dil_j, dil_j1], axis=0)
            tds = (0, 2)
        # odd-row phase operand: rows i and i+1 stacked along channels
        cat_o = jnp.concatenate([cat, _shift_hw(cat, 1, 0)], axis=0)
        acc_e = acc_o = None
        prec = (jax.lax.Precision.HIGHEST
                if cat.dtype == jnp.float32 else None)
        for t_w in (0, 1, 2):
            se = _shift_hw(cat, 0, t_w - 1)
            de = jax.lax.dot_general(
                wk_cat(tuple((t_d, 1) for t_d in tds), se.dtype), se,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )
            acc_e = de if acc_e is None else acc_e + de
            so = _shift_hw(cat_o, 0, t_w - 1)
            do = jax.lax.dot_general(
                wk_cat(tuple((t_d, 0) for t_d in tds)
                       + tuple((t_d, 2) for t_d in tds), so.dtype), so,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )
            acc_o = do if acc_o is None else acc_o + do
        # interleave rows (out[2i] = acc_e[i], out[2i+1] = acc_o[i]) via the
        # f32 reshape-merge (sublane reshapes only lower in f32)
        c, hh, ww = acc_e.shape
        merged = jnp.concatenate(
            [acc_e[:, :, None, :], acc_o[:, :, None, :]], axis=2
        ).reshape(c, 2 * hh, ww)
        outs.append(merged.astype(o_ref.dtype))
    o_ref[...] = jnp.stack(outs, axis=1)  # [Cout, 2, 2H, 2W]


@partial(jax.jit, static_argnames=("interpret",))
def _t2_fwd_v1(xp: jnp.ndarray, w: jnp.ndarray,
               interpret: bool = False) -> jnp.ndarray:
    """k=3 s=2 SAME transposed conv on PACKED input [B, Cin, P, H, 2W]
    (P packed slabs = 2P input D-slices, read from lane halves in-kernel).
    Returns full-resolution [B, Cout, 4P, 2H, 2W] = 2x upsampled NCDHW."""
    b, cin, p_cnt, h, w2 = xp.shape
    batched = w.ndim == 6
    cout = w.shape[1] if batched else w.shape[0]
    jsize = 2 * p_cnt  # input D-slices
    if batched:
        w_taps = jnp.transpose(
            w.reshape(b, cout, cin, -1), (0, 3, 1, 2)
        ).astype(jnp.float32)
        w_spec = pl.BlockSpec((None, 27, cout, cin),
                              lambda bi, ji: (bi, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    else:
        w_taps = jnp.transpose(w.reshape(cout, cin, -1), (2, 0, 1)).astype(
            jnp.float32
        )
        w_spec = pl.BlockSpec((27, cout, cin), lambda bi, ji: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    s0 = jnp.asarray(_scatter_half(w2, 0))
    s1 = jnp.asarray(_scatter_half(w2, 1))

    def idx(off):
        def f(bi, ji):
            return (bi, 0, jnp.clip((ji + off) // 2, 0, p_cnt - 1), 0, 0)

        return f

    spec = lambda off: pl.BlockSpec(  # noqa: E731
        (None, cin, None, h, w2), idx(off), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        partial(_t2_kernel, jsize=jsize),
        grid=(b, jsize),
        in_specs=[
            spec(0), spec(1),
            w_spec,
            pl.BlockSpec((w2, w2), lambda bi, ji: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w2, w2), lambda bi, ji: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, cout, 2, 2 * h, w2), lambda bi, ji: (bi, 0, ji, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, cout, 2 * jsize, 2 * h, w2), xp.dtype
        ),
        compiler_params=_CPARAMS,
        interpret=interpret,
    )(xp, xp, w_taps, s0, s1)


# ---------------------------------------------------------------------------
# shared weight-gradient kernel: correlation of a PACKED half-resolution
# tensor (dilated in-kernel) against a FULL-resolution tensor.
#
#   dw[t_d,t_h,t_w][a, b] = sum_j packed[a, j] * full[b, 2j + t - 1]   (per dim)
#
# s2:  packed = cotangent g [B,Cout,P,H/2,W],  full = input x [B,Cin,D,H,W]
# t2:  packed = input x     [B,Cin,P,H,2W],    full = cotangent g
#      (by substitution t' = 2 - t; caller transposes channels + flips taps)
# ---------------------------------------------------------------------------


def _dilate_half(slab: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """One packed lane-half -> a W+H zero-dilated full-res slice.

    slab [C, H2, W]; s = `_scatter_half` matrix picking the half and
    spreading onto even lanes. Returns [C, 2*H2, W] with odd rows/lanes 0.
    A one-hot scatter is exact in the operand dtype (each output sums
    exactly one input), so the matrix matches the slab dtype; HIGHEST only
    for f32 test data (Mosaic rejects mixed-dtype dots)."""
    prec = (jax.lax.Precision.HIGHEST
            if slab.dtype == jnp.float32 else None)
    de = jax.lax.dot_general(
        slab, s.astype(slab.dtype), (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )  # [C, H2, W] f32, odd lanes zero
    c, h2, w = de.shape
    dil = jnp.concatenate(
        [de[:, :, None, :], jnp.zeros((c, h2, 1, w), de.dtype)], axis=2
    ).reshape(c, 2 * h2, w)
    return dil.astype(slab.dtype)


def _dw_dil_kernel(x0_ref, x1_ref, x2_ref, g_ref, s0_ref, s1_ref, o_ref, *,
                   batched: bool = False):
    """Grid (B, P, 2): packed slice 2p + oo against its three full-res
    D-neighbors (refs at 4p + 2*oo + t_d - 1). o_ref [27, C_packed, C_full]
    accumulates across the whole grid (per batch item when `batched` — the
    per-sample CondConv weight grad). The slice loop lives in the GRID (not
    unrolled in-kernel) to keep the Mosaic program small enough to compile."""
    b = pl.program_id(0)
    p = pl.program_id(1)
    oo = pl.program_id(2)

    first = jnp.logical_and(p == 0, oo == 0)
    if not batched:
        first = jnp.logical_and(b == 0, first)

    @pl.when(first)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    slab_refs = (x0_ref, x1_ref, x2_ref)
    g = g_ref[...]  # [C_packed, H2, W] packed slab p
    sel = jnp.where(oo == 0, s0_ref[...], s1_ref[...])

    gdil = _dilate_half(g, sel)  # [C_packed, H, W]
    cp, hh, ww = gdil.shape
    ga = gdil.reshape(cp, hh * ww)
    for t_d in (0, 1, 2):
        # full-res D-slice 2*(2p+oo) + t_d - 1 = 4p + 2*oo + t_d - 1
        slab = slab_refs[t_d][...]  # [C_full, H, W]
        if t_d == 0:  # leading halo off the volume at p == oo == 0
            slab = jnp.where(jnp.logical_or(p > 0, oo > 0), slab, 0.0)
        for t_h in (0, 1, 2):
            for t_w in (0, 1, 2):
                s = _shift_hw(slab, t_h - 1, t_w - 1)
                cf = s.shape[0]
                tap = (t_d * 3 + t_h) * 3 + t_w
                o_ref[tap] += jax.lax.dot_general(
                    ga, s.reshape(cf, hh * ww),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )


@partial(jax.jit, static_argnames=("batched", "interpret"))
def _dw_dil_v1(full: jnp.ndarray, packed: jnp.ndarray, batched: bool = False,
               interpret: bool = False) -> jnp.ndarray:
    """Returns dw [27, C_packed, C_full], or per-sample
    [B, 27, C_packed, C_full] when `batched` (see block comment above)."""
    b, cf, dsz, h, wd = full.shape
    _, cp, p_cnt, h2, w2 = packed.shape
    assert dsz == 4 * p_cnt and h == 2 * h2 and wd == w2

    def idx(off):
        def f(bi, pi, oi):
            return (bi, 0, jnp.clip(4 * pi + 2 * oi + off, 0, dsz - 1), 0, 0)

        return f

    spec = lambda off: pl.BlockSpec(  # noqa: E731
        (None, cf, None, h, wd), idx(off), memory_space=pltpu.VMEM
    )
    s0 = jnp.asarray(_scatter_half(wd, 0))
    s1 = jnp.asarray(_scatter_half(wd, 1))
    if batched:
        out_spec = pl.BlockSpec((None, 27, cp, cf),
                                lambda bi, pi, oi: (bi, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((b, 27, cp, cf), jnp.float32)
    else:
        out_spec = pl.BlockSpec((27, cp, cf),
                                lambda bi, pi, oi: (0, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((27, cp, cf), jnp.float32)
    return pl.pallas_call(
        partial(_dw_dil_kernel, batched=batched),
        grid=(b, p_cnt, 2),
        in_specs=[
            spec(-1), spec(0), spec(1),
            pl.BlockSpec((None, cp, None, h2, w2),
                         lambda bi, pi, oi: (bi, 0, pi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wd, wd), lambda bi, pi, oi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wd, wd), lambda bi, pi, oi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        compiler_params=_CPARAMS,
        interpret=interpret,
    )(full, full, full, packed, s0, s1)




# ---------------------------------------------------------------------------
# transposed, PHASE-SPLIT (v2): the v1 kernel W-dilates via scatter matmuls
# and runs taps on dilated (half-zero) operands. v2 exploits the transposed
# conv's exact phase structure per dim — out[2m] = w[1]*in[m] and
# out[2m+1] = w[0]*in[m] + w[2]*in[m+1] (k=3, s=2, p=1, output_padding=1) —
# so each of the 8 output phase tensors is a small set of channel-stacked
# dots on UNDILATED full-lane-width operands: a packed slab [in_2q | in_2q+1]
# yields two output D-slices per lane half, half the grid steps of v1, zero
# scatter work, minimal FLOPs. The 8 phase outputs interleave back to the
# full-resolution volume in XLA (`_t2_phase_merge`, pure reshapes).
# ---------------------------------------------------------------------------


def _shift_w_halves(x: jnp.ndarray) -> jnp.ndarray:
    """s[..., u] = x[..., u+1] independently per 64-lane half (zero at each
    half's top) — a packed slab's lane halves are DIFFERENT D-slices, so a
    plain lane shift would leak across them."""
    w2 = x.shape[-1] // 2
    a, b = x[..., :w2], x[..., w2:]
    z = jnp.zeros_like(a[..., :1])
    sh = lambda t: jnp.concatenate([t[..., 1:], z], axis=-1)  # noqa: E731
    return jnp.concatenate([sh(a), sh(b)], axis=-1)


def _t2_kernel_v2(pa_ref, pb_ref, w_ref, *o_refs, psize: int):
    """Grid (B, Q): slab q = [in_2q | in_2q+1] -> output D-slices
    4q..4q+3 across 8 phase outputs (even-d x 4 HW-phases, odd-d x 4).
    o_refs order: E(0,0) E(0,1) E(1,0) E(1,1) O(0,0) ... O(1,1)."""
    q = pl.program_id(1)
    sa = pa_ref[...]  # [Cin, H, 2W]: lanes [in_2q | in_2q+1]
    nxt = pb_ref[...]  # slab q+1 (clipped)
    # sB = [in_2q+1 | in_2q+2]; the top slice is off the volume at the last q
    top = jnp.where(q < psize - 1, nxt[..., : nxt.shape[-1] // 2], 0.0)
    sb = jnp.concatenate([sa[..., sa.shape[-1] // 2:], top], axis=-1)

    def tapw(idx, dtype):  # w_ref [27, Cout, Cin], tap (td*3+th)*3+tw
        return w_ref[idx].astype(dtype)

    def phase(base_taps, hp, wp):
        """base_taps: ((base, td), ...); returns the phase's accumulated dot.
        Per dim: phase 0 -> tap 1 unshifted; phase 1 -> tap 0 unshifted +
        tap 2 shifted +1 (next input element)."""
        ths = (1,) if hp == 0 else (0, 2)
        tws = (1,) if wp == 0 else (0, 2)
        parts, wks = [], []
        for base, td in base_taps:
            for th in ths:
                for tw in tws:
                    s = base
                    if th == 2:
                        s = _shift_hw(s, 1, 0)
                    if tw == 2:
                        s = _shift_w_halves(s)
                    parts.append(s)
                    wks.append(tapw((td * 3 + th) * 3 + tw, s.dtype))
        cat = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
        wk = jnp.concatenate(wks, axis=1) if len(wks) > 1 else wks[0]
        prec = (jax.lax.Precision.HIGHEST
                if cat.dtype == jnp.float32 else None)
        return jax.lax.dot_general(
            wk, cat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

    i = 0
    for base_taps in (((sa, 1),), ((sa, 0), (sb, 2))):  # even-d, odd-d
        for hp in (0, 1):
            for wp in (0, 1):
                o_refs[i][...] = phase(base_taps, hp, wp).astype(
                    o_refs[i].dtype)
                i += 1


def _t2_phase_merge(phases, h: int, w: int):
    """8 phase tensors [B, Cout, Q, H, 2W] -> full-res
    [B, Cout, 4Q, 2H, 2W] (pure XLA reshapes/interleaves).
    phases ordered E(0,0) E(0,1) E(1,0) E(1,1) O(...)."""
    b, c, qn, _, _ = phases[0].shape
    quads = []
    for half in (0, 1):  # lane half = D-slice pair member
        for par in (0, 1):  # E, O
            hw = jnp.stack(
                [
                    jnp.stack(
                        [phases[par * 4 + hp * 2 + wp]
                         [..., half * w:(half + 1) * w]
                         for wp in (0, 1)],
                        axis=-1,
                    )  # [B,C,Q,H,w,2]
                    for hp in (0, 1)
                ],
                axis=-3,
            )  # [B,C,Q,H,2,w,2]
            quads.append(hw)
    # d_o = 4q + 2*half + par -> stack order (half, par) = (0,0),(0,1),(1,0),(1,1)
    r = jnp.stack(quads, axis=3)  # [B,C,Q,4,H,2,w,2]
    return r.reshape(b, c, 4 * qn, 2 * h, 2 * w)


@partial(jax.jit, static_argnames=("interpret",))
def _t2_fwd_v2(xp: jnp.ndarray, w: jnp.ndarray,
               interpret: bool = False) -> jnp.ndarray:
    """Phase-split k=3 s=2 SAME transposed conv; same contract as
    `_t2_fwd_v1`: packed [B, Cin, P, H, 2W] -> [B, Cout, 4P, 2H, 2W]."""
    b, cin, p_cnt, h, w2 = xp.shape
    batched = w.ndim == 6
    cout = w.shape[1] if batched else w.shape[0]
    if batched:
        w_taps = jnp.transpose(
            w.reshape(b, cout, cin, -1), (0, 3, 1, 2)
        ).astype(jnp.float32)
        w_spec = pl.BlockSpec((None, 27, cout, cin),
                              lambda bi, qi: (bi, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    else:
        w_taps = jnp.transpose(w.reshape(cout, cin, -1), (2, 0, 1)).astype(
            jnp.float32
        )
        w_spec = pl.BlockSpec((27, cout, cin), lambda bi, qi: (0, 0, 0),
                              memory_space=pltpu.VMEM)

    def idx(off):
        def f(bi, qi):
            return (bi, 0, jnp.clip(qi + off, 0, p_cnt - 1), 0, 0)

        return f

    spec = lambda off: pl.BlockSpec(  # noqa: E731
        (None, cin, None, h, w2), idx(off), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec((None, cout, None, h, w2),
                            lambda bi, qi: (bi, 0, qi, 0, 0),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((b, cout, p_cnt, h, w2), xp.dtype)
    phases = pl.pallas_call(
        partial(_t2_kernel_v2, psize=p_cnt),
        grid=(b, p_cnt),
        in_specs=[spec(0), spec(1), w_spec],
        out_specs=[out_spec] * 8,
        out_shape=[out_sds] * 8,
        compiler_params=_CPARAMS,
        interpret=interpret,
    )(xp, xp, w_taps)
    return _t2_phase_merge(phases, h, w2 // 2)


# ---------------------------------------------------------------------------
# weight-gradient, PHASE-SPLIT (v2): v1 dilates the packed tensor with zeros
# to full resolution (3/4-zero operands) and correlates 27 taps at full
# area. v2 phase-splits the FULL-resolution tensor instead (same `_phase_split`
# prologue and slab specs as the v2 forward) and contracts the packed slab
# [Cp, H2, W] directly against quarter-area phase operands — no dilation
# matmuls, no scatter matrices, minimal-FLOP dots, and half the grid steps
# (both lane halves of a packed slab contract in one dot).
# ---------------------------------------------------------------------------


def _dw_kernel_v2(*refs, batched: bool = False):
    """Grid (B, P). refs: P0 slots (-1..3), P1 slots (-1..3), g, out.
    o_ref [27, Cp, Cf] (leading B when `batched`) accumulates across the
    grid; dw[t][a, b] = sum g[a, pix] * phase_tap(full)[b, pix]."""
    (p0m, p00, p01, p02, p03, p1m, p10, p11, p12, p13, g_ref,
     o_ref) = refs
    b = pl.program_id(0)
    p = pl.program_id(1)
    first = p == 0
    if not batched:
        first = jnp.logical_and(b == 0, first)

    @pl.when(first)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    hp_slots = ((p0m, p00, p01, p02, p03), (p1m, p10, p11, p12, p13))
    g = g_ref[...]  # [Cp, H2, W] packed slab p (lane half 0 = slice 2p)
    cp, h2, w = g.shape
    ga = g.reshape(cp, h2 * w)
    for th in (0, 1, 2):
        slots = hp_slots[0 if th == 1 else 1]
        for td in (0, 1, 2):
            a_raw = slots[td][...]
            if td == 0:
                a_raw = jnp.where(p > 0, a_raw, 0.0)
            b_raw = slots[td + 2][...]
            for tw in (0, 1, 2):
                opnd = jnp.concatenate(
                    [_w_piece(a_raw, tw), _w_piece(b_raw, tw)], axis=-1
                )  # [Cf, H2, W]
                if th == 0:
                    opnd = _shift_hw(opnd, -1, 0)
                cf = opnd.shape[0]
                tap = (td * 3 + th) * 3 + tw
                o_ref[tap] += jax.lax.dot_general(
                    ga, opnd.reshape(cf, h2 * w),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )


@partial(jax.jit, static_argnames=("batched", "interpret"))
def _dw_v2(full: jnp.ndarray, packed: jnp.ndarray, batched: bool = False,
           interpret: bool = False) -> jnp.ndarray:
    """Phase-split weight gradient; same contract as `_dw_dil_v1`:
    [27, C_packed, C_full] (leading B when `batched`)."""
    b, cf, dsz, h, wd = full.shape
    _, cp, p_cnt, h2, w2 = packed.shape
    assert dsz == 4 * p_cnt and h == 2 * h2 and wd == w2
    p0, p1 = _phase_split(full, interpret=interpret)
    if batched:
        out_spec = pl.BlockSpec((None, 27, cp, cf),
                                lambda bi, pi: (bi, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((b, 27, cp, cf), jnp.float32)
    else:
        out_spec = pl.BlockSpec((27, cp, cf), lambda bi, pi: (0, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((27, cp, cf), jnp.float32)
    return pl.pallas_call(
        partial(_dw_kernel_v2, batched=batched),
        grid=(b, p_cnt),
        in_specs=_phase_specs(cf, h2, wd, dsz) + [
            pl.BlockSpec((None, cp, None, h2, w2),
                         lambda bi, pi: (bi, 0, pi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        compiler_params=_CPARAMS,
        interpret=interpret,
    )(*([p0] * 5 + [p1] * 5 + [packed]))


def _phase_on() -> bool:
    """Trace-time selector for the phase-split (v2) s2/dw kernels; default
    ON. Hardware A/B (v5e, flagship shapes, artifacts/r3/kernel_probe.log):
    s2 fwd 7.71 ms (v2) vs 8.93 (v1) vs 12.21 (XLA); dw 8.26 vs 12.93 —
    and the v2 Mosaic programs compile in 14-20 s vs v1's 480-630 s through
    the remote helper (far smaller programs: no scatter/selection matmuls,
    quarter-area taps). COMA_S2_PHASE=0 restores v1."""
    import os

    return os.environ.get("COMA_S2_PHASE", "1") != "0"


def _s2_fwd(x: jnp.ndarray, w: jnp.ndarray,
            interpret: bool = False) -> jnp.ndarray:
    """k=3 stride-2 SAME conv -> PACKED [B, Cout, D/4, H/2, W]."""
    fn = _s2_fwd_v2 if _phase_on() else _s2_fwd_v1
    return fn(x, w, interpret=interpret)


def _t2_fwd(xp: jnp.ndarray, w: jnp.ndarray,
            interpret: bool = False) -> jnp.ndarray:
    """k=3 s=2 SAME transposed conv, packed in -> full-res out.

    v1 by DEFAULT — a measured decision, opposite to s2/dw: hardware A/B
    (v5e, up0 shapes, artifacts/r3/kernel_probe_t2.log) puts v2 at 15.82 ms
    vs v1's 6.19 ms. The transposed conv's output is FULL-resolution, so
    v2's 8 phase tensors must interleave back through an XLA epilogue
    (~10 ms of lane-level shuffles on the 268 MB output), while v1's
    scatter-dilate emits the final layout straight from the kernel. s2/dw
    win with phases because their outputs are the SMALL side (packed /
    [27,Co,Ci]) — no merge cost. COMA_T2_PHASE=1 selects v2 (kept for its
    3x smaller Mosaic program, compile-budget experiments)."""
    import os

    fn = (_t2_fwd_v2 if os.environ.get("COMA_T2_PHASE", "0") == "1"
          else _t2_fwd_v1)
    return fn(xp, w, interpret=interpret)


def _dw_dil(full: jnp.ndarray, packed: jnp.ndarray, batched: bool = False,
            interpret: bool = False) -> jnp.ndarray:
    """dw [27, C_packed, C_full] (leading B when `batched`)."""
    fn = _dw_v2 if _phase_on() else _dw_dil_v1
    return fn(full, packed, batched=batched, interpret=interpret)


def _disabled() -> set:
    """COMA_PALLAS_DISABLE families: lets a VJP swap its cross-kernel
    (s2<->t2) dx for the XLA fallback so a disabled family contributes NO
    Mosaic program anywhere. Single shared parser (conv3d.py) so dispatch
    and VJP substitution can never disagree."""
    from coma_unet_tpu.ops.pallas.conv3d import pallas_disabled_families

    return pallas_disabled_families()


def _xla_t2_fallback(gp: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """XLA lhs-dilated conv on the unpacked cotangent (dx of the stride-2
    conv when the t2 kernel family is disabled). w may be per-sample."""
    g = unpack_w(gp)
    pad = [(1, 2)] * 3

    def one(gi, wi):
        return jax.lax.conv_general_dilated(
            gi, wi, (1, 1, 1), pad, lhs_dilation=(2, 2, 2),
            dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
        )

    if w.ndim == 6:
        return jnp.concatenate(
            [one(g[i:i + 1], w[i]) for i in range(g.shape[0])]
        )
    return one(g, w)


def _xla_s2_fallback(g: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Packed-output XLA stride-2 conv (dx of the transposed conv when the
    s2 kernel family is disabled). w may be per-sample."""

    def one(gi, wi):
        return jax.lax.conv_general_dilated(
            gi, wi, (2, 2, 2), [(1, 1)] * 3,
            dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
        )

    if w.ndim == 6:
        y = jnp.concatenate(
            [one(g[i:i + 1], w[i]) for i in range(g.shape[0])]
        )
    else:
        y = one(g, w)
    return pack_w(y)


def _flip_t(w: jnp.ndarray) -> jnp.ndarray:
    """[Cout, Cin, 3,3,3] -> spatially flipped, io-swapped [Cin, Cout, 3,3,3]."""
    return jnp.flip(w, axis=(2, 3, 4)).transpose(1, 0, 2, 3, 4)


# ---------------------------------------------------------------------------
# public ops with custom VJPs (the strided pair is AD-closed: each one's
# dx is the other forward with the flipped/io-swapped kernel)
# ---------------------------------------------------------------------------


@jax.custom_vjp
def pallas_conv3d_s2(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """k=3 stride-2 SAME conv [B,Cin,D,H,W] -> PACKED [B,Cout,D/4,H/2,W]."""
    return _s2_fwd(x, w)


def _s2_vjp_fwd(x, w):
    return _s2_fwd(x, w), (x, w)


def _s2_vjp_bwd(res, g):
    x, w = res
    g = g.astype(x.dtype)
    w_t = _flip_t(w).astype(w.dtype)
    # wide (lane-padded template-space) cotangents: the t2 kernel's wide
    # Mosaic program is the compile-helper crash class (g216 probe) — take
    # the XLA lhs-dilated fallback for dx there; dw's phase-split program
    # stays small at any width.
    wide = g.shape[-1] > 128
    dx = (_xla_t2_fallback(g, w_t) if wide or "t2" in _disabled()
          else _t2_fwd(g, w_t))
    dw = _dw_dil(x, g)  # [27, Cout, Cin]
    cout, cin = w.shape[0], w.shape[1]
    dw = jnp.transpose(dw, (1, 2, 0)).reshape(cout, cin, 3, 3, 3)
    return dx.astype(x.dtype), dw.astype(w.dtype)


pallas_conv3d_s2.defvjp(_s2_vjp_fwd, _s2_vjp_bwd)


@jax.custom_vjp
def pallas_conv3d_t2(xp: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """k=3 s=2 SAME transposed conv, PACKED [B,Cin,P,H,2W] ->
    [B,Cout,4P,2H,2W]."""
    return _t2_fwd(xp, w)


def _t2_vjp_fwd(xp, w):
    return _t2_fwd(xp, w), (xp, w)


def _t2_vjp_bwd(res, g):
    xp, w = res
    g = g.astype(xp.dtype)
    w_t = _flip_t(w).astype(w.dtype)
    dxp = (_xla_s2_fallback(g, w_t) if "s2" in _disabled()
           else _s2_fwd(g, w_t))
    dw = _dw_dil(g, xp)  # [27, Cin, Cout] with flipped taps (t' = 2 - t)
    cout, cin = w.shape[0], w.shape[1]
    dw = jnp.transpose(dw, (2, 1, 0)).reshape(cout, cin, 3, 3, 3)
    dw = jnp.flip(dw, axis=(2, 3, 4))
    return dxp.astype(xp.dtype), dw.astype(w.dtype)


pallas_conv3d_t2.defvjp(_t2_vjp_fwd, _t2_vjp_bwd)


def _flip_t_b(w: jnp.ndarray) -> jnp.ndarray:
    """Per-sample flip/io-swap: [B, Cout, Cin, 3,3,3] -> [B, Cin, Cout, ...]."""
    return jnp.flip(w, axis=(3, 4, 5)).transpose(0, 2, 1, 3, 4, 5)


@jax.custom_vjp
def pallas_conv3d_s2_b(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """`pallas_conv3d_s2` with PER-SAMPLE kernels w [B, Cout, Cin, 3, 3, 3]
    (CondConv expert mixture) — one pallas instance for the whole batch."""
    return _s2_fwd(x, w)


def _s2_b_vjp_fwd(x, w):
    return _s2_fwd(x, w), (x, w)


def _s2_b_vjp_bwd(res, g):
    x, w = res
    g = g.astype(x.dtype)
    w_t = _flip_t_b(w).astype(w.dtype)
    wide = g.shape[-1] > 128  # see _s2_vjp_bwd
    dx = (_xla_t2_fallback(g, w_t) if wide or "t2" in _disabled()
          else _t2_fwd(g, w_t))
    dw = _dw_dil(x, g, batched=True)  # [B, 27, Cout, Cin]
    b, cout, cin = w.shape[0], w.shape[1], w.shape[2]
    dw = jnp.transpose(dw, (0, 2, 3, 1)).reshape(b, cout, cin, 3, 3, 3)
    return dx.astype(x.dtype), dw.astype(w.dtype)


pallas_conv3d_s2_b.defvjp(_s2_b_vjp_fwd, _s2_b_vjp_bwd)


@jax.custom_vjp
def pallas_conv3d_t2_b(xp: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """`pallas_conv3d_t2` with PER-SAMPLE kernels w [B, Cout, Cin, 3, 3, 3]."""
    return _t2_fwd(xp, w)


def _t2_b_vjp_fwd(xp, w):
    return _t2_fwd(xp, w), (xp, w)


def _t2_b_vjp_bwd(res, g):
    xp, w = res
    g = g.astype(xp.dtype)
    w_t = _flip_t_b(w).astype(w.dtype)
    dxp = (_xla_s2_fallback(g, w_t) if "s2" in _disabled()
           else _s2_fwd(g, w_t))
    dw = _dw_dil(g, xp, batched=True)  # [B, 27, Cin, Cout], flipped taps
    b, cout, cin = w.shape[0], w.shape[1], w.shape[2]
    dw = jnp.transpose(dw, (0, 3, 2, 1)).reshape(b, cout, cin, 3, 3, 3)
    dw = jnp.flip(dw, axis=(3, 4, 5))
    return dxp.astype(xp.dtype), dw.astype(w.dtype)


pallas_conv3d_t2_b.defvjp(_t2_b_vjp_fwd, _t2_b_vjp_bwd)
