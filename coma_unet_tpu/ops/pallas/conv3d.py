"""Pallas TPU kernel: direct 3D convolution for small channel counts.

Why: XLA's TPU convolution relayouts small-channel NCDHW activations into
batch/feature-minor tilings that pad up to 128x — one 16-channel 128^3 conv
measures ~44 ms when its roofline (bandwidth + MXU) is ~1 ms. This kernel
keeps the native [C, H, W] layout (W on lanes, H on sublanes), builds the 27
kernel taps as in-VMEM rolls with edge masking, and contracts channels on the
MXU per tap:

    y[b, :, d] = sum_{kd,kh,kw} W[:, :, kd, kh, kw] @ roll(x[b, :, d+kd-1],
                                                           (kh-1, kw-1))

Grid: (B, D). The same D-slab is fetched as the (d-1, d, d+1) halo of three
neighboring steps (3x read amplification ~= 1 ms at HBM bandwidth — cheap
next to the 40x XLA penalty). Supports kernel 3 and 1, stride 1, SAME.

Used for stride-1 convs at >= 64^2 in-plane resolution with <= 32 channels
(the U-Net top level, attention gates, and the modulator stacks — 60%+ of
the flagship's forward time under XLA). Backward runs through a custom VJP:
dx is this same kernel with the transposed+flipped kernel; dw falls back to
an XLA reduce (tiny output).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Mosaic stack-allocates the unrolled tap temporaries; with the kd-stacked
# contraction the 32-channel 128^2 slabs exceed the 16 MB default scoped-vmem
# cap (v5e has 128 MB physical VMEM).
_CPARAMS = pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)


def _shift_hw(x: jnp.ndarray, dh: int, dw: int) -> jnp.ndarray:
    """Shift [C, H, W] so out[h, w] = in[h+dh, w+dw], zero fill.

    Static slice + concat (not rotate): Mosaic's tpu.dynamic_rotate has no
    16-bit path, while static lane/sublane shifts work at bf16 — which keeps
    every slab bf16 until the MXU contraction and halves kernel VMEM."""
    c, h, w = x.shape
    if dh > 0:
        x = jnp.concatenate(
            [x[:, dh:], jnp.zeros((c, dh, w), x.dtype)], axis=1
        )
    elif dh < 0:
        x = jnp.concatenate(
            [jnp.zeros((c, -dh, w), x.dtype), x[:, :dh]], axis=1
        )
    if dw > 0:
        x = jnp.concatenate(
            [x[:, :, dw:], jnp.zeros((c, h, dw), x.dtype)], axis=2
        )
    elif dw < 0:
        x = jnp.concatenate(
            [jnp.zeros((c, h, -dw), x.dtype), x[:, :, :dw]], axis=2
        )
    return x


def _conv_kernel(*refs, k: int, dsize: int):
    """The kd-slabs are CONCATENATED along channels so each (kh, kw) tap is
    one dot with contraction dim k*Cin — 3x the MXU utilization of per-kd
    dots for the model's 16-32 channel convs.

    k == 3 refs: (xm, x0, xp, w, o); k == 1 refs: (x0, w, o) — pointwise
    convs fetch ONE slab per grid step, not a dead 3-slab halo (3x HBM
    traffic + VMEM on every k=1 gate/projection conv otherwise)."""
    d = pl.program_id(1)
    if k == 3:
        xm_ref, x0_ref, xp_ref, w_ref, o_ref = refs
        slabs = []
        for kd, slab_ref in enumerate((xm_ref, x0_ref, xp_ref)):
            slab = slab_ref[...]  # [Cin, H, W], stays bf16 until the dot
            # zero the out-of-volume D halos
            if kd == 0:
                slab = jnp.where(d > 0, slab, 0.0)
            if kd == 2:
                slab = jnp.where(d < dsize - 1, slab, 0.0)
            slabs.append(slab)
        cat = jnp.concatenate(slabs, axis=0)  # [3*Cin, H, W]
    else:
        x0_ref, w_ref, o_ref = refs
        cat = x0_ref[...]
    acc = jnp.zeros(o_ref.shape, dtype=jnp.float32)  # [Cout, H, W]
    taps = range(-1, 2) if k == 3 else (0,)
    for kh in taps:
        for kw in taps:
            s = _shift_hw(cat, kh, kw)
            tap = (kh + k // 2) * k + (kw + k // 2)
            wk = w_ref[tap].astype(s.dtype)  # [Cout, k*Cin]
            # [Cout, k*Cin] x [k*Cin, H, W] -> [Cout, H, W] on the MXU
            acc += jax.lax.dot_general(
                wk, s, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    o_ref[...] = acc.astype(o_ref.dtype)


def _k1_dtile(dsz: int, cin: int, cout: int, h: int, w: int) -> int:
    """Pointwise-kernel D-slices per grid step ((B, D) grids are
    launch-overhead-bound at 128^3), capped so double-buffered blocks
    fit VMEM: 68 MB keeps the chip-proven dt=16 at 128^3 (identical
    HLO); wide 216 slabs get dt<=4 (dt=8 crashed the helper, r5)."""
    per = (cin + cout) * h * w * 4  # slice bytes incl. double-buffer
    for t in (16, 8, 4, 2, 1):
        if dsz % t == 0 and (t == 1 or t * per <= 68 << 20):
            return t
    return 1


def _conv_k1_kernel(x_ref, w_ref, o_ref, *, dtile: int):
    """Pointwise conv on a [Cin, DT, H, W] block: DT dots (one per
    D-slice), each [Cout, Cin] x [Cin, H, W] on the MXU."""
    wk = w_ref[0]  # [Cout, Cin]
    for j in range(dtile):
        x = x_ref[:, j]  # [Cin, H, W]
        o_ref[:, j] = jax.lax.dot_general(
            wk.astype(x.dtype), x, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


_HTILE = 32  # rows per H tile in the wide-slab kernels (bf16 tile-aligned)


def _conv_kernel_htiled(*refs, k: int, dsize: int, nh: int):
    """Wide-slab (W > 128 lanes, e.g. template-space 216^3) variant of
    `_conv_kernel` with H tiled into `_HTILE`-row blocks: the full-H wide
    Mosaic programs are what OOM-kill the remote compile helper in the
    216^3 TRAIN segments (r3 probe_216_train_*: even a handful of
    [C, 216, 256] fwd/dx/dw programs SIGKILL it, while the XLA fallback
    OOMs HBM at 25.5 G — so tiling is what makes 216^3 training possible
    at all). Each kd slab is fetched as (top halo row, TH-row tile, bottom
    halo row) — 1-row halos keep read amplification at ~3.1x — and kh taps
    read static row windows of the concatenated [TH+2]-row buffer.

    refs: 3 x (top, main, bot) for kd in (-1, 0, +1), then (w, o). Halo refs
    are 8-row blocks (Mosaic requires sublane block dims divisible by 8): the
    top halo is row 7 of the 8-row block ENDING at the tile's first row, the
    bottom halo row 0 of the block starting one past its last row."""
    d = pl.program_id(1)
    hi = pl.program_id(2)
    slabs = []
    for kd in range(3):
        top_r, main_r, bot_r = refs[3 * kd:3 * kd + 3]
        top = jnp.where(hi > 0, top_r[:, 7:8, :], 0.0)
        bot = jnp.where(hi < nh - 1, bot_r[:, 0:1, :], 0.0)
        buf = jnp.concatenate([top, main_r[...], bot], axis=1)
        # zero the out-of-volume D halos
        if kd == 0:
            buf = jnp.where(d > 0, buf, 0.0)
        if kd == 2:
            buf = jnp.where(d < dsize - 1, buf, 0.0)
        slabs.append(buf)
    w_ref, o_ref = refs[9], refs[10]
    cat = jnp.concatenate(slabs, axis=0)  # [3*Cin, TH+2, W]
    th = o_ref.shape[1]
    acc = jnp.zeros(o_ref.shape, dtype=jnp.float32)  # [Cout, TH, W]
    # lane (W) shift FIRST, on the offset-0 buffer, THEN the kh row-window
    # slice: Mosaic's tpu.concatenate rejects operands that already carry a
    # sublane offset (internal error on vector layouts like vpad<16,{1,1}>),
    # so the order is load-bearing — and it's also 3 lane shifts instead of 9
    for kw in (-1, 0, 1):
        sw = _shift_hw(cat, 0, kw)
        for kh in (-1, 0, 1):
            # out row r (global hi*TH + r) reads in row global+kh =
            # buf[r+1+kh]; realized as the proven shift-and-zero-fill
            # (offset-0 concat output) + a LEADING slice, because downstream
            # ops reject sublane-offset operands (the zero fill lands in
            # rows >= TH+2-dh > TH-1, outside the window)
            s = _shift_hw(sw, 1 + kh, 0)[:, :th, :]
            tap = (kh + 1) * k + (kw + 1)
            wk = w_ref[tap].astype(s.dtype)  # [Cout, 3*Cin]
            acc += jax.lax.dot_general(
                wk, s, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    o_ref[...] = acc.astype(o_ref.dtype)


def _pallas_conv3d_fwd_htiled(x: jnp.ndarray, w: jnp.ndarray,
                              interpret: bool = False) -> jnp.ndarray:
    """k=3 wide-H path: pad H to a multiple of `_HTILE` (exact for SAME —
    pad rows are zero, outputs in the pad region are cropped, and the last
    true row's kh=+1 tap reads the first pad row, which IS the SAME-pad
    zero) and run the H-tiled kernel."""
    b, cin, dsz, h, wd = x.shape
    k = 3
    batched = w.ndim == 6
    cout = w.shape[1] if batched else w.shape[0]
    hp = -(-h // _HTILE) * _HTILE
    if hp != h:
        x = jnp.pad(x, [(0, 0), (0, 0), (0, 0), (0, hp - h), (0, 0)])
    nh = hp // _HTILE
    if batched:
        w_taps = jnp.transpose(w, (0, 4, 5, 1, 3, 2)).reshape(
            b, k * k, cout, k * cin
        ).astype(jnp.float32)
        w_spec = pl.BlockSpec((None, k * k, cout, k * cin),
                              lambda bi, di, hi: (bi, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    else:
        w_taps = jnp.transpose(w, (3, 4, 0, 2, 1)).reshape(
            k * k, cout, k * cin
        ).astype(jnp.float32)
        w_spec = pl.BlockSpec((k * k, cout, k * cin),
                              lambda bi, di, hi: (0, 0, 0),
                              memory_space=pltpu.VMEM)

    def main_spec(off):
        return pl.BlockSpec(
            (None, cin, None, _HTILE, wd),
            lambda bi, di, hi, o=off: (bi, 0, jnp.clip(di + o, 0, dsz - 1),
                                       hi, 0),
            memory_space=pltpu.VMEM,
        )

    def halo_spec(off, blk_off):
        # 8-row halo blocks (Mosaic: sublane block dims % 8 == 0); the kernel
        # statically extracts the single halo row from the fetched block.
        nb8 = hp // 8
        return pl.BlockSpec(
            (None, cin, None, 8, wd),
            lambda bi, di, hi, o=off, r=blk_off: (
                bi, 0, jnp.clip(di + o, 0, dsz - 1),
                jnp.clip(hi * (_HTILE // 8) + r, 0, nb8 - 1), 0),
            memory_space=pltpu.VMEM,
        )

    in_specs, operands = [], []
    for off in (-1, 0, 1):
        in_specs += [halo_spec(off, -1), main_spec(off),
                     halo_spec(off, _HTILE // 8)]
        operands += [x, x, x]
    in_specs.append(w_spec)
    operands.append(w_taps)
    out = pl.pallas_call(
        partial(_conv_kernel_htiled, k=k, dsize=dsz, nh=nh),
        grid=(b, dsz, nh),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (None, cout, None, _HTILE, wd),
            lambda bi, di, hi: (bi, 0, di, hi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, cout, dsz, hp, wd), x.dtype),
        compiler_params=_CPARAMS,
        interpret=interpret,
    )(*operands)
    return out[:, :, :, :h] if hp != h else out


@partial(jax.jit, static_argnames=("k", "interpret"))
def _pallas_conv3d_fwd(x: jnp.ndarray, w: jnp.ndarray, k: int,
                       interpret: bool = False) -> jnp.ndarray:
    """w is [Cout, Cin, k, k, k], or [B, Cout, Cin, k, k, k] for PER-SAMPLE
    kernels (the CondConv expert mixture) — one pallas instance either way,
    the weight block just indexes the batch grid dim."""
    b, cin, dsz, h, wd = x.shape
    if k == 3 and h > 128:
        # wide template-space slabs: full-H Mosaic programs OOM-kill the
        # remote compile helper; the H-tiled variant compiles cheaply
        return _pallas_conv3d_fwd_htiled(x, w, interpret=interpret)
    batched = w.ndim == 6
    cout = w.shape[1] if batched else w.shape[0]
    # weights as [k^2, Cout, k*Cin] f32: (kh, kw)-indexed taps with the kd
    # dimension stacked along the contraction axis (concat(kd=-1,0,+1) order)
    if batched:
        w_taps = jnp.transpose(w, (0, 4, 5, 1, 3, 2)).reshape(
            b, k * k, cout, k * cin
        ).astype(jnp.float32)
        w_spec = pl.BlockSpec((None, k * k, cout, k * cin),
                              lambda bi, di: (bi, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    else:
        w_taps = jnp.transpose(w, (3, 4, 0, 2, 1)).reshape(
            k * k, cout, k * cin
        ).astype(jnp.float32)
        w_spec = pl.BlockSpec((k * k, cout, k * cin),
                              lambda bi, di: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    grid = (b, dsz)

    def idx(off):
        def f(bi, di):
            return (bi, 0, jnp.clip(di + off, 0, dsz - 1), 0, 0)

        return f

    # None block dims are squeezed out in-kernel (refs are [Cin, H, W]).
    # k == 1 fetches ONE slab per grid step (no D halo).
    spec = lambda off: pl.BlockSpec(  # noqa: E731
        (None, cin, None, h, wd), idx(off), memory_space=pltpu.VMEM
    )
    if k == 3:
        in_specs = [spec(-1), spec(0), spec(1), w_spec]
        operands = (x, x, x, w_taps)
        out = pl.pallas_call(
            partial(_conv_kernel, k=k, dsize=dsz),
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (None, cout, None, h, wd), lambda bi, di: (bi, 0, di, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((b, cout, dsz, h, wd), x.dtype),
            compiler_params=_CPARAMS,
            interpret=interpret,
        )(*operands)
        return out
    # k == 1: D-tiled pointwise kernel (launch-overhead amortization —
    # see _k1_dtile)
    dt = _k1_dtile(dsz, cin, cout, h, wd)
    out = pl.pallas_call(
        partial(_conv_k1_kernel, dtile=dt),
        grid=(b, dsz // dt),
        in_specs=[
            pl.BlockSpec((None, cin, dt, h, wd),
                         lambda bi, di: (bi, 0, di, 0, 0),
                         memory_space=pltpu.VMEM),
            w_spec,
        ],
        out_specs=pl.BlockSpec(
            (None, cout, dt, h, wd), lambda bi, di: (bi, 0, di, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, cout, dsz, h, wd), x.dtype),
        compiler_params=_CPARAMS,
        interpret=interpret,
    )(x, w_taps)
    return out


def pallas_disabled_families() -> set:
    """Trace-time kill switches (COMA_PALLAS_DISABLE="t2,s2,packed,s1,k1"):
    a disabled family contributes NO Mosaic program anywhere — dispatch
    (models/blocks.py) AND the custom VJPs' cross-kernel substitutions
    (conv3d_strided.py) both consult this single parser, so they can never
    disagree about which families are live. A scoped `kernel_policy`
    (ops/pallas/policy.py) adds per-segment disables on top of the env."""
    import os

    from coma_unet_tpu.ops.pallas.policy import policy_disabled_families

    return set(
        filter(None, os.environ.get("COMA_PALLAS_DISABLE", "").split(","))
    ) | set(policy_disabled_families())


def pallas_conv3d_supported(x_shape, k: int, strides, is_transposed: bool,
                            groups: int = 1) -> bool:
    """Conservative gate for when the Pallas path wins over XLA."""
    if is_transposed or groups != 1 or k not in (1, 3):
        return False
    try:
        if jax.default_backend() != "tpu":
            return False  # Mosaic kernels only compile for TPU
    except RuntimeError:
        return False
    if any(s != 1 for s in strides):
        return False
    if len(x_shape) != 5:
        return False
    b, c, d, h, w = x_shape
    if w % 128 != 0 or h < 8:
        return False
    if c > 32 or b * d <= 4:  # grid too small / channels big enough for XLA
        return False
    if k == 3 and w > 128 and c > 16:
        # wide lane-padded slabs (template-space 216 -> 256 lanes): the c=32
        # k=3 Mosaic program (10.6 MB kd-stacked cat, 9 unrolled shifted
        # copies) ran the remote compile helper for 35 min and then crashed
        # it (r3 g216 probe); c <= 16 halves every temporary. Callers split
        # wider convs into channel halves (models/blocks.py conv3d).
        return False
    # VMEM: input slabs + accum must fit comfortably. k=1 fetches a single
    # slab per grid step (no D halo) — see `_conv_kernel`.
    vmem = ((3 if k == 3 else 1) * c * h * w * 2) + (h * w * 4 * 32)
    return vmem < 12 * 1024 * 1024


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def pallas_conv3d(x: jnp.ndarray, w: jnp.ndarray, k: int = 3) -> jnp.ndarray:
    """Stride-1 SAME 3D conv, NCDHW / OIDHW, k in {1, 3}."""
    return _pallas_conv3d_fwd(x, w, k)


def _fwd(x, w, k):
    return _pallas_conv3d_fwd(x, w, k), (x, w)


def _xla_conv(x, w, k):
    pad = (k - 1) // 2
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), [(pad, pad)] * 3,
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
    )


def _dw_kernel(*refs, k: int, dsize: int, batched: bool = False):
    """Accumulate dw[tap, Cout, Cin] across the whole (B, D) grid — the
    output block has a constant index map so it stays resident in VMEM.
    With `batched`, the output carries a leading B dim (per-sample kernels)
    and each batch item re-initializes its own block at d == 0.

    k == 3 refs: (xm, x0, xp, g, o); k == 1 refs: (x0, g, o) — same
    single-slab fetch as `_conv_kernel` (no dead D halo for pointwise).

    dw[tap][o, c] = sum_{pixels} g[o, p] * shift_tap(x)[c, p]."""
    if k == 3:
        xm_ref, x0_ref, xp_ref, g_ref, o_ref = refs
    else:
        x0_ref, g_ref, o_ref = refs
    b = pl.program_id(0)
    d = pl.program_id(1)

    @pl.when(d == 0 if batched else jnp.logical_and(b == 0, d == 0))
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    g = g_ref[...]  # [Cout, H, W]
    slabs = (xm_ref, x0_ref, xp_ref) if k == 3 else (x0_ref,)
    for kd, slab_ref in enumerate(slabs):
        slab = slab_ref[...]
        if k == 3:
            if kd == 0:
                slab = jnp.where(d > 0, slab, 0.0)
            if kd == 2:
                slab = jnp.where(d < dsize - 1, slab, 0.0)
        taps = range(-1, 2) if k == 3 else (0,)
        for kh in taps:
            for kw in taps:
                sx = _shift_hw(slab, kh, kw)  # [Cin, H, W]
                tap = (kd * k + (kh + k // 2)) * k + (kw + k // 2)
                # contract pixels: [Cout, H*W] x [Cin, H*W] -> [Cout, Cin]
                # (Mosaic matmul needs a single contracting dim)
                hw = g.shape[1] * g.shape[2]
                o_ref[tap] += jax.lax.dot_general(
                    g.reshape(g.shape[0], hw), sx.reshape(sx.shape[0], hw),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )


def _dw_k1_kernel(x_ref, g_ref, o_ref, *, dtile: int, batched: bool = False):
    """Pointwise weight-grad on [_, DT, H, W] blocks (see _k1_dtile):
    accumulate dw[0, Cout, Cin] over the (B, D/DT) grid, DT pixel
    contractions per step."""
    b = pl.program_id(0)
    d = pl.program_id(1)

    @pl.when(d == 0 if batched else jnp.logical_and(b == 0, d == 0))
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    for j in range(dtile):
        g = g_ref[:, j]   # [Cout, H, W]
        sx = x_ref[:, j]  # [Cin, H, W]
        hw = g.shape[1] * g.shape[2]
        o_ref[0] += jax.lax.dot_general(
            g.reshape(g.shape[0], hw), sx.reshape(sx.shape[0], hw),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def _dw_kernel_htiled(*refs, dsize: int, nh: int, batched: bool):
    """H-tiled wide-slab variant of `_dw_kernel` (k=3 only): same 1-row-halo
    fetch pattern as `_conv_kernel_htiled`, accumulating dw[tap, Cout, Cin]
    across the (B, D, H-tiles) grid into a VMEM-resident constant block."""
    bi = pl.program_id(0)
    d = pl.program_id(1)
    hi = pl.program_id(2)
    g_ref, o_ref = refs[9], refs[10]

    first = jnp.logical_and(d == 0, hi == 0)

    @pl.when(first if batched else jnp.logical_and(bi == 0, first))
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    g = g_ref[...]  # [Cout, TH, W]
    th = g.shape[1]
    hw = th * g.shape[2]
    for kd in range(3):
        top_r, main_r, bot_r = refs[3 * kd:3 * kd + 3]
        top = jnp.where(hi > 0, top_r[:, 7:8, :], 0.0)
        bot = jnp.where(hi < nh - 1, bot_r[:, 0:1, :], 0.0)
        buf = jnp.concatenate([top, main_r[...], bot], axis=1)
        if kd == 0:
            buf = jnp.where(d > 0, buf, 0.0)
        if kd == 2:
            buf = jnp.where(d < dsize - 1, buf, 0.0)
        # lane shift before the row-window slice (see _conv_kernel_htiled:
        # Mosaic's concatenate rejects sublane-offset operands)
        for kw in (-1, 0, 1):
            sw = _shift_hw(buf, 0, kw)
            for kh in (-1, 0, 1):
                # offset-0 row window via shift-and-zero-fill + leading
                # slice (see _conv_kernel_htiled)
                sx = _shift_hw(sw, 1 + kh, 0)[:, :th, :]  # [Cin, TH, W]
                tap = (kd * 3 + (kh + 1)) * 3 + (kw + 1)
                o_ref[tap] += jax.lax.dot_general(
                    g.reshape(g.shape[0], hw), sx.reshape(sx.shape[0], hw),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )


def _pallas_conv3d_dw_htiled(x: jnp.ndarray, g: jnp.ndarray,
                             batched: bool = False,
                             interpret: bool = False) -> jnp.ndarray:
    """k=3 wide-H weight gradient: pad H to a `_HTILE` multiple (pad rows of
    BOTH x and g are zero, so they contribute nothing — exact) and grid over
    (B, D, H tiles)."""
    b, cin, dsz, h, wd = x.shape
    cout = g.shape[1]
    k = 3
    hp = -(-h // _HTILE) * _HTILE
    if hp != h:
        pad = [(0, 0), (0, 0), (0, 0), (0, hp - h), (0, 0)]
        x = jnp.pad(x, pad)
        g = jnp.pad(g, pad)
    nh = hp // _HTILE

    def main_spec(off):
        return pl.BlockSpec(
            (None, cin, None, _HTILE, wd),
            lambda bi, di, hi, o=off: (bi, 0, jnp.clip(di + o, 0, dsz - 1),
                                       hi, 0),
            memory_space=pltpu.VMEM,
        )

    def halo_spec(off, blk_off):
        nb8 = hp // 8
        return pl.BlockSpec(
            (None, cin, None, 8, wd),
            lambda bi, di, hi, o=off, r=blk_off: (
                bi, 0, jnp.clip(di + o, 0, dsz - 1),
                jnp.clip(hi * (_HTILE // 8) + r, 0, nb8 - 1), 0),
            memory_space=pltpu.VMEM,
        )

    in_specs, operands = [], []
    for off in (-1, 0, 1):
        in_specs += [halo_spec(off, -1), main_spec(off),
                     halo_spec(off, _HTILE // 8)]
        operands += [x, x, x]
    in_specs.append(pl.BlockSpec((None, cout, None, _HTILE, wd),
                                 lambda bi, di, hi: (bi, 0, di, hi, 0),
                                 memory_space=pltpu.VMEM))
    operands.append(g)
    if batched:
        out_spec = pl.BlockSpec((None, k ** 3, cout, cin),
                                lambda bi, di, hi: (bi, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((b, k ** 3, cout, cin), jnp.float32)
    else:
        out_spec = pl.BlockSpec((k ** 3, cout, cin),
                                lambda bi, di, hi: (0, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((k ** 3, cout, cin), jnp.float32)
    dw_taps = pl.pallas_call(
        partial(_dw_kernel_htiled, dsize=dsz, nh=nh, batched=batched),
        grid=(b, dsz, nh),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        compiler_params=_CPARAMS,
        interpret=interpret,
    )(*operands)
    if batched:
        return jnp.transpose(dw_taps, (0, 2, 3, 1)).reshape(
            b, cout, cin, k, k, k
        )
    return jnp.transpose(dw_taps, (1, 2, 0)).reshape(cout, cin, k, k, k)


@partial(jax.jit, static_argnames=("k", "batched", "interpret"))
def _pallas_conv3d_dw(x: jnp.ndarray, g: jnp.ndarray, k: int,
                      batched: bool = False,
                      interpret: bool = False) -> jnp.ndarray:
    """Weight gradient of the stride-1 SAME conv: [Cout, Cin, k, k, k], or
    per-sample [B, Cout, Cin, k, k, k] when `batched`."""
    b, cin, dsz, h, wd = x.shape
    if k == 3 and h > 128:
        return _pallas_conv3d_dw_htiled(x, g, batched=batched,
                                        interpret=interpret)
    cout = g.shape[1]

    def idx(off):
        def f(bi, di):
            return (bi, 0, jnp.clip(di + off, 0, dsz - 1), 0, 0)

        return f

    spec = lambda off: pl.BlockSpec(  # noqa: E731
        (None, cin, None, h, wd), idx(off), memory_space=pltpu.VMEM
    )
    if batched:
        out_spec = pl.BlockSpec((None, k ** 3, cout, cin),
                                lambda bi, di: (bi, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((b, k ** 3, cout, cin), jnp.float32)
    else:
        out_spec = pl.BlockSpec((k ** 3, cout, cin),
                                lambda bi, di: (0, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((k ** 3, cout, cin), jnp.float32)
    g_spec = pl.BlockSpec((None, cout, None, h, wd),
                          lambda bi, di: (bi, 0, di, 0, 0),
                          memory_space=pltpu.VMEM)
    if k == 3:
        dw_taps = pl.pallas_call(
            partial(_dw_kernel, k=k, dsize=dsz, batched=batched),
            grid=(b, dsz),
            in_specs=[spec(-1), spec(0), spec(1), g_spec],
            out_specs=out_spec,
            out_shape=out_shape,
            compiler_params=_CPARAMS,
            interpret=interpret,
        )(x, x, x, g)
    else:
        # k == 1: D-tiled grid (launch-overhead amortization, _k1_dtile)
        dt = _k1_dtile(dsz, cin, cout, h, wd)
        dw_taps = pl.pallas_call(
            partial(_dw_k1_kernel, dtile=dt, batched=batched),
            grid=(b, dsz // dt),
            in_specs=[
                pl.BlockSpec((None, cin, dt, h, wd),
                             lambda bi, di: (bi, 0, di, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, cout, dt, h, wd),
                             lambda bi, di: (bi, 0, di, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_spec,
            out_shape=out_shape,
            compiler_params=_CPARAMS,
            interpret=interpret,
        )(x, g)
    # [(B,) k^3, Cout, Cin] -> [(B,) Cout, Cin, k, k, k]
    if batched:
        return jnp.transpose(dw_taps, (0, 2, 3, 1)).reshape(
            b, cout, cin, k, k, k
        )
    return jnp.transpose(dw_taps, (1, 2, 0)).reshape(cout, cin, k, k, k)


def _bwd(k, res, g):
    x, w = res
    g = g.astype(x.dtype)
    # dx: the same stride-1 SAME conv with the spatially-flipped, io-swapped
    # kernel — run it through the fast Pallas forward.
    if k == 3:
        w_t = jnp.flip(w, axis=(2, 3, 4)).transpose(1, 0, 2, 3, 4)
    else:
        w_t = w.transpose(1, 0, 2, 3, 4)
    dx = _pallas_conv3d_fwd(g, w_t.astype(w.dtype), k)
    if x.shape[1] == 1:
        # Mosaic rejects the [1, H*W] reshape in the dw kernel; the
        # single-input-channel weight grad is tiny — but the XLA-conv vjp
        # it used to take relayouts wide operands channel-minor (the 216^3
        # OOM class, scripts/trace_216_bwd.py). Shifted-slice einsums stay
        # on natural layouts at identical math.
        from coma_unet_tpu.ops.phase_dot import shift_dot_dw

        dw = shift_dot_dw(x, g, k)
    else:
        dw = _pallas_conv3d_dw(x, g, k)
    return dx.astype(x.dtype), dw.astype(w.dtype)


pallas_conv3d.defvjp(_fwd, _bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def pallas_conv3d_b(x: jnp.ndarray, w: jnp.ndarray, k: int = 3) -> jnp.ndarray:
    """Stride-1 SAME conv with PER-SAMPLE kernels w [B, Cout, Cin, k, k, k]
    (the CondConv expert mixture) — ONE pallas instance for the whole batch,
    replacing B unrolled calls / XLA's grouped-conv lowering."""
    return _pallas_conv3d_fwd(x, w, k)


def _fwd_b(x, w, k):
    return _pallas_conv3d_fwd(x, w, k), (x, w)


def _bwd_b(k, res, g):
    x, w = res
    g = g.astype(x.dtype)
    if k == 3:
        w_t = jnp.flip(w, axis=(3, 4, 5)).transpose(0, 2, 1, 3, 4, 5)
    else:
        w_t = w.transpose(0, 2, 1, 3, 4, 5)
    dx = _pallas_conv3d_fwd(g, w_t.astype(w.dtype), k)
    if x.shape[1] == 1:
        # per-sample Cin==1 weight grad: shifted-slice einsums instead of
        # the grouped-XLA-conv vjp (same relayout rationale as `_bwd`)
        from coma_unet_tpu.ops.phase_dot import shift_dot_dw

        dw = shift_dot_dw(x, g, k, batched=True)
    else:
        dw = _pallas_conv3d_dw(x, g, k, batched=True)
    return dx.astype(x.dtype), dw.astype(w.dtype)


pallas_conv3d_b.defvjp(_fwd_b, _bwd_b)
