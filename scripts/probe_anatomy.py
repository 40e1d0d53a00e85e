"""Decompose WHERE a Pallas conv kernel's time goes on the chip.

Every measured conv kernel sits 5-10x above its MXU+HBM roofline at the
flagship 128^3 shapes (e.g. s2-v2: 7.71 ms vs ~58 GFLOP minimal MXU work
+ ~2 ms HBM traffic). Before designing any further kernels, this probe
times structurally-stripped variants of the s2-v2 (phase-split) kernel —
each variant keeps the SAME grid/BlockSpecs/output so only the named cost
changes:

    full      — the real kernel (baseline; math-correct)
    nodot     — operand assembly kept, dots replaced by a channel slice
                (VPU+HBM only: what do the 27 _w_piece concats cost?)
    noasm     — dots kept at full count/shape, operands = one raw slab
                reused (MXU+HBM only: what do the 9 dots cost?)
    fetch     — fetch all 10 refs, write a trivial combination (HBM only:
                what does the 5x windowed refetch cost?)
    prologue  — the XLA _phase_split alone (strided-slice pass cost)

Interpreting: full ~= nodot + noasm - fetch means VPU assembly and MXU
serialize; fetch >> others means the windowed refetch dominates and
D-tiling (fetch TD slabs + halo per step) is the fix.

    JAX_COMPILATION_CACHE_DIR=.jax_cache python scripts/probe_anatomy.py
"""

import sys
import time
from functools import partial

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from coma_unet_tpu.ops.pallas.conv3d import _shift_hw
from coma_unet_tpu.ops.pallas.conv3d_strided import (
    _CPARAMS,
    _phase_specs,
    _phase_split_xla as _phase_split,
    _s2_fwd_v2,
    _w_piece,
)

DT = jnp.bfloat16


def _fetch(out):
    return sum(float(jnp.sum(leaf.astype(jnp.float32)))
               for leaf in jax.tree.leaves(out))


def timeit(tag, fn, *args, n=20, warm=3):
    f = jax.jit(fn)
    t0 = time.time()
    _fetch(f(*args))
    compile_s = time.time() - t0
    for _ in range(warm):
        f(*args)
    t0 = time.time()
    out = None
    for _ in range(n):
        out = f(*args)
    _fetch(out)
    ms = (time.time() - t0) / n * 1000
    print(f"{tag:44s} {ms:8.2f} ms   (compile {compile_s:5.1f}s)", flush=True)
    return ms


# ---- stripped kernel bodies (same refs/grid/output as _s2_kernel_v2) ----


def _k_nodot(*refs):
    (p0m, p00, p01, p02, p03, p1m, p10, p11, p12, p13, w_ref, o_ref) = refs
    p = pl.program_id(1)
    hp_slots = ((p0m, p00, p01, p02, p03), (p1m, p10, p11, p12, p13))
    cout = o_ref.shape[0]
    acc = jnp.zeros(o_ref.shape, dtype=jnp.float32)
    for th in (0, 1, 2):
        slots = hp_slots[0 if th == 1 else 1]
        for tw in (0, 1, 2):
            parts = []
            for td in (0, 1, 2):
                a = _w_piece(slots[td][...], tw)
                if td == 0:
                    a = jnp.where(p > 0, a, 0.0)
                bb = _w_piece(slots[td + 2][...], tw)
                parts.append(jnp.concatenate([a, bb], axis=-1))
            cat = jnp.concatenate(parts, axis=0)
            if th == 0:
                cat = _shift_hw(cat, -1, 0)
            # dot replaced by a channel reduce: every assembly byte kept,
            # no MXU work
            acc = acc + jnp.sum(cat.astype(jnp.float32), axis=0)[None]
    o_ref[...] = acc.astype(o_ref.dtype)


def _k_noasm(*refs):
    (p0m, p00, p01, p02, p03, p1m, p10, p11, p12, p13, w_ref, o_ref) = refs
    # one raw concat reused for all 9 dots: full MXU work, no per-tap
    # assembly (math is wrong; structure/shape identical)
    cat = jnp.concatenate(
        [p00[...], p02[...], p10[...]], axis=0
    )  # [3*Cin, H2, W]
    acc = None
    for th in (0, 1, 2):
        for tw in (0, 1, 2):
            d = jax.lax.dot_general(
                w_ref[th * 3 + tw].astype(cat.dtype), cat,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = d if acc is None else acc + d
    o_ref[...] = acc.astype(o_ref.dtype)


def _k_fetch(*refs):
    (p0m, p00, p01, p02, p03, p1m, p10, p11, p12, p13, w_ref, o_ref) = refs
    acc = jnp.zeros(o_ref.shape, dtype=jnp.float32)
    for r in (p0m, p00, p01, p02, p03, p1m, p10, p11, p12, p13):
        acc = acc + jnp.sum(r[...].astype(jnp.float32), axis=0)[None]
    o_ref[...] = acc.astype(o_ref.dtype)


def _run_variant(kernel_body, x, w_taps, interpret=False):
    b, cin, dsz, h, wd = x.shape
    cout = w_taps.shape[1]
    p0, p1 = _phase_split(x)
    p_count = dsz // 4
    w_spec = pl.BlockSpec((9, cout, 3 * cin), lambda bi, pi: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel_body,
        grid=(b, p_count),
        in_specs=_phase_specs(cin, h // 2, wd, dsz) + [w_spec],
        out_specs=pl.BlockSpec(
            (None, cout, None, h // 2, wd), lambda bi, pi: (bi, 0, pi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, cout, p_count, h // 2, wd), x.dtype),
        compiler_params=_CPARAMS,
        interpret=interpret,
    )(*([p0] * 5 + [p1] * 5 + [w_taps]))


# ---- s1 (stride-1 k=3, conv3d.py _conv_kernel) stripped variants --------
# grid (B, D), 3-slab halo fetch, kd-stacked cat, 9 (kh,kw) shifts + dots.


def _s1_body(xm_ref, x0_ref, xp_ref, w_ref, o_ref, *, dsize: int, mode: str):
    d = pl.program_id(1)
    if mode == "fetch":
        acc = jnp.zeros(o_ref.shape, dtype=jnp.float32)
        for r in (xm_ref, x0_ref, xp_ref):
            acc = acc + jnp.sum(r[...].astype(jnp.float32), axis=0)[None]
        o_ref[...] = acc.astype(o_ref.dtype)
        return
    slabs = []
    for kd, slab_ref in enumerate((xm_ref, x0_ref, xp_ref)):
        slab = slab_ref[...]
        if kd == 0:
            slab = jnp.where(d > 0, slab, 0.0)
        if kd == 2:
            slab = jnp.where(d < dsize - 1, slab, 0.0)
        slabs.append(slab)
    cat = jnp.concatenate(slabs, axis=0)  # [3*Cin, H, W]
    if mode == "noasm":
        acc = None
        for t in range(9):
            d_ = jax.lax.dot_general(
                w_ref[t].astype(cat.dtype), cat, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = d_ if acc is None else acc + d_
        o_ref[...] = acc.astype(o_ref.dtype)
        return
    acc = jnp.zeros(o_ref.shape, dtype=jnp.float32)
    for kh in (-1, 0, 1):
        for kw in (-1, 0, 1):
            s = _shift_hw(cat, kh, kw)
            if mode == "nodot":
                acc = acc + jnp.sum(s.astype(jnp.float32), axis=0)[None]
            else:  # full
                tap = (kh + 1) * 3 + (kw + 1)
                acc += jax.lax.dot_general(
                    w_ref[tap].astype(s.dtype), s, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
    o_ref[...] = acc.astype(o_ref.dtype)


def _run_s1(mode, x, w_taps, interpret=False):
    b, cin, dsz, h, wd = x.shape
    cout = w_taps.shape[1]

    def idx(off):
        def f(bi, di):
            return (bi, 0, jnp.clip(di + off, 0, dsz - 1), 0, 0)

        return f

    spec = lambda off: pl.BlockSpec(  # noqa: E731
        (None, cin, None, h, wd), idx(off), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        partial(_s1_body, dsize=dsz, mode=mode),
        grid=(b, dsz),
        in_specs=[spec(-1), spec(0), spec(1),
                  pl.BlockSpec((9, cout, 3 * cin), lambda bi, di: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (None, cout, None, h, wd), lambda bi, di: (bi, 0, di, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, cout, dsz, h, wd), x.dtype),
        compiler_params=_CPARAMS,
        interpret=interpret,
    )(x, x, x, w_taps)


def main(fams):
    rng = np.random.default_rng(0)
    print("devices:", jax.devices(), flush=True)

    if "s2" in fams:
        x = jnp.asarray(rng.normal(size=(2, 32, 128, 128, 128)), DT)
        w = jnp.asarray(rng.normal(size=(64, 32, 3, 3, 3)), DT)
        w_taps = jnp.transpose(w, (3, 4, 0, 2, 1)).reshape(9, 64, 96).astype(
            jnp.float32
        )
        timeit("s2-v2 full (baseline)", lambda a, b_: _s2_fwd_v2(a, b_), x, w)
        timeit("s2-v2 nodot (assembly+HBM)",
               lambda a, t: _run_variant(_k_nodot, a, t), x, w_taps)
        timeit("s2-v2 noasm (dots+HBM)",
               lambda a, t: _run_variant(_k_noasm, a, t), x, w_taps)
        timeit("s2-v2 fetch (HBM only)",
               lambda a, t: _run_variant(_k_fetch, a, t), x, w_taps)
        timeit("phase_split prologue (XLA)",
               lambda a: [jnp.sum(t.astype(jnp.float32))
                          for t in _phase_split(a)], x)

    if "s1" in fams:
        x = jnp.asarray(rng.normal(size=(2, 32, 128, 128, 128)), DT)
        w_taps = jnp.asarray(rng.normal(size=(9, 32, 96)), jnp.float32)
        timeit("s1-32ch full", lambda a, t: _run_s1("full", a, t), x, w_taps)
        timeit("s1-32ch nodot (assembly+HBM)",
               lambda a, t: _run_s1("nodot", a, t), x, w_taps)
        timeit("s1-32ch noasm (dots+HBM)",
               lambda a, t: _run_s1("noasm", a, t), x, w_taps)
        timeit("s1-32ch fetch (HBM only)",
               lambda a, t: _run_s1("fetch", a, t), x, w_taps)
        # Cout=16 modulator-class conv: does the M=16 dot starve the MXU?
        w16 = jnp.asarray(rng.normal(size=(9, 16, 96)), jnp.float32)
        timeit("s1-32->16 full", lambda a, t: _run_s1("full", a, t), x, w16)


if __name__ == "__main__":
    fams = sys.argv[1].split(",") if len(sys.argv) > 1 else ["s2", "s1"]
    main(fams)
