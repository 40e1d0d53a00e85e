"""Pin the fastest in-kernel dot structure for the conv families.

Hypothesis from probe_anatomy + the p1 A/Bs: per-step time is dominated by
the NUMBER of dot/accumulate rounds (each re-reads + re-writes the f32
accumulator through the VPU), not by MXU row fill — the H-phase p1 (3 dots)
had the fastest kernel-part while q4-p1 and the base s1 (9 dots each) tie.
This microbench times pure dot pipelines at conv-like shapes on resident
operands (one fetched slab, replicated in-VMEM to the target K), so only
(M, K, #dots) vary. Output = [M, H, W] accumulated over all dots.

    JAX_COMPILATION_CACHE_DIR=.jax_cache python scripts/probe_dots.py
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

_CPARAMS = pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)
DT = jnp.bfloat16


def _fetch(out):
    return float(jnp.sum(out.astype(jnp.float32)))


def timeit(tag, fn, *args, n=20, warm=3, flops=None):
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
    tf = f"  {flops/ms/1e9:7.1f} TF/s" if flops else ""
    print(f"{tag:40s} {ms:8.2f} ms{tf}   (compile {compile_s:5.1f}s)",
          flush=True)
    return ms


def _dots_kernel(x_ref, w_ref, o_ref, *, kmul: int, ndots: int):
    slab = x_ref[...]  # [Cin, H, W]
    opnd = (jnp.concatenate([slab] * kmul, axis=0) if kmul > 1 else slab)
    acc = None
    for t in range(ndots):
        d = jax.lax.dot_general(
            w_ref[t].astype(opnd.dtype), opnd, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = d if acc is None else acc + d
    o_ref[...] = acc.astype(o_ref.dtype)


def run_dots(x, m, kmul, ndots):
    b, cin, dsz, h, wd = x.shape
    k = kmul * cin
    w = jnp.zeros((ndots, m, k), jnp.float32) + 0.01
    return pl.pallas_call(
        partial(_dots_kernel, kmul=kmul, ndots=ndots),
        grid=(b, dsz),
        in_specs=[
            pl.BlockSpec((None, cin, None, h, wd),
                         lambda bi, di: (bi, 0, di, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ndots, m, k), lambda bi, di: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, m, None, h, wd),
                               lambda bi, di: (bi, 0, di, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, m, dsz, h, wd), x.dtype),
        compiler_params=_CPARAMS,
    )(x, w)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 32, 128, 128, 128)), DT)
    n = 2 * 128 * 128 * 128  # output pixels per M-row... per (b, d): h*w
    print("devices:", jax.devices(), flush=True)
    # (tag, M, kmul, ndots): FLOPs = 2 * M * kmul*32 * 128^2 per step * 256
    cases = [
        ("s1-like   M=32  K=96   x9", 32, 3, 9),
        ("fold3     M=32  K=288  x3", 32, 9, 3),
        ("fold9     M=32  K=864  x1", 32, 27, 1),
        ("q4-like   M=128 K=192  x9", 128, 6, 9),
        ("q4+fold   M=128 K=576  x3", 128, 18, 3),
        ("wide-acc  M=128 K=96   x9", 128, 3, 9),
        ("tall-K    M=32  K=192  x9", 32, 6, 9),
    ]
    for tag, m, kmul, ndots in cases:
        flops = 2.0 * m * (kmul * 32) * (128 * 128) * 256 * ndots
        timeit(tag, lambda a, mm=m, km=kmul, nd=ndots: run_dots(a, mm, km, nd),
               x, flops=flops)


if __name__ == "__main__":
    main()
