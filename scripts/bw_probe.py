"""HBM bandwidth microbenchmark: what copy throughput can a Pallas TPU
kernel actually sustain at the conv kernels' block geometries?

The s2-v2 anatomy (artifacts/r3/anatomy_probe.log) shows the strided
conv's PURE FETCH at ~108 GB/s vs the v5e's ~819 GB/s HBM peak — if a
plain copy at the same block shape is equally slow, the conv families'
ceiling is DMA geometry, not compute, and the fix is block reshaping
(bigger D-slabs / fused C) rather than smarter math.

Grid/blocks mirror the conv kernels: grid (B, D/dblk), block
[C, dblk, H, W] bf16 in VMEM, out = in + 1 (forces a real read+write).

    python scripts/bw_probe.py            # sweep
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, ".")

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from coma_unet_tpu.utils.compile_cache import prune_compile_cache

prune_compile_cache()

_CPARAMS = pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)


def _copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...] + jnp.asarray(1.0, x_ref.dtype)


def make_copy(shape, dblk):
    b, c, d, h, w = shape

    def idx(i, j):
        return (i, 0, j, 0, 0)

    return pl.pallas_call(
        _copy_kernel,
        grid=(b, d // dblk),
        in_specs=[pl.BlockSpec((None, c, dblk, h, w), idx)],
        out_specs=pl.BlockSpec((None, c, dblk, h, w), idx),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.bfloat16),
        compiler_params=_CPARAMS,
    )


def _fetch(x):
    return float(jnp.sum(x[..., ::64, ::64].astype(jnp.float32)))


def timeit(fn, x, n=20):
    y = fn(x)
    _fetch(y)  # warm + force
    t0 = time.time()
    for _ in range(n):
        y = fn(x)
    _fetch(y)
    return (time.time() - t0) / n


def main():
    print("devices:", jax.devices(), flush=True)
    b, h, w = 2, 128, 128
    results = []
    sweep = () if os.environ.get("BW_HALO_ONLY") == "1" else (32, 64)
    for c in sweep:
        for d in (128,):
            shape = (b, c, d, h, w)
            nbytes = int(np.prod(shape)) * 2
            xh = np.random.default_rng(0).standard_normal(shape)
            x = jnp.asarray(xh, jnp.bfloat16)
            # XLA baseline: elementwise add (one read + one write)
            sec = timeit(jax.jit(lambda t: t + 1), x)
            gbs = 2 * nbytes / sec / 1e9
            print(f"XLA add    c={c:3d} d={d}: {sec*1e3:7.2f} ms "
                  f"{gbs:6.1f} GB/s", flush=True)
            for dblk in (1, 2, 4, 8):
                try:
                    fn = jax.jit(make_copy(shape, dblk))
                    sec = timeit(fn, x)
                    gbs = 2 * nbytes / sec / 1e9
                    blk_mb = c * dblk * h * w * 2 / 1e6
                    print(f"pallas cp  c={c:3d} d={d} dblk={dblk} "
                          f"(blk {blk_mb:5.1f} MB): {sec*1e3:7.2f} ms "
                          f"{gbs:6.1f} GB/s", flush=True)
                    results.append((c, dblk, gbs))
                except Exception as e:  # noqa: BLE001
                    print(f"pallas cp  c={c} dblk={dblk}: FAILED "
                          f"{str(e)[:120]}", flush=True)

    # the conv-like pattern: 3 halo'd input refs, one dot-less combine
    def _halo_kernel(x0, x1, x2, o_ref):
        o_ref[...] = (x0[...] + x1[...] + x2[...]).astype(o_ref.dtype)

    c, d = 32, 128
    shape = (b, c, d, h, w)
    nbytes = int(np.prod(shape)) * 2

    def idx_off(off):
        def f(i, j):
            return (i, 0, jnp.maximum(j + off, 0), 0, 0)
        return f

    halo = pl.pallas_call(
        _halo_kernel,
        grid=(b, d),
        in_specs=[pl.BlockSpec((None, c, 1, h, w), idx_off(o))
                  for o in (-1, 0, 1)],
        out_specs=pl.BlockSpec((None, c, 1, h, w),
                               lambda i, j: (i, 0, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.bfloat16),
        compiler_params=_CPARAMS,
    )
    x = jnp.asarray(np.random.default_rng(0).standard_normal(shape),
                    jnp.bfloat16)
    halo3 = jax.jit(lambda t: halo(t, t, t))
    sec = timeit(halo3, x)
    gbs = 4 * nbytes / sec / 1e9  # 3 reads + 1 write
    print(f"pallas 3-halo c={c}: {sec*1e3:7.2f} ms {gbs:6.1f} GB/s "
          f"(3r+1w counted)", flush=True)


if __name__ == "__main__":
    main()
