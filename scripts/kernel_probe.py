"""Standalone per-kernel timings at production shapes (flagship 128^3, b=2):
each Pallas family vs its exact XLA fallback, forward AND backward — the
post-redesign evidence VERDICT r2 asked for (the t2 kernel shipped into the
serving path without a standalone re-time after its H-phase redesign).

    JAX_COMPILATION_CACHE_DIR=.jax_cache python scripts/kernel_probe.py [fams]

Timing protocol (CLAUDE.md): ~28 ms relay floor per dispatch+fetch and an
early-returning block_until_ready -> amortize n chained dispatches, one
scalar fetch. Results append to /tmp/kernel_probe.log.
"""

import sys
import time

sys.path.insert(0, ".")

import jax

from coma_unet_tpu.utils.compile_cache import prune_compile_cache

prune_compile_cache()  # big-entry ingest has a slow tail; keep small hits (see util)
import jax.numpy as jnp
import numpy as np

from coma_unet_tpu.models.blocks import same_padding, transposed_padding

DT = jnp.bfloat16


def _fetch(out):
    # force a real device->host scalar fetch per leaf (grad fns return
    # tuples; block_until_ready returns early through the relay)
    return sum(float(jnp.sum(leaf.astype(jnp.float32)))
               for leaf in jax.tree.leaves(out))


def timeit(tag, fn, *args, n=20, warm=2):
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
    print(f"{tag:46s} {ms:8.2f} ms   (compile {compile_s:5.1f}s)", flush=True)
    return ms


def grad_fn(op):
    return lambda x, w: jax.grad(lambda x_, w_: jnp.sum(op(x_, w_).astype(jnp.float32)),
                                 argnums=(0, 1))(x, w)


def main(fams):
    from coma_unet_tpu.ops.pallas.conv3d import pallas_conv3d
    from coma_unet_tpu.ops.pallas.conv3d_packed import pallas_conv3d_packed
    from coma_unet_tpu.ops.pallas.conv3d_strided import (
        pack_w,
        pallas_conv3d_s2,
        pallas_conv3d_t2,
        unpack_w,
    )

    rng = np.random.default_rng(0)

    def mk(shape):
        return jnp.asarray(rng.normal(size=shape), DT)

    def xla_conv(x, w, strides=(1, 1, 1), pad=None, lhs_dil=None):
        return jax.lax.conv_general_dilated(
            x, w, strides, pad, lhs_dilation=lhs_dil,
            dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
        )

    if "t2" in fams:
        # up0: packed 64ch 64^3 -> 32ch 128^3 (merge1 output -> up0)
        xp = mk((2, 64, 32, 64, 128))
        w = mk((32, 64, 3, 3, 3))  # t2 kernel convention [Cout, Cin, k,k,k]
        tpad = transposed_padding((3, 3, 3), (2, 2, 2))
        # XLA fallback: unpack -> lhs-dilated conv
        import coma_unet_tpu.ops.pallas.conv3d_strided as strided

        timeit("t2 fwd v1 (scatter-dilate)",
               lambda xp_, w_: strided._t2_fwd_v1(xp_, w_), xp, w)
        timeit("t2 fwd v2 (phase-split)",
               lambda xp_, w_: strided._t2_fwd_v2(xp_, w_), xp, w)
        timeit("t2 fwd XLA (unpack + lhs-dilated)",
               lambda xp_, w_: xla_conv(unpack_w(xp_), w_, (1, 1, 1), tpad,
                                        (2, 2, 2)), xp, w)
        timeit("t2 fwd+bwd pallas", grad_fn(pallas_conv3d_t2), xp, w)
        timeit("t2 fwd+bwd XLA",
               grad_fn(lambda xp_, w_: xla_conv(unpack_w(xp_), w_, (1, 1, 1),
                                                tpad, (2, 2, 2))), xp, w)

    if "s2" in fams:
        import coma_unet_tpu.ops.pallas.conv3d_strided as strided

        x = mk((2, 32, 128, 128, 128))
        w = mk((64, 32, 3, 3, 3))
        timeit("s2 fwd v1 (decimation)",
               lambda x_, w_: strided._s2_fwd_v1(x_, w_), x, w)
        timeit("s2 fwd v2 (phase-split)",
               lambda x_, w_: strided._s2_fwd_v2(x_, w_), x, w)
        timeit("s2 fwd XLA (conv + pack)",
               lambda x_, w_: pack_w(xla_conv(x_, w_, (2, 2, 2),
                                              same_padding((3, 3, 3)))), x, w)
        gp = mk((2, 64, 32, 64, 128))  # packed cotangent of the s2 output
        timeit("s2 dw v1 (dilated corr)",
               lambda x_, g_: strided._dw_dil_v1(x_, g_), x, gp)
        timeit("s2 dw v2 (phase-split)",
               lambda x_, g_: strided._dw_v2(x_, g_), x, gp)
        timeit("s2 fwd+bwd pallas (default family)",
               grad_fn(pallas_conv3d_s2), x, w)
        timeit("s2 fwd+bwd XLA",
               grad_fn(lambda x_, w_: pack_w(
                   xla_conv(x_, w_, (2, 2, 2), same_padding((3, 3, 3))))),
               x, w)

    if "packed" in fams:
        xp = mk((2, 64, 32, 64, 128))
        w = mk((64, 64, 3, 3, 3))
        timeit("packed s1 64ch fwd pallas", pallas_conv3d_packed, xp, w)
        timeit("packed s1 64ch fwd XLA (unpack/conv/pack)",
               lambda xp_, w_: pack_w(xla_conv(unpack_w(xp_), w_, (1, 1, 1),
                                               same_padding((3, 3, 3)))),
               xp, w)
        timeit("packed s1 64ch fwd+bwd pallas",
               grad_fn(pallas_conv3d_packed), xp, w)
        timeit("packed s1 64ch fwd+bwd XLA",
               grad_fn(lambda xp_, w_: pack_w(
                   xla_conv(unpack_w(xp_), w_, (1, 1, 1),
                            same_padding((3, 3, 3))))), xp, w)
        xm = mk((2, 128, 32, 64, 128))
        wm = mk((64, 128, 3, 3, 3))
        timeit("packed s1 128->64 (merge1) fwd pallas",
               pallas_conv3d_packed, xm, wm)
        timeit("packed s1 128->64 fwd+bwd pallas",
               grad_fn(pallas_conv3d_packed), xm, wm)

    if "s1" in fams:
        x = mk((2, 32, 128, 128, 128))
        w = mk((32, 32, 3, 3, 3))
        op = lambda x_, w_: pallas_conv3d(x_, w_, 3)  # noqa: E731
        timeit("s1 32ch 128^3 fwd pallas", op, x, w)
        timeit("s1 32ch 128^3 fwd XLA",
               lambda x_, w_: xla_conv(x_, w_, (1, 1, 1),
                                       same_padding((3, 3, 3))), x, w)
        timeit("s1 32ch fwd+bwd pallas", grad_fn(op), x, w)
        timeit("s1 32ch fwd+bwd XLA",
               grad_fn(lambda x_, w_: xla_conv(
                   x_, w_, (1, 1, 1), same_padding((3, 3, 3)))), x, w)
        # k=1 single-slab fetch (r3: no dead 3-slab D halo) — the gate /
        # projection / modulator pointwise convs
        x1 = mk((2, 16, 128, 128, 128))
        w1 = mk((16, 16, 1, 1, 1))
        op1 = lambda x_, w_: pallas_conv3d(x_, w_, 1)  # noqa: E731
        timeit("k1 16ch 128^3 fwd pallas (single-slab)", op1, x1, w1)
        timeit("k1 16ch 128^3 fwd XLA",
               lambda x_, w_: xla_conv(x_, w_, (1, 1, 1), [(0, 0)] * 3),
               x1, w1)
        timeit("k1 16ch fwd+bwd pallas", grad_fn(op1), x1, w1)

    if "p1" in fams:
        # phase-decomposed stride-1 family (conv3d_p1.py) vs the base s1
        # kernel and XLA, at the two flagship s1 classes: 32->32 (head
        # conv1 / merge chunks) and 32->16 (modulator-width Cout)
        from coma_unet_tpu.ops.pallas.conv3d_p1 import (
            _p1_dw,
            _p1_fwd,
            pallas_conv3d_p1,
        )

        from coma_unet_tpu.ops.pallas.phase_split import (
            pallas_hsplit,
            pallas_hwsplit,
        )

        x = mk((2, 32, 128, 128, 128))
        w = mk((32, 32, 3, 3, 3))
        timeit("hsplit prepass (pallas)", pallas_hsplit, x)
        timeit("hwsplit prepass (pallas)", pallas_hwsplit, x)
        timeit("p1 32ch fwd", lambda x_, w_: _p1_fwd(x_, w_), x, w)
        timeit("s1 32ch fwd (base kernel)",
               lambda x_, w_: pallas_conv3d(x_, w_, 3), x, w)
        timeit("s1 32ch fwd XLA",
               lambda x_, w_: xla_conv(x_, w_, (1, 1, 1),
                                       same_padding((3, 3, 3))), x, w)
        g = mk((2, 32, 128, 128, 128))
        timeit("p1 32ch dw", lambda x_, g_: _p1_dw(x_, g_), x, g)
        timeit("p1 32ch fwd+bwd", grad_fn(pallas_conv3d_p1), x, w)
        timeit("s1 32ch fwd+bwd (base)",
               grad_fn(lambda x_, w_: pallas_conv3d(x_, w_, 3)), x, w)
        w16 = mk((16, 32, 3, 3, 3))
        timeit("p1 32->16 fwd", lambda x_, w_: _p1_fwd(x_, w_), x, w16)
        timeit("s1 32->16 fwd (base)",
               lambda x_, w_: pallas_conv3d(x_, w_, 3), x, w16)
        wb = mk((2, 32, 32, 3, 3, 3))
        timeit("p1 32ch fwd batched-kernels",
               lambda x_, w_: _p1_fwd(x_, w_), x, wb)

    if "g216" in fams:
        # Template-space 216^3 shapes (PROBE_216): the direct-216^3 forward
        # OOMs under XLA (three ~4.8 GB channel-minor temps, 8-16x layout
        # padding — probe_216.py r3). Can Mosaic compile the lane-padded
        # (W 216->256, exact for SAME, see blocks.conv3d) kernels at these
        # slab sizes?  k=3 c=32 is the head conv; k=1 c=16 the gate convs.
        x = mk((1, 32, 216, 216, 256))
        w = mk((32, 32, 3, 3, 3))
        op = lambda x_, w_: pallas_conv3d(x_, w_, 3)  # noqa: E731
        timeit("g216 k3 32ch 216x216x256 fwd pallas", op, x, w)
        timeit("g216 k3 32ch fwd+bwd pallas", grad_fn(op), x, w)
        x1 = mk((1, 16, 216, 216, 256))
        w1 = mk((16, 16, 1, 1, 1))
        op1 = lambda x_, w_: pallas_conv3d(x_, w_, 1)  # noqa: E731
        timeit("g216 k1 16ch 216x216x256 fwd pallas", op1, x1, w1)
        timeit("g216 k1 16ch fwd+bwd pallas", grad_fn(op1), x1, w1)
        # XLA comparison at the TRUE (unpadded) width — what dispatch
        # falls back to today, layout relayout included:
        xt = mk((1, 32, 216, 216, 216))
        timeit("g216 k3 32ch 216^3 fwd XLA", lambda x_, w_: xla_conv(
            x_, w_, (1, 1, 1), same_padding((3, 3, 3))), xt, w)
        timeit("g216 k3 32ch fwd+bwd XLA",
               grad_fn(lambda x_, w_: xla_conv(
                   x_, w_, (1, 1, 1), same_padding((3, 3, 3)))), xt, w)


if __name__ == "__main__":
    fams = sys.argv[1].split(",") if len(sys.argv) > 1 else [
        "t2", "s2", "packed", "s1",
    ]
    print("families:", fams, "| devices:", jax.devices(), flush=True)
    main(fams)
