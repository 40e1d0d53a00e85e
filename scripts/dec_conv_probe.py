"""Per-site fwd+bwd timing of every decoder conv op at flagship shapes
(b=2, 128^3) — the attribution VERDICT r3 items 2/9 need: r3 bounded the
CondConv decoder fwd+bwd at 154.3 ms of dec_grad's 222 ms
(artifacts/r3/dec_grad_probe.log) but never located it per level.

Sites (flagship channels [32,64,128,256,512], packed 64^3 level):
  up0    t2_b   packed[2,64,..]        -> [2,32,128^3]   (Pallas t2 batched)
  up1-3  CondConv transposed           @ 32^3/16^3/8^3   (XLA per-sample unroll)
  merge0 s1 64->32 @128^3              (Pallas, 2-way channel split)
  merge1 packed 128->64                (Pallas packed kernel)
  merge2 256->128 @32^3, merge3 512->256 @16^3            (XLA)
  gate0  k=1 @128^3, gate1 packed, gate2/3 @32^3/16^3
  reduce k=1 CondConv 32->1 @128^3     (Pallas k=1 batched)

Each site is timed as (a) forward only and (b) value_and_grad of a scalar
readout, amortized over chained dispatches with one scalar fetch (the ~28 ms
relay floor, CLAUDE.md). COMA_PROBE_SITES limits to a comma list.
"""

import os
import sys
import time

sys.path.insert(0, ".")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

from coma_unet_tpu.utils.compile_cache import prune_compile_cache

prune_compile_cache()

B = 2
CH = (32, 64, 128, 256, 512)


def _mk(shape, key, dtype=jnp.bfloat16):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32
                             ).astype(dtype)


def timed(tag, fn, *args, n=10):
    try:
        t0 = time.time()
        out = fn(*args)
        leaf = jax.tree.leaves(out)[0]
        float(jnp.sum(leaf.astype(jnp.float32)))
        compile_s = time.time() - t0
        # warm until 2 consecutive sub-500ms dispatch+fetch cycles
        fast = 0
        for _ in range(30):
            t1 = time.time()
            out = fn(*args)
            float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
            if time.time() - t1 < 0.5:
                fast += 1
                if fast >= 2:
                    break
            else:
                fast = 0
        t0 = time.time()
        for _ in range(n):
            out = fn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        ms = (time.time() - t0) / n * 1000
        print(f"{tag:28s}: {ms:8.2f} ms   (compile {compile_s:.0f}s)",
              flush=True)
        return ms
    except Exception as e:  # noqa: BLE001
        print(f"{tag:28s}: FAILED {str(e)[:160]}", flush=True)
        return None


def grad_of(fn, argnums=(0, 1)):
    def g(*args):
        def scalar(*a):
            return jnp.sum(fn(*a).astype(jnp.float32))
        return jax.grad(scalar, argnums=argnums)(*args)
    return jax.jit(g)


def main():
    from coma_unet_tpu.models import blocks
    from coma_unet_tpu.ops.pallas.conv3d_strided import pack_w

    sites = {}

    # ---- up0: Pallas t2 batched (packed 64^3 -> full res) ----
    xp1 = _mk((B, 64, 32, 64, 128), 1)         # packed [B,C,D/2,H,2W] @64^3
    k_up0 = _mk((B, 32, 64, 3, 3, 3), 2)
    from coma_unet_tpu.ops.pallas.conv3d_strided import (
        pallas_conv3d_s2_b,
        pallas_conv3d_t2_b,
    )
    sites["up0_t2b"] = (jax.jit(pallas_conv3d_t2_b), (xp1, k_up0))

    # ---- up1..3: CondConv transposed, per-sample XLA unroll ----
    def up_unrolled(x, kern, strides=(2, 2, 2)):
        pad = blocks.transposed_padding((3, 3, 3), strides)
        return jnp.concatenate(
            [blocks.conv3d(x[i:i + 1], kern[i], (1, 1, 1), pad,
                           lhs_dilation=strides)
             for i in range(x.shape[0])], axis=0)

    for i, (cin, cout, s) in enumerate(
        [(128, 64, 32), (256, 128, 16), (512, 256, 8)], start=1
    ):
        x = _mk((B, cin, s, s, s), 10 + i)
        kern = _mk((B, cout, cin, 3, 3, 3), 20 + i)
        sites[f"up{i}_xla_unroll"] = (jax.jit(up_unrolled), (x, kern))

    # ---- merges ----
    def merge_s1(x, w):  # dispatch: 2-way channel-split Pallas s1 @128^3
        return blocks.conv3d(x, w, (1, 1, 1),
                             blocks.same_padding((3, 3, 3)), use_pallas=True)

    x_m0 = _mk((B, 64, 128, 128, 128), 30)
    w_m0 = _mk((32, 64, 3, 3, 3), 31)
    sites["merge0_s1split"] = (jax.jit(merge_s1), (x_m0, w_m0))

    from coma_unet_tpu.ops.pallas.conv3d_packed import pallas_conv3d_packed
    xp_m1 = _mk((B, 128, 32, 64, 128), 32)
    w_m1 = _mk((64, 128, 3, 3, 3), 33)
    sites["merge1_packed"] = (jax.jit(pallas_conv3d_packed), (xp_m1, w_m1))

    def xla_conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NCDHW", "OIDHW", "NCDHW"))

    for i, (cin, cout, s) in enumerate(
        [(256, 128, 32), (512, 256, 16)], start=2
    ):
        x = _mk((B, cin, s, s, s), 40 + i)
        w = _mk((cout, cin, 3, 3, 3), 50 + i)
        sites[f"merge{i}_xla"] = (jax.jit(xla_conv), (x, w))

    # ---- gates (3 pointwise convs + elementwise) ----
    def gate(g, x, wg, wx, wp):
        def c1(t, w):
            return jax.lax.conv_general_dilated(
                t, w, (1, 1, 1), [(0, 0)] * 3,
                dimension_numbers=("NCDHW", "OIDHW", "NCDHW"))
        a = jax.nn.relu(c1(g, wg) + c1(x, wx))
        psi = jax.nn.sigmoid(c1(a, wp).astype(jnp.float32)).astype(x.dtype)
        return x * psi

    for i, (c, s) in enumerate([(32, 128), (128, 32), (256, 16)]):
        lvl = [0, 2, 3][i]
        g = _mk((B, c, s, s, s), 60 + i)
        x = _mk((B, c, s, s, s), 70 + i)
        f_int = max(c // 2, 1)
        wg = _mk((f_int, c, 1, 1, 1), 80 + i)
        wx = _mk((f_int, c, 1, 1, 1), 90 + i)
        wp = _mk((1, f_int, 1, 1, 1), 100 + i)
        sites[f"gate{lvl}_xla"] = (
            jax.jit(lambda g_, x_, a, b_, c_: gate(g_, x_, a, b_, c_)),
            (g, x, wg, wx, wp))

    # ---- reduce: k=1 CondConv batched @128^3 ----
    from coma_unet_tpu.ops.pallas.conv3d import pallas_conv3d_b
    x_r = _mk((B, 32, 128, 128, 128), 110)
    k_r = _mk((B, 1, 32, 1, 1, 1), 111)
    sites["reduce_k1b"] = (
        jax.jit(lambda x, k: pallas_conv3d_b(x, k, 1)), (x_r, k_r))

    # ---- s2 Pallas (encoder class, for the enc_bwd picture) ----
    x_s2 = _mk((B, 32, 128, 128, 128), 120)
    k_s2 = _mk((B, 64, 32, 3, 3, 3), 121)
    sites["down0_s2b"] = (jax.jit(pallas_conv3d_s2_b), (x_s2, k_s2))

    # ---- encoder s1 sites (MFU re-attribution, VERDICT r3 item 9) ----
    x_h0 = _mk((B, 1, 128, 128, 128), 122)
    k_h0 = _mk((B, 32, 1, 3, 3, 3), 123)
    sites["head_c0_1to32_b"] = (
        jax.jit(lambda x, k: pallas_conv3d_b(x, k, 3)), (x_h0, k_h0))
    x_h1 = _mk((B, 32, 128, 128, 128), 124)
    k_h1 = _mk((B, 32, 32, 3, 3, 3), 125)
    sites["head_c1_32to32_b"] = (
        jax.jit(lambda x, k: pallas_conv3d_b(x, k, 3)), (x_h1, k_h1))
    from coma_unet_tpu.ops.pallas.conv3d_p1 import pallas_conv3d_p1_b
    sites["head_c1_32to32_p1b"] = (
        jax.jit(pallas_conv3d_p1_b), (x_h1, k_h1))
    from coma_unet_tpu.ops.pallas.conv3d_packed import pallas_conv3d_packed_b
    xp_c1 = _mk((B, 64, 32, 64, 128), 126)   # packed 64^3 level conv
    kp_c1 = _mk((B, 64, 64, 3, 3, 3), 127)
    sites["lvl1_conv_64to64_pk_b"] = (
        jax.jit(pallas_conv3d_packed_b), (xp_c1, kp_c1))

    # ---- modulator sub-ops (r3 ablated the whole block at 68.3 ms
    #      fwd+bwd, artifacts/r3/dec_grad_probe.log; locate it) ----
    from coma_unet_tpu.ops.roi import paint_roi_values

    def mod_paint(x, out, roi_compact, loc, std, prompt):
        suvr = paint_roi_values(roi_compact, loc)[:, None]
        sal = paint_roi_values(roi_compact, std)[:, None]
        mask = x >= 1e-4
        suvr = jnp.where(mask, suvr, 0.0)
        sal = jnp.where(mask, sal, 0.0)
        return jnp.concatenate(
            [prompt * jnp.ones_like(out), sal.astype(out.dtype),
             suvr.astype(out.dtype)], axis=1)

    x_in = _mk((B, 1, 128, 128, 128), 130)
    out_t = _mk((B, 1, 128, 128, 128), 131)
    rc = jnp.asarray(
        np.random.default_rng(7).integers(0, 37, (B, 128, 128, 128)),
        jnp.int32)
    loc = _mk((B, 36), 132, jnp.float32)
    stdv = _mk((B, 36), 133, jnp.float32)
    prm = _mk((1, 1, 128, 128, 128), 134)
    sites["mod_paint_concat"] = (
        jax.jit(mod_paint), (x_in, out_t, rc, loc, stdv, prm))

    def conv_norm_act(x, w):  # Convolution(leakyrelu, instance) semantics
        y = blocks.conv3d(x, w, (1, 1, 1), blocks.same_padding((3, 3, 3)),
                          use_pallas=True)
        xf = y.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(2, 3, 4), keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=(2, 3, 4), keepdims=True)
        y = (y - mean.astype(y.dtype)) * jax.lax.rsqrt(
            var + 1e-5).astype(y.dtype)
        return jax.nn.leaky_relu(y, 1e-2)

    for cin, cout, tag in ((3, 16, "mod_c0"), (16, 16, "mod_c1"),
                           (16, 1, "mod_c2"), (2, 8, "fus_c0"),
                           (8, 8, "fus_c1"), (8, 1, "fus_c2")):
        x = _mk((B, cin, 128, 128, 128), 140 + cin * 7 + cout)
        w = _mk((cout, cin, 3, 3, 3), 150 + cin * 7 + cout, jnp.float32)
        sites[f"{tag}_{cin}to{cout}"] = (jax.jit(conv_norm_act), (x, w))

    only = os.environ.get("COMA_PROBE_SITES")
    if only:
        keep = set(only.split(","))
        sites = {k: v for k, v in sites.items() if k in keep}

    print(f"devices: {jax.devices()}", flush=True)
    results = {}
    for tag, (fn, args) in sites.items():
        fwd = timed(f"{tag} fwd", fn, *args)
        bwd = timed(f"{tag} fwd+bwd", grad_of(fn), *args)
        results[tag] = (fwd, bwd)
    print("\nsummary (fwd / fwd+bwd ms):", flush=True)
    for tag, (f, b) in results.items():
        fs = "-" if f is None else f"{f:7.2f}"
        bs = "-" if b is None else f"{b:7.2f}"
        print(f"  {tag:24s} {fs} / {bs}", flush=True)


if __name__ == "__main__":
    main()
