"""Hardware A/B of the p1 tap-stacking variants (COMA_P1_STACK=9/3/1) at
the flagship's hot stride-1 128^3 sites (VERDICT r4 item 2: merge0 /
head_c1 / modulator convs are shift-bound at ~4x their MXU time, and p1's
shifted-bytes halving measured ZERO net win — the remaining per-tap cost
is the full-size f32 accumulator round-trip, which stacking the taps
along K removes).

    python scripts/s1_stack_probe.py [9,3,1]

Sites (b=2, 128^3):
  head_c1  batched CondConv 32->32   (9.4 / 17.5 ms r4, dec_conv_probe)
  merge0h  plain 32->32 chunk        (merge0 = 2 such chunks: 18.8 / 30.9)
  mod16    plain 16->16              (modulator fusion-stack class)
  head_c0  batched 1->32             (5.0 / 11.5)

Each (site, stack) is timed fwd and fwd+bwd (value_and_grad through the
custom VJP), amortized over chained dispatches with one scalar fetch
(~28 ms relay floor, CLAUDE.md). `jax.clear_caches()` between stack modes
forces retracing under the new env.
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

from coma_unet_tpu.utils.compile_cache import prune_compile_cache

prune_compile_cache()


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
        print(f"{tag:26s}: {ms:8.2f} ms   (compile {compile_s:.0f}s)",
              flush=True)
        return ms
    except Exception as e:  # noqa: BLE001
        print(f"{tag:26s}: FAILED {str(e)[:160]}", flush=True)
        return None


def main():
    modes = (sys.argv[1] if len(sys.argv) > 1 else "9,3,1").split(",")
    B, S = 2, 128
    print("devices:", jax.devices(), flush=True)
    sites = {
        "head_c1": (_mk((B, 32, S, S, S), 1),
                    _mk((B, 32, 32, 3, 3, 3), 2, jnp.float32) * 0.05, True),
        "merge0h": (_mk((B, 32, S, S, S), 3),
                    _mk((32, 32, 3, 3, 3), 4, jnp.float32) * 0.05, False),
        "mod16": (_mk((B, 16, S, S, S), 5),
                  _mk((16, 16, 3, 3, 3), 6, jnp.float32) * 0.05, False),
        "head_c0": (_mk((B, 1, S, S, S), 7),
                    _mk((B, 32, 1, 3, 3, 3), 8, jnp.float32) * 0.05, True),
        # k=1 sites (stack-invariant; probe the r5 D-tiled pointwise
        # kernels — r4 baselines: reduce_k1b 7.3 fwd / gate-class k1)
        "k1_32": (_mk((B, 32, S, S, S), 9),
                  _mk((32, 32, 1, 1, 1), 10, jnp.float32) * 0.05, False),
        "k1_reduce": (_mk((B, 32, S, S, S), 11),
                      _mk((B, 1, 32, 1, 1, 1), 12, jnp.float32) * 0.05,
                      True),
    }
    only = os.environ.get("COMA_PROBE_SITES")
    if only:
        sites = {k: v for k, v in sites.items() if k in only.split(",")}
    for mode in modes:
        os.environ["COMA_P1_STACK"] = mode
        jax.clear_caches()
        from coma_unet_tpu.ops.pallas.conv3d_p1 import (  # noqa: PLC0415
            pallas_conv3d_p1,
            pallas_conv3d_p1_b,
        )

        print(f"\n== COMA_P1_STACK={mode} ==", flush=True)
        for name, (x, w, batched) in sites.items():
            if w.shape[-1] == 1:  # k=1 site
                from coma_unet_tpu.ops.pallas.conv3d import (  # noqa: PLC0415
                    pallas_conv3d,
                    pallas_conv3d_b,
                )

                base = pallas_conv3d_b if batched else pallas_conv3d
                op = lambda a, b_, _o=base: _o(a, b_, 1)  # noqa: E731
            else:
                op = pallas_conv3d_p1_b if batched else pallas_conv3d_p1
            fwd = jax.jit(op)
            timed(f"{name} s{mode} fwd", fwd, x, w)

            def scalar(a, b_, op_=op):
                return jnp.sum(op_(a, b_).astype(jnp.float32))

            vg = jax.jit(jax.value_and_grad(scalar, argnums=(0, 1)))
            timed(f"{name} s{mode} fwd+bwd", vg, x, w)


if __name__ == "__main__":
    main()
