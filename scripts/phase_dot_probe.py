"""Wide strided-conv lowering shootout on the chip (216^3 shapes).

probe_216 with phase-dot everywhere showed the einsum formulation makes
XLA relayout the stacked operands channel-minor (615 MB x ~20 remat copies
at up0 -> dec_grad OOM) — the contraction dims (tap, channel) are not
minor in the natural NCDHW layout. This probe times (amortized, fwd and
fwd+vjp) and memory-profiles each candidate lowering so dispatch wires
the measured winner per op:

    s2: XLA conv | phase-dot stacked einsum | space-to-depth k=2 conv
    t2: XLA conv | phase-dot stacked einsum | space-to-depth k=2 conv

    JAX_COMPILATION_CACHE_DIR=.jax_cache python scripts/phase_dot_probe.py
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

from coma_unet_tpu.models.blocks import same_padding, transposed_padding
from coma_unet_tpu.ops import phase_dot

DIMNUMS = ("NCDHW", "OIDHW", "NCDHW")


def xla_s2(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (2, 2, 2), same_padding((3, 3, 3)), dimension_numbers=DIMNUMS)


def xla_t2(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), transposed_padding((3, 3, 3), (2, 2, 2)),
        lhs_dilation=(2, 2, 2), dimension_numbers=DIMNUMS)


def timeit(tag, fn, args, n=10):
    f = jax.jit(fn)
    try:
        compiled = f.lower(*args).compile()
        m = compiled.memory_analysis()
        gb = 1024 ** 3
        t0 = time.time()
        float(jnp.sum(jax.tree.leaves(f(*args))[0].astype(jnp.float32)))
        first = time.time() - t0
        for _ in range(2):
            f(*args)
        t0 = time.time()
        out = None
        for _ in range(n):
            out = f(*args)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        ms = (time.time() - t0) / n * 1000
        print(f"{tag:34s} {ms:8.2f} ms  temps {m.temp_size_in_bytes/gb:5.2f} "
              f"GB  (first {first:.1f}s)", flush=True)
        return ms
    except Exception as e:  # noqa: BLE001
        print(f"{tag:34s} FAILED: {str(e)[:160]}", flush=True)
        return None


def vjp_of(fn):
    def f(x, w):
        y, vjp = jax.vjp(fn, x, w)
        return vjp(y)  # cotangent with the output's own stats — fine for perf
    return f


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    for (c, co, s), tag in [((32, 64, 216), "s2 L0"),
                            ((16, 32, 216), "s2 L0w16")]:
        x = jnp.asarray(rng.normal(size=(1, c, s, s, s)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(co, c, 3, 3, 3)), jnp.bfloat16)
        timeit(f"{tag} xla fwd", xla_s2, (x, w))
        timeit(f"{tag} pd-einsum fwd", phase_dot.phase_dot_s2, (x, w))
        timeit(f"{tag} pd-std fwd", phase_dot.phase_dot_s2_std, (x, w))
        timeit(f"{tag} xla fwd+vjp", vjp_of(xla_s2), (x, w))
        timeit(f"{tag} pd-einsum fwd+vjp",
               vjp_of(phase_dot.phase_dot_s2), (x, w))
        timeit(f"{tag} pd-std fwd+vjp",
               vjp_of(phase_dot.phase_dot_s2_std), (x, w))

    for (c, co, s), tag in [((64, 32, 108), "t2 up0")]:
        x = jnp.asarray(rng.normal(size=(1, c, s, s, s)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(co, c, 3, 3, 3)), jnp.bfloat16)
        timeit(f"{tag} xla fwd", xla_t2, (x, w))
        timeit(f"{tag} pd-einsum fwd", phase_dot.phase_dot_t2, (x, w))
        timeit(f"{tag} pd-std fwd", phase_dot.phase_dot_t2_std, (x, w))
        timeit(f"{tag} xla fwd+vjp", vjp_of(xla_t2), (x, w))
        timeit(f"{tag} pd-einsum fwd+vjp",
               vjp_of(phase_dot.phase_dot_t2), (x, w))
        timeit(f"{tag} pd-std fwd+vjp",
               vjp_of(phase_dot.phase_dot_t2_std), (x, w))


if __name__ == "__main__":
    main()
