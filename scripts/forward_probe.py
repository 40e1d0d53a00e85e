"""Serving-forward attribution by ablation (the relay breaks jax.profiler
trace capture, so component costs are measured as config-variant deltas):

    full flagship forward  -  modulator-off  =  modulator cost
    modulator-off          -  backbone-only  =  attention-gate/head cost

    JAX_COMPILATION_CACHE_DIR=.jax_cache python scripts/forward_probe.py

Timing protocol per CLAUDE.md: amortized chains (n dispatches, one scalar
fetch), bf16, b=2 128^3. VERDICT r2 weak #1: the ~34 ms modulator
elementwise/norm residue was never profiled post-wiring — this is that
measurement.
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, ".")

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

import jax

from coma_unet_tpu.utils.compile_cache import prune_compile_cache

prune_compile_cache()  # big-entry ingest has a slow tail; keep small hits (see util)
import jax.numpy as jnp
import numpy as np


def timeit(tag, fn, args, n=10):
    t0 = time.time()
    float(jnp.sum(fn(*args)))
    compile_s = time.time() - t0
    for _ in range(2):
        fn(*args)
    t0 = time.time()
    out = None
    for _ in range(n):
        out = fn(*args)
    float(jnp.sum(out))
    ms = (time.time() - t0) / n * 1000
    print(f"{tag:40s} {ms:8.2f} ms  (compile {compile_s:5.1f}s)", flush=True)
    return ms


def main():
    from __graft_entry__ import _make_batch
    from coma_unet_tpu.config import ModelConfig
    from coma_unet_tpu.models import ContraAttnUNet
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from train_step_probe import cached_flagship_variables

    cfg = ModelConfig()
    model = ContraAttnUNet(cfg)
    rng = np.random.default_rng(0)
    batch = _make_batch(rng, b=2, s=128)
    variables = cached_flagship_variables(model, batch)
    args = (variables, batch["mri"], batch["covars"], batch["roi_loc"],
            batch["roi_std"], batch["roi_compact"])

    def fwd_for(m, with_projections):
        @jax.jit
        def f(v, mri, cov, loc, std, compact):
            return m.apply(v, mri, cov, loc, std, compact, train=False,
                           with_projections=with_projections).out

        return f

    full = timeit("full forward (mod + projections)",
                  fwd_for(model, True), args)
    serve = timeit("serving forward (mod, no projections)",
                   fwd_for(model, False), args)
    nomod = timeit(
        "no modulator",
        fwd_for(ContraAttnUNet(dataclasses.replace(cfg, with_modulator=False)),
                False), args)
    print(f"-> modulator cost: {serve - nomod:.1f} ms | "
          f"projection heads: {full - serve:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
