"""Does a bigger batch improve per-VOLUME forward latency?

The flagship forward's kernels are fetch/overhead-bound at b=2 (anatomy
probe: additive fetch+dot components, ~60% of copy roofline); a larger
batch amortizes per-dispatch and per-block overheads. The bench headline
is ms/volume, so if p50(b=4)/4 < p50(b=2)/2 the bench batch should move.

    JAX_COMPILATION_CACHE_DIR=.jax_cache python scripts/batch_probe.py
"""

import sys
import time

sys.path.insert(0, ".")

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from __graft_entry__ import _make_batch, init_on_cpu
    from coma_unet_tpu.config import ModelConfig
    from coma_unet_tpu.models import ContraAttnUNet
    from coma_unet_tpu.utils.param_cache import cached_variables

    cfg = ModelConfig()
    model = ContraAttnUNet(cfg)
    rng = np.random.default_rng(0)
    print("devices:", jax.devices(), flush=True)

    batch2 = _make_batch(rng, b=2, s=128)
    t0 = time.time()
    variables = cached_variables(model, batch2,
                                 lambda: init_on_cpu(model, batch2))
    print(f"init: {time.time()-t0:.1f}s", flush=True)

    @jax.jit
    def forward(variables, mri, covars, roi_loc, roi_std, roi_compact):
        return model.apply(
            variables, mri, covars, roi_loc, roi_std, roi_compact,
            train=False, with_projections=False,
        ).out

    for b in (2, 4):
        batch = _make_batch(rng, b=b, s=128)
        args = (variables, batch["mri"], batch["covars"], batch["roi_loc"],
                batch["roi_std"], batch["roi_compact"])
        t0 = time.time()
        float(jnp.sum(forward(*args)))
        print(f"b={b} compile+run: {time.time()-t0:.1f}s", flush=True)

        def chain(n=10):
            t0 = time.time()
            out = None
            for _ in range(n):
                out = forward(*args)
            float(jnp.sum(out))
            return (time.time() - t0) / n

        chain(2)  # warm
        lat = sorted(chain(5) for _ in range(4))
        p50 = (lat[1] + lat[2]) / 2
        print(f"b={b}: {p50*1000:7.1f} ms/call  {p50/b*1000:6.1f} ms/volume",
              flush=True)


if __name__ == "__main__":
    main()
