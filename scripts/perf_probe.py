"""On-TPU performance probe: amortized timings for the flagship forward /
train step and ablations. Run from the repo root:

    JAX_COMPILATION_CACHE_DIR=.jax_cache python scripts/perf_probe.py

Timing protocol (see CLAUDE.md): the remote relay adds ~28 ms per
dispatch+fetch cycle and `block_until_ready` returns early, so every number
is amortized over n chained async dispatches ended by one scalar fetch.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _make_batch, init_on_cpu
from coma_unet_tpu.config import LossConfig, ModelConfig
from coma_unet_tpu.models import ContraAttnUNet
from coma_unet_tpu.train import (
    create_train_state,
    make_optimizer,
    make_train_step,
)


def measure_fwd(tag, cfg, batch, n=6):
    model = ContraAttnUNet(cfg)
    variables = init_on_cpu(model, batch)

    @jax.jit
    def fwd(v, m, c, l, s_, r):
        return model.apply(v, m, c, l, s_, r, train=False,
                           with_projections=False).out

    args = (variables, batch["mri"], batch["covars"], batch["roi_loc"],
            batch["roi_std"], batch["roi_compact"])
    t0 = time.time()
    float(jnp.sum(fwd(*args)))
    compile_s = time.time() - t0
    t0 = time.time()
    out = None
    for _ in range(n):
        out = fwd(*args)
    float(jnp.sum(out))
    print(f"{tag:40s} ~{(time.time()-t0)/n*1000:7.1f} ms "
          f"(compile {compile_s:.0f}s)", flush=True)


def main():
    rng = np.random.default_rng(0)
    batch = _make_batch(rng, b=2, s=128)
    measure_fwd("flagship", ModelConfig(), batch)
    measure_fwd("no modulator", ModelConfig(with_modulator=False), batch)
    measure_fwd("unconditional, no modulator",
                ModelConfig(conditional=False, with_modulator=False), batch)
    measure_fwd("XLA convs only", ModelConfig(pallas_convs=False), batch)

    cfg = ModelConfig()
    model = ContraAttnUNet(cfg)
    tx = make_optimizer(1e-3)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0),
        (batch["mri"], batch["covars"], batch["roi_loc"], batch["roi_std"],
         batch["roi_compact"]),
        {"train": True},
    )
    step = make_train_step(model, LossConfig(), donate=False)
    roi_w = jnp.full((36,), 225.0)
    t0 = time.time()
    state, aux = step(state, batch, roi_w, jax.random.PRNGKey(1))
    print(f"train compile {time.time()-t0:.0f}s", flush=True)
    n = 5
    t0 = time.time()
    for i in range(n):
        state, aux = step(state, batch, roi_w, jax.random.PRNGKey(i))
    loss = float(aux["loss"])
    print(f"train step ~{(time.time()-t0)/n*1000:.1f} ms  loss={loss:.2f}",
          flush=True)


if __name__ == "__main__":
    main()
