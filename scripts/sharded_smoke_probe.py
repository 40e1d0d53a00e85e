"""Single-chip hardware smoke of the SHARDED split train step (VERDICT r3
item 8): run `make_sharded_split_train_step` on a data=1 mesh on the real
TPU for a few steps — the cheapest way to hardware-evidence the shard_map +
per-segment-policy composition without multi-chip. Expected: steady-state
step time ~= the unsharded split step (~280 ms b=2, BENCH_AUX r3); loss
finite and matching the unsharded trajectory class.

    JAX_COMPILATION_CACHE_DIR=.jax_cache python scripts/sharded_smoke_probe.py [n=5]
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


def main():
    from __graft_entry__ import _make_batch, init_on_cpu
    from coma_unet_tpu.config import LossConfig, ModelConfig
    from coma_unet_tpu.models import ContraAttnUNet
    from coma_unet_tpu.parallel.mesh import (
        make_mesh,
        make_sharded_split_train_step,
        shard_batch,
    )
    from coma_unet_tpu.train import create_train_state, make_optimizer
    from coma_unet_tpu.utils.param_cache import cached_variables

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    print("devices:", jax.devices(), flush=True)
    mesh = make_mesh(data=1)
    print("mesh:", mesh, flush=True)
    cfg = ModelConfig()
    model = ContraAttnUNet(cfg)
    rng = np.random.default_rng(0)
    batch = _make_batch(rng, b=2, s=128)
    variables = cached_variables(model, batch,
                                 lambda: init_on_cpu(model, batch))
    state = create_train_state(
        model, make_optimizer(1e-3), jax.random.PRNGKey(0),
        (batch["mri"], batch["covars"], batch["roi_loc"], batch["roi_std"],
         batch["roi_compact"]),
        {"train": True}, variables=variables,
    )
    step = make_sharded_split_train_step(model, LossConfig(), mesh,
                                         donate=True)
    sbatch = shard_batch(batch, mesh)
    roi_w = jnp.full((36,), 225.0)

    t0 = time.time()
    state, aux = step(state, sbatch, roi_w, jax.random.PRNGKey(1))
    loss0 = float(aux["loss"])
    print(f"sharded(data=1) first step: {time.time()-t0:.1f}s "
          f"loss={loss0:.4f}", flush=True)

    warm_ms, fast = [], 0
    for i in range(40):
        t1 = time.time()
        state, aux = step(state, sbatch, roi_w, jax.random.PRNGKey(100 + i))
        float(aux["loss"])
        dt = time.time() - t1
        warm_ms.append(round(dt * 1000, 1))
        fast = fast + 1 if dt < 2.0 else 0
        if fast >= 2:
            break
    print(f"warm-up steps (ms): {warm_ms}", flush=True)

    t0 = time.time()
    for i in range(n):
        state, aux = step(state, sbatch, roi_w, jax.random.PRNGKey(i))
    loss = float(aux["loss"])
    per = (time.time() - t0) / n
    print(f"sharded(data=1) step (b=2): {per*1000:.1f} ms "
          f"({2/per:.2f} samples/s), loss={loss:.4f}", flush=True)
    print("SHARDED_SMOKE OK", flush=True)


if __name__ == "__main__":
    main()
