"""A/B compile of the dec_bwd_update segment with the layout pin on/off.

The r4 layout-pin fix (bare Layout) traces cleanly but the production
train-step probe died 3x with `tpu_compile_helper subprocess exit code 1`
(deterministic — not the load-dependent SIGKILL class). This AOT-compiles
ONLY the merged segment from abstract inputs under COMA_PIN_LAYOUTS as set
in the env, printing COMPILE_OK or the full backend error.

    COMA_PIN_LAYOUTS=0 python scripts/pin_compile_ab.py
    COMA_PIN_LAYOUTS=1 python scripts/pin_compile_ab.py
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


def main():
    from __graft_entry__ import _make_batch
    from coma_unet_tpu.config import LossConfig, ModelConfig
    from coma_unet_tpu.models import ContraAttnUNet
    from coma_unet_tpu.train import make_optimizer
    from coma_unet_tpu.train.state import TrainState
    from coma_unet_tpu.train.step import make_split_train_step

    print("COMA_PIN_LAYOUTS =", os.environ.get("COMA_PIN_LAYOUTS", "1"),
          flush=True)
    model = ContraAttnUNet(ModelConfig())
    batch = _make_batch(np.random.default_rng(0), b=2, s=128)
    batch_abs = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.asarray(a).shape,
                                       np.asarray(a).dtype), dict(batch))
    var_abs = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0), batch["mri"], batch["covars"],
            batch["roi_loc"], batch["roi_std"], batch["roi_compact"],
            train=False,
        )
    )
    params_abs = var_abs["params"]
    tx = make_optimizer(1e-3)
    opt_abs = jax.eval_shape(tx.init, params_abs)
    state_abs = TrainState(
        step=jax.ShapeDtypeStruct((), jnp.int32), params=params_abs,
        opt_state=opt_abs, batch_stats={}, tx=tx,
    )
    step = make_split_train_step(model, LossConfig(), donate=True)
    segs = step.segments
    rng_abs = jax.ShapeDtypeStruct((2,), jnp.uint32)
    feats_abs = jax.eval_shape(
        segs["enc_fwd"].jitted, params_abs, batch_abs, rng_abs
    )
    roi_abs = jax.ShapeDtypeStruct((36,), jnp.float32)
    t0 = time.time()
    try:
        segs["dec_bwd_update"].jitted.lower(
            state_abs, feats_abs, batch_abs, roi_abs, rng_abs, None
        ).compile()
        print(f"COMPILE_OK {time.time()-t0:.1f}s", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"COMPILE_FAILED after {time.time()-t0:.1f}s:\n{e}",
              flush=True)


if __name__ == "__main__":
    main()
