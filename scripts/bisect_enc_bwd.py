"""Bisect the enc_bwd compile crash: AOT-lower+compile ONLY the encoder
fwd+bwd program (the `enc_bwd_update` segment minus the optimizer update)
from abstract inputs — no param init, no execution — under the current
kernel-family env switches.

    COMA_NORM_FUSED=0 COMA_PALLAS_DISABLE=p1 python scripts/bisect_enc_bwd.py

Prints COMPILE_OK <seconds> or the raised error. One remote-compile call
per run, so each family toggle is one cheap process.
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
    from coma_unet_tpu.config import ModelConfig
    from coma_unet_tpu.models import ContraAttnUNet

    print("env:",
          {k: v for k, v in os.environ.items() if k.startswith("COMA_")},
          flush=True)
    cfg = ModelConfig()
    if os.environ.get("BISECT_REMAT", "0") != "1":
        # match make_split_train_step's default trace (block remat OFF,
        # train/step.py:train_remat_variant)
        import dataclasses

        cfg = dataclasses.replace(cfg, remat=False)
    model = ContraAttnUNet(cfg)
    rng = np.random.default_rng(0)
    batch = _make_batch(rng, b=2, s=128)
    batch_abs = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), batch
    )

    t0 = time.time()
    var_abs = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0), batch["mri"], batch["covars"],
            batch["roi_loc"], batch["roi_std"], batch["roi_compact"],
            train=False,
        )
    )
    params_abs = var_abs["params"]
    print(f"abstract params ({time.time()-t0:.1f}s)", flush=True)

    def _enc(params, b, rng):
        return model.apply(
            {"params": params}, b["mri"], b["covars"],
            train=True, rngs={"dropout": rng}, stage="encoder",
        )

    t0 = time.time()
    feats_abs = jax.eval_shape(
        _enc, params_abs, batch_abs, jax.ShapeDtypeStruct((2,), jnp.uint32)
    )
    print(f"abstract feats ({time.time()-t0:.1f}s):",
          [f.shape for f in feats_abs], flush=True)

    rng_abs = jax.ShapeDtypeStruct((2,), jnp.uint32)
    mode = sys.argv[1] if len(sys.argv) > 1 else "bwd"
    if mode == "enc":
        fn = jax.jit(_enc)
        args = (params_abs, batch_abs, rng_abs)
    elif mode == "dec":
        from coma_unet_tpu.config import LossConfig
        from coma_unet_tpu.losses.composite import GenerativeContrastiveLoss

        criterion = GenerativeContrastiveLoss(LossConfig())

        def _dec_loss(params, b, feats, roi_weights, rng):
            outs = model.apply(
                {"params": params}, b["mri"], b["covars"],
                b.get("roi_loc"), b.get("roi_std"), b.get("roi_compact"),
                train=True, with_projections=True, rngs={"dropout": rng},
                stage="decoder", encoder_feats=feats,
            )
            losses = criterion(
                outs.out, b["tau"], b["roi_compact"], roi_weights,
                rnc_features=outs.projections[-1], rnc_labels=b["covars"],
                voxel_weights=None, valid=b.get("valid_mask"),
            )
            return losses.total, {"loss": losses.total}

        fn = jax.jit(jax.value_and_grad(_dec_loss, argnums=(0, 2),
                                        has_aux=True))
        roi_abs = jax.ShapeDtypeStruct((36,), jnp.float32)
        args = (params_abs, batch_abs, feats_abs, roi_abs, rng_abs)
    elif mode == "bwd":
        def _enc_bwd(params, b, rng, g_feats):
            _, vjp_fn = jax.vjp(lambda p: _enc(p, b, rng), params)
            return vjp_fn(g_feats)[0]

        fn = jax.jit(_enc_bwd)
        args = (params_abs, batch_abs, rng_abs, feats_abs)
    else:
        # the exact folded enc_bwd_update: AdamW update + donation, with
        # abstract decoder grads (same pytree as params) and a real
        # TrainState built from abstract leaves
        from coma_unet_tpu.train import create_train_state, make_optimizer
        from coma_unet_tpu.train.step import optax_global_norm

        tx = make_optimizer(1e-3)
        opt_abs = jax.eval_shape(tx.init, params_abs)
        from coma_unet_tpu.train.state import TrainState

        state_abs = TrainState(
            step=jax.ShapeDtypeStruct((), jnp.int32), params=params_abs,
            opt_state=opt_abs, batch_stats={}, tx=tx,
        )

        def _enc_bwd_update(state, b, rng, g_feats, g_dec):
            _, vjp_fn = jax.vjp(lambda p: _enc(p, b, rng), state.params)
            g_enc = vjp_fn(g_feats)[0]
            grads = jax.tree.map(jnp.add, g_dec, g_enc)
            new_state = state.apply_gradients(grads)
            gn = optax_global_norm(grads)
            return new_state, (gn,)

        donate = (0, 3, 4) if mode == "fold_donate" else ()
        fn = jax.jit(_enc_bwd_update, donate_argnums=donate)
        args = (state_abs, batch_abs, rng_abs, feats_abs, params_abs)

    t0 = time.time()
    lowered = fn.lower(*args)
    print(f"lowered {mode} ({time.time()-t0:.1f}s)", flush=True)
    if os.environ.get("BISECT_DUMP"):
        txt = lowered.as_text()
        with open(os.environ["BISECT_DUMP"], "w") as f:
            f.write(txt)
        print(f"dumped {len(txt)} chars", flush=True)
        return
    t0 = time.time()
    lowered.compile()
    print(f"COMPILE_OK {time.time()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
