"""Test whether buffer DONATION is what the degraded r4 compile helper
rejects on large modules (every failing compile this round had
donate_argnums set; every success — bisect dec/update, the inference
forward — did not).

    python scripts/donate_compile_ladder.py small   # tiny module +donate
    python scripts/donate_compile_ladder.py fold    # enc_bwd_update +donate
    python scripts/donate_compile_ladder.py fold0   # same, no donate (ctrl)
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


def run(tag, fn, args):
    t0 = time.time()
    try:
        fn.lower(*args).compile()
        print(f"{tag}: COMPILE_OK {time.time()-t0:.1f}s", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{tag}: COMPILE_FAILED {time.time()-t0:.1f}s "
              f"{str(e)[:200]}", flush=True)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "small"
    if mode in ("dec", "dec0"):
        dec_mode(mode == "dec")
        return
    if mode == "small":
        from coma_unet_tpu.ops.pallas.conv3d import pallas_conv3d

        def f(x, w):
            return pallas_conv3d(x * 2.0, w, 1) + 1.0

        x = jax.ShapeDtypeStruct((2, 8, 8, 16, 128), jnp.bfloat16)
        w = jax.ShapeDtypeStruct((8, 8, 1, 1, 1), jnp.bfloat16)
        run("small+donate", jax.jit(f, donate_argnums=(0,)), (x, w))
        return

    from __graft_entry__ import _make_batch
    from coma_unet_tpu.config import ModelConfig
    from coma_unet_tpu.models import ContraAttnUNet
    from coma_unet_tpu.train import make_optimizer
    from coma_unet_tpu.train.state import TrainState
    from coma_unet_tpu.train.step import optax_global_norm

    model = ContraAttnUNet(ModelConfig())
    import dataclasses

    model = ContraAttnUNet(dataclasses.replace(model.config, remat=False))
    batch = _make_batch(np.random.default_rng(0), b=2, s=128)
    batch_abs = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.asarray(a).shape,
                                       np.asarray(a).dtype), dict(batch))
    var_abs = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0), batch["mri"], batch["covars"],
            batch["roi_loc"], batch["roi_std"], batch["roi_compact"],
            train=False,
        ))
    params_abs = var_abs["params"]
    rng_abs = jax.ShapeDtypeStruct((2,), jnp.uint32)

    def _enc(params, b, rng):
        return model.apply(
            {"params": params}, b["mri"], b["covars"],
            train=True, rngs={"dropout": rng}, stage="encoder",
        )

    feats_abs = jax.eval_shape(_enc, params_abs, batch_abs, rng_abs)
    tx = make_optimizer(1e-3)
    opt_abs = jax.eval_shape(tx.init, params_abs)
    state_abs = TrainState(
        step=jax.ShapeDtypeStruct((), jnp.int32), params=params_abs,
        opt_state=opt_abs, batch_stats={}, tx=tx,
    )

    def _enc_bwd_update(state, b, rng, g_feats, g_dec):
        _, vjp_fn = jax.vjp(lambda p: _enc(p, b, rng), state.params)
        g_enc = vjp_fn(g_feats)[0]
        grads = jax.tree.map(jnp.add, g_dec, g_enc)
        new_state = state.apply_gradients(grads)
        if mode == "foldpin":
            from coma_unet_tpu.train.step import _pin_default_layouts
            new_state = _pin_default_layouts(new_state)
        gn = optax_global_norm(grads)
        return new_state, (gn,)

    donate = (0, 3, 4) if mode in ("fold", "foldpin") else ()
    run(f"enc_bwd_update donate={bool(donate)}",
        jax.jit(_enc_bwd_update, donate_argnums=donate),
        (state_abs, batch_abs, rng_abs, feats_abs, params_abs))




def dec_mode(donate: bool):
    """value_and_grad(_dec_loss) with/without feats donation (the probe's
    dec_grad segment)."""
    from __graft_entry__ import _make_batch
    from coma_unet_tpu.config import LossConfig, ModelConfig
    from coma_unet_tpu.losses.composite import GenerativeContrastiveLoss
    from coma_unet_tpu.models import ContraAttnUNet
    import dataclasses

    model = ContraAttnUNet(
        dataclasses.replace(ModelConfig(), remat=False))
    batch = _make_batch(np.random.default_rng(0), b=2, s=128)
    batch_abs = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.asarray(a).shape,
                                       np.asarray(a).dtype), dict(batch))
    var_abs = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0), batch["mri"], batch["covars"],
            batch["roi_loc"], batch["roi_std"], batch["roi_compact"],
            train=False,
        ))
    params_abs = var_abs["params"]
    rng_abs = jax.ShapeDtypeStruct((2,), jnp.uint32)

    def _enc(params, b, rng):
        return model.apply(
            {"params": params}, b["mri"], b["covars"],
            train=True, rngs={"dropout": rng}, stage="encoder",
        )

    feats_abs = jax.eval_shape(_enc, params_abs, batch_abs, rng_abs)
    criterion = GenerativeContrastiveLoss(LossConfig())

    def _dec_loss(params, feats, b, roi_weights, rng, voxel_weights):
        outs = model.apply(
            {"params": params}, b["mri"], b["covars"],
            b.get("roi_loc"), b.get("roi_std"), b.get("roi_compact"),
            train=True, with_projections=True, rngs={"dropout": rng},
            stage="decoder", encoder_feats=feats,
        )
        losses = criterion(
            outs.out, b["tau"], b["roi_compact"], roi_weights,
            rnc_features=outs.projections[-1], rnc_labels=b["covars"],
            voxel_weights=voxel_weights, valid=b.get("valid_mask"),
        )
        return losses.total, {"loss": losses.total}

    fn = jax.jit(jax.value_and_grad(_dec_loss, argnums=(0, 1), has_aux=True),
                 donate_argnums=(1,) if donate else ())
    roi_abs = jax.ShapeDtypeStruct((36,), jnp.float32)
    run(f"dec_grad donate={donate}", fn,
        (params_abs, feats_abs, batch_abs, roi_abs, rng_abs, None))


if __name__ == "__main__":
    main()
