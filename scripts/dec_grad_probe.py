"""dec_grad attribution by ablation (round-3 'remaining' #5).

The split train step's decoder-grad segment is the largest step-time block
(256.2 ms of the 569.5 ms step at b=2 128^3 — artifacts/r3/split_v2_probe.log).
This probe attributes it by compiling ablated variants of the same program
(the relay breaks jax.profiler trace capture, so component costs are
config-variant deltas, like scripts/forward_probe.py):

    full dec_grad                         (decoder+modulator+heads+full loss)
  - gen-only loss (no RnC/pred-space)   = loss-segment cost (fwd+bwd)
  - no projection heads (gen-only)      = projection-head cost
  - no modulator (gen-only, no heads)   = modulator fwd+bwd cost
  leaving the conv decoder fwd+bwd as the residual.

Variant params are zero-initialized via eval_shape (values don't change XLA
timing; structure does) so no multi-minute CPU init per variant.

    JAX_COMPILATION_CACHE_DIR=.jax_cache python scripts/dec_grad_probe.py
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


def zero_variables(model, batch):
    target = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0), batch["mri"], batch["covars"],
            batch["roi_loc"], batch["roi_std"], batch["roi_compact"],
            train=False,
        )
    )
    return jax.tree.map(
        lambda a: jnp.zeros(a.shape, a.dtype), target)


def timeit(tag, fn, args, n=8):
    def fetch(out):
        leaf = jax.tree.leaves(out)[0]
        return float(jnp.sum(leaf.astype(jnp.float32)))

    t0 = time.time()
    for attempt in range(3):
        try:
            fetch(fn(*args))
            break
        except Exception as e:  # noqa: BLE001
            if attempt == 2:
                raise
            print(f"{tag}: compile attempt {attempt+1} failed: "
                  f"{str(e)[:160]}", flush=True)
            time.sleep(15)
    compile_s = time.time() - t0
    fetch(fn(*args))  # warm past post-compile slow steps
    t0 = time.time()
    out = None
    for _ in range(n):
        out = fn(*args)
    fetch(out)
    ms = (time.time() - t0) / n * 1000
    print(f"{tag:44s} {ms:8.1f} ms  (compile {compile_s:5.1f}s)", flush=True)
    return ms


def main():
    from __graft_entry__ import _make_batch
    from coma_unet_tpu.config import LossConfig, ModelConfig
    from coma_unet_tpu.losses.composite import GenerativeContrastiveLoss
    from coma_unet_tpu.losses.roi_losses import roi_mse
    from coma_unet_tpu.models import ContraAttnUNet
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from train_step_probe import cached_flagship_variables

    cfg = ModelConfig()
    model = ContraAttnUNet(cfg)
    rng = np.random.default_rng(0)
    batch = _make_batch(rng, b=2, s=128)
    variables = cached_flagship_variables(model, batch)
    params = variables["params"]
    key = jax.random.PRNGKey(1)
    roi_w = jnp.full((36,), 225.0)
    criterion = GenerativeContrastiveLoss(LossConfig())

    enc = jax.jit(lambda p, b, r: model.apply(
        {"params": p}, b["mri"], b["covars"], train=True,
        rngs={"dropout": r}, stage="encoder"))
    feats = enc(params, batch, key)
    jax.block_until_ready(jax.tree.leaves(feats)[0])
    print("encoder feats ready", flush=True)

    def dec_grad_for(m, loss_mode, with_projections):
        def _loss(p, f, b):
            outs = m.apply(
                {"params": p}, b["mri"], b["covars"], b.get("roi_loc"),
                b.get("roi_std"), b.get("roi_compact"), train=True,
                with_projections=with_projections, rngs={"dropout": key},
                stage="decoder", encoder_feats=f,
            )
            if loss_mode == "full":
                losses = criterion(
                    outs.out, b["tau"], b["roi_compact"], roi_w,
                    rnc_features=outs.projections[-1],
                    rnc_labels=b["covars"],
                )
                return losses.total
            gen = roi_mse(outs.out, b["tau"], b["roi_compact"], roi_w,
                          reduction=None)
            return jnp.sum(gen)

        return jax.jit(jax.value_and_grad(_loss, argnums=(0, 1)))

    full = timeit("dec_grad full (heads + RnC loss)",
                  dec_grad_for(model, "full", True), (params, feats, batch))
    gen_heads = timeit("dec_grad gen-only loss (heads traced)",
                       dec_grad_for(model, "gen", True),
                       (params, feats, batch))
    gen_only = timeit("dec_grad gen-only, no heads",
                      dec_grad_for(model, "gen", False),
                      (params, feats, batch))

    nomod_model = ContraAttnUNet(
        dataclasses.replace(cfg, with_modulator=False))
    nomod_params = zero_variables(nomod_model, batch)["params"]
    nomod = timeit("dec_grad no modulator (gen-only, no heads)",
                   dec_grad_for(nomod_model, "gen", False),
                   (nomod_params, feats, batch))

    print(f"-> loss segment (RnC+pred-space): {full - gen_heads:.1f} ms | "
          f"projection heads: {gen_heads - gen_only:.1f} ms | "
          f"modulator fwd+bwd: {gen_only - nomod:.1f} ms | "
          f"conv decoder fwd+bwd residual: {nomod:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
