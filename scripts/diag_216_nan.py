"""Localize the 216^3 train-step NaN (probe_216 r3: step runs, loss=nan).

Runs the flagship at 216^3 and prints finiteness/absmax per stage:
encoder feats per level, decoder outputs, loss aux terms — under the
current kernel env (COMA_PHASE_DOT / COMA_PALLAS_DISABLE), so variants
bisect which lowering family introduces the NaN.

    JAX_COMPILATION_CACHE_DIR=.jax_cache python scripts/diag_216_nan.py
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

S = int(os.environ.get("COMA_DIAG_S", "216"))


def stats(tag, t):
    leaves = jax.tree.leaves(t)
    for i, a in enumerate(leaves):
        a32 = a.astype(jnp.float32)
        frac = float(jnp.mean(jnp.isfinite(a32)))
        mx = float(jnp.max(jnp.abs(jnp.where(jnp.isfinite(a32), a32, 0.0))))
        print(f"  {tag}[{i}] shape={a.shape} finite={frac:.4f} "
              f"absmax={mx:.3e}", flush=True)


def main():
    from __graft_entry__ import _make_batch
    from coma_unet_tpu.config import LossConfig, ModelConfig
    from coma_unet_tpu.models import ContraAttnUNet
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from train_step_probe import cached_flagship_variables

    print("env: COMA_PHASE_DOT=", os.environ.get("COMA_PHASE_DOT"),
          "COMA_PALLAS_DISABLE=", os.environ.get("COMA_PALLAS_DISABLE"),
          "S=", S, flush=True)
    cfg = ModelConfig(prompt_shape=(S, S, S))
    model = ContraAttnUNet(cfg)
    rng = np.random.default_rng(0)
    batch = _make_batch(rng, b=1, s=S)
    variables = cached_flagship_variables(model, batch)
    params = variables["params"]

    from coma_unet_tpu.train.step import train_remat_variant

    m = train_remat_variant(model, True)

    @jax.jit
    def enc(params, mri, cov):
        return m.apply({"params": params}, mri, cov, train=True,
                       rngs={"dropout": jax.random.PRNGKey(0)},
                       stage="encoder")

    t0 = time.time()
    feats = enc(params, batch["mri"], batch["covars"])
    stats("feat", feats)
    print(f"encoder: {time.time()-t0:.1f}s", flush=True)

    @jax.jit
    def dec(params, feats, mri, cov, loc, std, compact):
        outs = m.apply({"params": params}, mri, cov, loc, std, compact,
                       train=True, with_projections=True,
                       rngs={"dropout": jax.random.PRNGKey(0)},
                       stage="decoder", encoder_feats=feats)
        return outs.out, outs.projections

    t0 = time.time()
    out, projs = dec(params, feats, batch["mri"], batch["covars"],
                     batch["roi_loc"], batch["roi_std"],
                     batch["roi_compact"])
    stats("out", out)
    stats("proj", projs)
    print(f"decoder: {time.time()-t0:.1f}s", flush=True)

    from coma_unet_tpu.losses.composite import GenerativeContrastiveLoss

    criterion = GenerativeContrastiveLoss(LossConfig(roi_weight=1.0))

    @jax.jit
    def loss_terms(out, projs, tau, compact, covars):
        losses = criterion(out, tau, compact, jnp.full((36,), 1.0),
                           rnc_features=projs[-1], rnc_labels=covars)
        return {"total": losses.total, "gen": losses.gen,
                "pred_space": losses.pred_space, "tcds": losses.tcds}

    terms = loss_terms(out, projs, batch["tau"], batch["roi_compact"],
                       batch["covars"])
    for k, v in terms.items():
        print(f"  loss {k}: {np.asarray(v)}", flush=True)


if __name__ == "__main__":
    main()
