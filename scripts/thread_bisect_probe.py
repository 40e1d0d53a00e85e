"""Bisect WHY the full split train step thrashes (~8-18 s/step) while the
bare 2-program alternation runs at the sum of segment solos (~280 ms).

Per-step deltas between the two loops, isolated one at a time on the same
warmed executables (merged 2-program step, b=2 128^3):

  A. alternation baseline — static inputs, outputs dropped (known fast)
  B. fresh-feats chaining — enc_fwd's FRESH output feeds dec_bwd_update,
     state fixed, new state dropped
  C. state threading — dec_bwd_update's output state feeds the next
     iteration (feats fixed)
  D. full step loop — both (the production wrapper), fixed key

Usage (one TPU process at a time):
    COMA_TRAIN_PACKED=1 JAX_COMPILATION_CACHE_DIR=.jax_cache \
    python scripts/thread_bisect_probe.py [n]
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


def fetch(out):
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def main():
    from __graft_entry__ import _make_batch
    from coma_unet_tpu.config import LossConfig, ModelConfig
    from coma_unet_tpu.models import ContraAttnUNet
    from coma_unet_tpu.train import create_train_state, make_optimizer
    from coma_unet_tpu.train.step import make_split_train_step
    from scripts.train_step_probe import cached_flagship_variables

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    print("devices:", jax.devices(), flush=True)
    cfg = ModelConfig()
    model = ContraAttnUNet(cfg)
    rng = np.random.default_rng(0)
    batch = _make_batch(rng, b=2, s=128)
    variables = cached_flagship_variables(model, batch)
    state = create_train_state(
        model, make_optimizer(1e-3), jax.random.PRNGKey(0),
        (batch["mri"], batch["covars"], batch["roi_loc"], batch["roi_std"],
         batch["roi_compact"]),
        {"train": True}, variables=variables,
    )
    step = make_split_train_step(model, LossConfig(), donate=False)
    segs = step.segments
    assert "dec_bwd_update" in segs, "bisect expects the merged 2-program step"
    roi_w = jnp.full((36,), 225.0)
    key = jax.random.PRNGKey(1)

    # warm both executables
    t0 = time.time()
    feats0 = segs["enc_fwd"](state.params, batch, key)
    fetch(feats0)
    print(f"warm enc_fwd {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    out0 = segs["dec_bwd_update"](state, feats0, batch, roi_w, key, None)
    fetch(out0)
    print(f"warm dec_bwd_update {time.time()-t0:.1f}s", flush=True)
    del out0

    def timed(tag, fn):
        fn()  # warm the loop shape once
        t0 = time.time()
        out = fn()
        ms = (time.time() - t0) / n * 1000
        print(f"{tag}: {ms:8.1f} ms/step", flush=True)
        return out

    def loop_a():
        out = None
        for _ in range(n):
            segs["enc_fwd"](state.params, batch, key)
            out = segs["dec_bwd_update"](state, feats0, batch, roi_w, key,
                                         None)
        fetch(out)

    def loop_b():
        out = None
        for _ in range(n):
            feats = segs["enc_fwd"](state.params, batch, key)
            out = segs["dec_bwd_update"](state, feats, batch, roi_w, key,
                                         None)
        fetch(out)

    def loop_c():
        st = state
        for _ in range(n):
            st, _aux = segs["dec_bwd_update"](st, feats0, batch, roi_w, key,
                                              None)
        fetch(st.params)

    def loop_d():
        st = state
        aux = None
        for _ in range(n):
            st, aux = step(st, batch, roi_w, key)
        fetch(aux["loss"])

    timed("A alternation (static inputs)", loop_a)
    timed("B fresh-feats chain         ", loop_b)
    timed("C state threading           ", loop_c)
    timed("D full step wrapper         ", loop_d)


if __name__ == "__main__":
    main()
