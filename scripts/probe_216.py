"""PROBE_216: template-space direct 216^3 on the real chip (VERDICT r2 #4).

Runs the flagship at the template geometry (216^3, prompt 216^3, the
reference's `w*` file mode — `VolumeDataset.py:121-126`, `validation.py:66-68`)
and records, for forward and one train step:
  * static HBM footprint (XLA memory_analysis: args/outputs/temps/peak),
  * compile time and amortized latency,
  * whether remat suffices for the backward at this geometry.

    JAX_COMPILATION_CACHE_DIR=.jax_cache python scripts/probe_216.py [b=1]
"""

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

from __graft_entry__ import _make_batch, init_on_cpu
from coma_unet_tpu.config import LossConfig, ModelConfig
from coma_unet_tpu.models import ContraAttnUNet
from coma_unet_tpu.train import (
    create_train_state,
    make_optimizer,
    make_train_step,
)

S = 216


def mem_report(tag, compiled):
    try:
        m = compiled.memory_analysis()
        gb = 1024 ** 3
        print(f"{tag} memory: args {m.argument_size_in_bytes/gb:.2f} GB, "
              f"out {m.output_size_in_bytes/gb:.2f} GB, "
              f"temps {m.temp_size_in_bytes/gb:.2f} GB, "
              f"gen {m.generated_code_size_in_bytes/1e6:.0f} MB",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{tag} memory analysis unavailable: {e}", flush=True)


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    train_only = os.environ.get("COMA_PROBE_TRAIN_ONLY") == "1"
    print("devices:", jax.devices(), "batch:", b,
          "| COMA_PALLAS_DISABLE=", os.environ.get("COMA_PALLAS_DISABLE"),
          "| train_only:", train_only, flush=True)
    cfg = ModelConfig(prompt_shape=(S, S, S))
    model = ContraAttnUNet(cfg)
    rng = np.random.default_rng(0)
    batch = _make_batch(rng, b=b, s=S)
    t0 = time.time()
    from coma_unet_tpu.utils.param_cache import cached_variables

    variables = cached_variables(model, batch,
                                 lambda: init_on_cpu(model, batch))
    print(f"init: {time.time()-t0:.0f}s", flush=True)

    @jax.jit
    def forward(v, m, c, l, s_, r):
        return model.apply(v, m, c, l, s_, r, train=False,
                           with_projections=False).out

    args = (variables, batch["mri"], batch["covars"], batch["roi_loc"],
            batch["roi_std"], batch["roi_compact"])
    if train_only:
        _train_probe(model, variables, batch, b)
        return
    t0 = time.time()
    compiled = None
    for attempt in range(3):  # the helper's SIGKILL is load-dependent (r3)
        try:
            compiled = forward.lower(*args).compile()
            break
        except Exception as e:  # noqa: BLE001
            print(f"forward compile attempt {attempt+1} failed: "
                  f"{str(e)[:200]}", flush=True)
            time.sleep(20)
    if compiled is None:
        raise RuntimeError("forward compile failed 3x")
    print(f"forward compile: {time.time()-t0:.0f}s", flush=True)
    mem_report("forward", compiled)
    t0 = time.time()
    float(jnp.sum(forward(*args)))
    print(f"forward first run: {time.time()-t0:.1f}s", flush=True)
    n = 6
    t0 = time.time()
    out = None
    for _ in range(n):
        out = forward(*args)
    float(jnp.sum(out))
    ms = (time.time() - t0) / n * 1000
    print(f"forward (b={b}) 216^3: {ms:.1f} ms ({ms/b:.1f} ms/volume)",
          flush=True)

    _train_probe(model, variables, batch, b)


def _segment_mem(step, state, batch, roi_w):
    """AOT-compile each split-step segment on abstract args and print its
    HBM memory analysis — attributes ResourceExhausted to a segment (and its
    temps) BEFORE any donating execution. Compiles land in the persistent
    cache, so the subsequent real step pays nothing extra."""
    segs = getattr(step, "segments", None)
    need = ("enc_fwd", "dec_grad",
            "enc_bwd" if segs and "enc_bwd" in segs else "enc_bwd_update")
    if not segs or not all(hasattr(segs.get(k), "jitted") for k in need):
        return
    sds = lambda t: jax.tree.map(  # noqa: E731
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), t)
    p_s, b_s, st_s = sds(state.params), sds(dict(batch)), sds(state)
    rng_s = sds(jax.random.PRNGKey(1))
    rw_s = sds(roi_w)
    try:
        enc = segs["enc_fwd"].jitted
        feats_s = jax.eval_shape(enc, p_s, b_s, rng_s)
        mem_report("enc_fwd", enc.lower(p_s, b_s, rng_s).compile())
        dec = segs["dec_grad"].jitted
        (_, g_s) = jax.eval_shape(dec, p_s, feats_s, b_s, rw_s, rng_s, None)
        g_dec_s, g_feats_s = g_s
        mem_report("dec_grad",
                   dec.lower(p_s, feats_s, b_s, rw_s, rng_s, None).compile())
        if "enc_bwd" in segs:  # unfolded (fold_update=False)
            eb = segs["enc_bwd"].jitted
            g_enc_s = jax.eval_shape(eb, p_s, b_s, rng_s, g_feats_s)
            mem_report("enc_bwd",
                       eb.lower(p_s, b_s, rng_s, g_feats_s).compile())
            mem_report("update", segs["update"].jitted.lower(
                st_s, g_dec_s, g_enc_s).compile())
        else:
            mem_report("enc_bwd_update", segs["enc_bwd_update"].jitted.lower(
                st_s, b_s, rng_s, g_feats_s, g_dec_s).compile())
    except Exception as e:  # noqa: BLE001
        print(f"segment mem probe failed: {str(e)[:300]}", flush=True)


def _train_probe(model, variables, batch, b):
    # train step (template-space roi_weight=1.0, `validation.py:154`) —
    # segment-compiled (like the production loop at this geometry: smaller
    # modules for the compile helper) with block remat kept for HBM
    state = create_train_state(
        model, make_optimizer(1e-3), jax.random.PRNGKey(0),
        (batch["mri"], batch["covars"], batch["roi_loc"], batch["roi_std"],
         batch["roi_compact"]),
        {"train": True}, variables=variables,
    )
    from coma_unet_tpu.train.step import (
        make_split_train_step,
        split_step_supported,
    )

    lcfg = LossConfig(roi_weight=1.0)
    if split_step_supported(model, lcfg):
        # donate=True (the production setting): at 216^3, keeping the old
        # state + param grads + encoder feats alive across the chained
        # programs is the difference between fitting and ResourceExhausted
        # fold_update=False (the production large-volume setting): folding
        # the AdamW update into the encoder backward adds the optimizer
        # state + new params to that segment's HBM peak — ResourceExhausted
        # at 216^3 (artifacts/r3/probe_216_reduce_fix.log)
        step = make_split_train_step(model, lcfg, donate=True,
                                     remat_blocks=True, fold_update=False)
        print("train step: segment-compiled (remat on, donate, unfolded "
              "update)", flush=True)
    else:
        step = make_train_step(model, lcfg, donate=False)
    roi_w = jnp.full((36,), 1.0)
    _segment_mem(step, state, batch, roi_w)
    if os.environ.get("COMA_PROBE_COMPILE_ONLY") == "1":
        print("PROBE_216 compile-only done", flush=True)
        return
    t0 = time.time()
    state, aux = step(state, batch, roi_w, jax.random.PRNGKey(1))
    loss = float(aux["loss"])
    print(f"train step compile+first run: {time.time()-t0:.1f}s "
          f"loss={loss:.4f}", flush=True)
    n = 4
    t0 = time.time()
    for i in range(n):
        state, aux = step(state, batch, roi_w, jax.random.PRNGKey(i))
    loss = float(aux["loss"])
    per = (time.time() - t0) / n
    print(f"train step (b={b}) 216^3: {per*1000:.1f} ms loss={loss:.4f}",
          flush=True)
    _segment_times(step, state, batch, roi_w)
    print("PROBE_216 OK", flush=True)


def _segment_times(step, state, batch, roi_w):
    """One instrumented step with a scalar fetch after each chained program —
    attributes the 216^3 step time per segment (each reading carries the
    ~28 ms relay fetch floor; segments run 100s of ms here). Respects
    donation: every donated arg (feats, grads, state) is consumed exactly
    once, exactly as in the production chain."""
    segs = getattr(step, "segments", None)
    if not segs or "enc_bwd" not in segs:
        return
    key = jax.random.PRNGKey(7)

    def fetch(out):
        leaf = jax.tree.leaves(out)[0]
        return float(jnp.sum(leaf.astype(jnp.float32)))

    try:
        t0 = time.time()
        feats = segs["enc_fwd"](state.params, batch, key)
        fetch(feats)
        t1 = time.time()
        (_, _aux), (g_dec, g_feats) = segs["dec_grad"](
            state.params, feats, batch, roi_w, key, None)
        fetch(g_dec)
        t2 = time.time()
        g_enc = segs["enc_bwd"](state.params, batch, key, g_feats)
        fetch(g_enc)
        t3 = time.time()
        new_state, _extra = segs["update"](state, g_dec, g_enc)
        fetch(new_state.params)
        t4 = time.time()
        print(f"segment times (one pass, incl ~28 ms fetch floor each): "
              f"enc_fwd {1e3*(t1-t0):.0f} / dec_grad {1e3*(t2-t1):.0f} / "
              f"enc_bwd {1e3*(t3-t2):.0f} / update {1e3*(t4-t3):.0f} ms",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"segment timing failed: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
