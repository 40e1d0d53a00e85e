"""Compile + time the flagship train step on the real chip under a given
kernel-family configuration — the compile-budget bisection harness for
getting the packed Pallas family into training (the remote compile helper
OOMs past ~a module budget of large Mosaic kernels; measured r2: 53 calls
compile, 70 SIGKILL).

    JAX_COMPILATION_CACHE_DIR=.jax_cache \
    COMA_TRAIN_PACKED=1 COMA_PALLAS_DISABLE=k1 \
    python scripts/train_step_probe.py [n_steps]

Flagship params are initialized once on CPU and cached in
.jax_cache/flagship_vars.msgpack (~50 MB) so repeated probes skip the
~5-8 min CPU init.
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

prune_compile_cache()  # big-entry ingest has a slow tail; keep small hits (see util)


def cached_flagship_variables(model, batch):
    from __graft_entry__ import init_on_cpu
    from coma_unet_tpu.utils.param_cache import cached_variables

    return cached_variables(model, batch,
                            lambda: init_on_cpu(model, batch))


def main():
    from __graft_entry__ import _make_batch
    from coma_unet_tpu.config import LossConfig, ModelConfig
    from coma_unet_tpu.models import ContraAttnUNet
    from coma_unet_tpu.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )
    from coma_unet_tpu.train.step import (
        make_split_train_step,
        split_step_supported,
    )

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    print("devices:", jax.devices(),
          "| COMA_TRAIN_PACKED=", os.environ.get("COMA_TRAIN_PACKED"),
          "| COMA_PALLAS_DISABLE=", os.environ.get("COMA_PALLAS_DISABLE"),
          flush=True)
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
    lcfg = LossConfig()
    # COMA_PROBE_DONATE=1: build the production (donate=True) step. Answered
    # (artifacts/r3/donate_probe.log): donation does NOT suppress the layout
    # retrace — warm-up [242151.1, 302.3, 302.7] ms, i.e. the same ~242 s
    # second compile of dec_bwd_update as donate=False. Aliasing reuses the
    # donated buffer's MEMORY but the output layout is still
    # compiler-chosen, so the first post-step call re-lowers with the
    # executable-produced layouts regardless. Donated calls consume their
    # argument buffers, so this mode skips the segment-standalone
    # warm/attribution sections (they re-call segments with
    # already-consumed state/feats).
    donate = os.environ.get("COMA_PROBE_DONATE") == "1"
    if split_step_supported(model, lcfg):
        # segment-compiled step (3 chained XLA programs): the full Pallas
        # family in training without blowing the compile helper's budget
        print("using make_split_train_step (COMA_TRAIN_SPLIT=0 disables)"
              f" donate={donate}", flush=True)
        step = make_split_train_step(model, lcfg, donate=donate)
    else:
        step = make_train_step(model, lcfg, donate=donate)
    roi_w = jnp.full((36,), 225.0)

    from coma_unet_tpu.train.step import _retryable

    def retry(tag, fn, attempts=3):
        # the remote compile helper's SIGKILL is load-dependent (the same
        # program compiled fine and SIGKILLed an hour apart, r3) — retry
        # each segment's first compile a few times before giving up.
        # Donate mode only retries compile-class failures: a donated step
        # that failed AFTER consuming its input buffers must not be
        # re-invoked (the retry would run on deleted arrays and mask the
        # real error with 'Array has been deleted' — ADVICE r3).
        for i in range(attempts):
            try:
                t0 = time.time()
                out = fn()
                print(f"{tag}: compile+run {time.time()-t0:.1f}s", flush=True)
                return out
            except Exception as e:  # noqa: BLE001
                if donate and not _retryable(e):
                    raise
                print(f"{tag}: attempt {i+1} failed: {str(e)[:200]}",
                      flush=True)
                time.sleep(30 * (2 ** i))
        raise RuntimeError(f"{tag}: all {attempts} attempts failed")

    segs = getattr(step, "segments", None)
    if donate and segs and os.environ.get("COMA_PROBE_AOT", "1") == "1":
        # AOT-precompile every segment SIGNATURE (policies + chained
        # output formats + the loop-carried second signature) — shared
        # implementation with bench/the train loop; the r4 inline block
        # bypassed the per-segment KernelPolicy and dropped layouts, so
        # its cache entries could never be loaded (ADVICE r4).
        import logging

        logging.basicConfig(level=logging.INFO, stream=sys.stdout)
        from coma_unet_tpu.train.step import aot_precompile_segments

        t0 = time.time()
        ok = aot_precompile_segments(step, state, batch, roi_w)
        print(f"AOT precompile (all signatures): {time.time()-t0:.1f}s "
              f"ok={ok}", flush=True)
    if donate:
        segs = None  # donated segments consume their buffers; step-only mode
    key = jax.random.PRNGKey(1)
    merged = bool(segs) and "dec_bwd_update" in segs
    if merged:
        feats = retry("warm enc_fwd",
                      lambda: segs["enc_fwd"](state.params, batch, key))
        # warm on a THROWAWAY state copy (donate=False in probes, but keep
        # the real state untouched for the timed steps)
        retry("warm dec_bwd_update",
              lambda: segs["dec_bwd_update"](state, feats, batch, roi_w,
                                             key, None))
    elif segs:
        # warm each compiled program individually (the helper handles one
        # program at a time far more reliably than a back-to-back chain)
        feats = retry("warm enc_fwd",
                      lambda: segs["enc_fwd"](state.params, batch, key))
        (_, _aux), (g_dec, g_feats) = retry(
            "warm dec_grad",
            lambda: segs["dec_grad"](state.params, feats, batch, roi_w, key,
                                     None))
        retry("warm enc_bwd_update",
              lambda: segs["enc_bwd_update"](state, batch, key, g_feats,
                                             g_dec))

    t0 = time.time()
    state, aux = retry(
        "first step",
        lambda: step(state, batch, roi_w, jax.random.PRNGKey(1)))
    loss0 = float(aux["loss"])
    print(f"train step compile+run: {time.time()-t0:.1f}s loss={loss0:.4f}",
          flush=True)

    # COMA_PROBE_PRE_KEYS=1: materialize every per-step PRNG key BEFORE the
    # timed loop. (Measured irrelevant — 30.5 s/step either way while warm-up
    # lasted, artifacts/r3/split_merge_prekeys.log — kept as a lever.)
    pre_keys = os.environ.get("COMA_PROBE_PRE_KEYS") == "1"
    if pre_keys:
        keys = [jax.random.PRNGKey(i) for i in range(n)]
        jax.block_until_ready(keys)
        print("per-step keys pre-materialized", flush=True)

    # Warm-up: the first executions of the big segment executables run
    # SECONDS each with a tail of a few DOZEN executions (~250-400 s total
    # before the ~280 ms steady state — artifacts/r3/thread_bisect.log vs
    # split_merge_probe{,2}.log, whose timed loops sat entirely inside the
    # tail and read 18-47 s/step). Warm until two consecutive fast steps.
    warm_ms, fast = [], 0
    for i in range(40):
        t1 = time.time()
        state, aux = step(state, batch, roi_w, jax.random.PRNGKey(100 + i))
        float(aux["loss"])
        dt = time.time() - t1
        warm_ms.append(round(dt * 1000, 1))
        fast = fast + 1 if dt < 2.0 else 0
        if fast >= 2:
            break
    print(f"warm-up steps (ms): {warm_ms}", flush=True)

    t0 = time.time()
    for i in range(n):
        k = keys[i] if pre_keys else jax.random.PRNGKey(i)
        state, aux = step(state, batch, roi_w, k)
    loss = float(aux["loss"])
    per = (time.time() - t0) / n
    print(f"train step (b=2): {per*1000:.1f} ms ({2/per:.2f} samples/s), "
          f"loss={loss:.4f}", flush=True)

    if segs:
        # attribute the step time: chain each compiled segment standalone.
        # Fetch ONE leaf only — program execution is forced at program
        # granularity, and fetching a whole grad/state pytree pays the
        # ~28 ms relay floor per leaf (measured: it inflated dec_grad from
        # ~300 ms to 1.6 s and update to 3.6 s).
        def fetch(out):
            leaf = jax.tree.leaves(out)[0]
            return float(jnp.sum(leaf.astype(jnp.float32)))

        if merged:
            calls = {
                "enc_fwd": lambda: segs["enc_fwd"](state.params, batch,
                                                   key),
                "dec_bwd_update": lambda: segs["dec_bwd_update"](
                    state, feats, batch, roi_w, key, None),
            }
        else:
            calls = {
                "enc_fwd": lambda: segs["enc_fwd"](state.params, batch,
                                                   key),
                "dec_grad": lambda: segs["dec_grad"](
                    state.params, feats, batch, roi_w, key, None),
                "enc_bwd_update": lambda: segs["enc_bwd_update"](
                    state, batch, key, g_feats, g_dec),
            }
        for name, call in calls.items():
            fetch(call())  # warm
            t0 = time.time()
            out = None
            for _ in range(n):
                out = call()
            fetch(out)
            ms = (time.time() - t0) / n * 1000
            print(f"  segment {name:8s}: {ms:8.1f} ms", flush=True)

        # Alternation probes: same-program redispatch is fast, but the full
        # 3-program chain can hit a relay-side executable re-upload anomaly
        # (~54 s/step when the executables outgrow the relay cache —
        # mono_v2_probe had the same signature with one huge program).
        # Pairwise alternation separates "cache holds 2 but not 3" from
        # "every program swap re-uploads".
        pairs = ([("enc_fwd", "dec_bwd_update")] if merged else
                 [("enc_fwd", "dec_grad"), ("dec_grad", "enc_bwd_update"),
                  ("enc_fwd", "enc_bwd_update")])
        for a, b in pairs:
            na = 3
            fetch(calls[a]()); fetch(calls[b]())  # noqa: E702 — warm pair
            t0 = time.time()
            out = None
            for _ in range(na):
                calls[a]()
                out = calls[b]()
            fetch(out)
            ms = (time.time() - t0) / na * 1000
            print(f"  alternate {a}<->{b}: {ms:8.1f} ms/pair", flush=True)


if __name__ == "__main__":
    main()
