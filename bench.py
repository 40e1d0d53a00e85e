"""Benchmark: full-volume MRI -> tau-PET synthesis latency on the flagship
ContraAttnUNet (128^3, conditional + modulator), the BASELINE.md north-star
metric (<2 s p50 target; the PyTorch reference publishes no numbers, so
vs_baseline is measured against that 2 s target).

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
plus auxiliary metrics on stderr.

Timeout-robust by construction (r2 lost its whole perf record to a driver
timeout, rc=124, because the headline printed last): the headline JSON is
emitted IMMEDIATELY after the p50 forward measurement; the cost-analysis and
train-step sections run afterwards, each inside its own try/except and gated
on the remaining wall-clock budget (`BENCH_BUDGET_S`, default 3300 s), and
every partial result is flushed to stderr AND appended to BENCH_AUX.json as
it lands.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
# r4: keep big train-segment entries (30-55 MB) in the cache — the
# dispatch-path remote compile of big modules is broken (only the chipless
# AOT path compiles them, ~500-550 s each), so a pruned entry now costs an
# AOT recompile rather than the old ~356 s dispatch compile; the slow-
# ingest tail the 16 MB default guarded against is the lesser risk when
# the relay likely retains the bytes from the pre-run warm (content
# dedup, ROUND_NOTES r3 "Persistent compile cache" #2).
os.environ.setdefault("COMA_CACHE_PRUNE_MB", "60")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from coma_unet_tpu.utils.compile_cache import prune_compile_cache  # noqa: E402

prune_compile_cache()  # big-entry ingest has a slow tail; keep small hits (see util)

_START = time.time()
_AUX_PATH = os.path.join(os.path.dirname(__file__), "BENCH_AUX.json")
# merge-on-start: budget-gated sections (216^3) only reach their timed
# numbers on long-budget runs; a short driver run must not wipe the keys a
# prior warm run captured. Re-measured keys overwrite; stale keys carry
# the last successful measurement. Every key is stamped in "_provenance"
# with the run that measured it (ADVICE r4: carried-forward numbers must
# be distinguishable from this run's).
try:
    with open(_AUX_PATH) as _f:
        _AUX: dict = json.load(_f)
except (OSError, ValueError):
    _AUX = {}


def _run_id() -> str:
    import subprocess

    try:
        sha = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout.strip() or "nogit"
    except Exception:  # noqa: BLE001
        sha = "nogit"
    return f"{sha}@{time.strftime('%Y-%m-%dT%H:%M:%S', time.gmtime(_START))}"


_RUN_ID = _run_id()


def _budget_left() -> float:
    return float(os.environ.get("BENCH_BUDGET_S", "3300")) - (
        time.time() - _START
    )


def _note(key: str, value, msg: str) -> None:
    """Record a partial result: stderr line + incremental BENCH_AUX.json."""
    print(msg, file=sys.stderr, flush=True)
    _AUX[key] = value
    _AUX.setdefault("_provenance", {})[key] = _RUN_ID
    try:
        with open(_AUX_PATH, "w") as f:
            json.dump(_AUX, f, indent=1)
    except OSError:
        pass


def main() -> None:
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_batch, init_on_cpu
    from coma_unet_tpu.config import LossConfig, ModelConfig
    from coma_unet_tpu.models import ContraAttnUNet
    from coma_unet_tpu.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    cfg = ModelConfig()
    model = ContraAttnUNet(cfg)
    rng = np.random.default_rng(0)
    batch = _make_batch(rng, b=2, s=128)

    # Fresh init's relay transfer is pathologically variable (measured 7 s to
    # 959 s for the same pytree); restore from the msgpack param cache when
    # present (populated by any prior bench/probe run on this checkout).
    from coma_unet_tpu.utils.param_cache import cached_variables

    t0 = time.time()
    variables = cached_variables(model, batch,
                                 lambda: init_on_cpu(model, batch))
    _note("init_s", round(time.time() - t0, 1),
          f"init (cpu + transfer): {time.time()-t0:.1f}s")

    @jax.jit
    def forward(variables, mri, covars, roi_loc, roi_std, roi_compact):
        return model.apply(
            variables, mri, covars, roi_loc, roi_std, roi_compact,
            train=False, with_projections=False,
        ).out

    args = (variables, batch["mri"], batch["covars"], batch["roi_loc"],
            batch["roi_std"], batch["roi_compact"])

    # NB: through remote-execution relays `block_until_ready` can return
    # before the device work completes (a scalar fetch forces execution), and
    # each dispatch+fetch cycle carries a ~28 ms relay floor. Amortize it:
    # N async dispatches, one scalar fetch at the end.
    t0 = time.time()
    float(jnp.sum(forward(*args)))
    _note("forward_compile_s", round(time.time() - t0, 1),
          f"forward compile+run: {time.time()-t0:.1f}s")

    def timed_chain(n=10):
        t0 = time.time()
        out = None
        for _ in range(n):
            out = forward(*args)
        float(jnp.sum(out))
        return (time.time() - t0) / n

    timed_chain(2)  # warm
    lat = [timed_chain(5) for _ in range(4)]
    # batch of 2 volumes per call -> per-volume latency
    per_call = float(np.percentile(lat, 50))
    p50_volume_ms = per_call / 2 * 1000.0
    vols_per_sec = 2.0 / per_call
    _note("forward_p50_b2_ms", round(per_call * 1000, 1),
          f"p50 batch-2 forward: {per_call*1000:.1f} ms; "
          f"{vols_per_sec:.2f} volumes/s/chip")

    # Headline FIRST — everything after this line is auxiliary and may be
    # killed by the driver's timeout without losing the round's perf record.
    print(json.dumps({
        "metric": "volume_synthesis_p50_latency",
        "value": round(p50_volume_ms, 2),
        "unit": "ms/volume",
        "vs_baseline": round(2000.0 / p50_volume_ms, 3),
    }), flush=True)

    def mfu_section():
        # MFU vs the v5e bf16 peak (~197 TFLOP/s). Pallas custom calls are
        # opaque to XLA's cost model, so take the static FLOP count from the
        # mathematically-identical pure-XLA lowering (pallas_convs=False).
        # The count is a constant of (config, batch shape), and the
        # lowering's compile-cache entry is oversized (pruned at startup),
        # so computing it live costs minutes of remote compile EVERY run —
        # memoize the scalar in a committed JSON instead and only compile
        # on a key miss. Runs AFTER the train section (VERDICT r4 item 1b:
        # a cold flops-compile must not eat the train window).
        V5E_PEAK = 197e12
        import dataclasses
        import hashlib

        flops_path = os.path.join(os.path.dirname(__file__), "artifacts",
                                  "fwd_flops.json")
        _b, _s = batch["mri"].shape[0], batch["mri"].shape[2]
        fkey = f"b{_b}_s{_s}_" + hashlib.sha1(
            repr(sorted(dataclasses.asdict(cfg).items())).encode()
        ).hexdigest()[:12]
        fwd_flops = 0.0
        try:
            with open(flops_path) as f:
                fwd_flops = float(json.load(f).get(fkey, 0.0))
        except (OSError, ValueError):
            pass
        if fwd_flops <= 0 and _budget_left() > 120:
            try:
                model_x = ContraAttnUNet(
                    dataclasses.replace(cfg, pallas_convs=False)
                )

                @jax.jit
                def forward_x(variables, mri, covars, roi_loc, roi_std,
                              roi_compact):
                    return model_x.apply(
                        variables, mri, covars, roi_loc, roi_std,
                        roi_compact, train=False, with_projections=False,
                    ).out

                ca = forward_x.lower(*args).compile().cost_analysis()
                if isinstance(ca, (list, tuple)):
                    ca = ca[0]
                fwd_flops = float(ca.get("flops", 0.0))
                if fwd_flops > 0:
                    try:
                        os.makedirs(os.path.dirname(flops_path),
                                    exist_ok=True)
                        memo = {}
                        try:  # merge: other geometries' keys must survive
                            with open(flops_path) as f:
                                memo = json.load(f)
                        except (OSError, ValueError):
                            pass
                        memo[fkey] = fwd_flops
                        with open(flops_path, "w") as f:
                            json.dump(memo, f)
                    except OSError:
                        pass
            except Exception as e:  # noqa: BLE001
                print(f"cost analysis unavailable: {e}", file=sys.stderr,
                      flush=True)
        if fwd_flops > 0:
            mfu = fwd_flops / per_call / V5E_PEAK
            _note("forward_mfu_pct", round(mfu * 100, 2),
                  f"forward: {fwd_flops/1e12:.2f} TFLOP/call -> "
                  f"{fwd_flops/per_call/1e12:.1f} TFLOP/s = "
                  f"{mfu*100:.1f}% MFU")
        else:
            print("skipping cost analysis (budget)", file=sys.stderr,
                  flush=True)

    # train step throughput (auxiliary)
    if _budget_left() > 180:
        try:
            tx = make_optimizer(1e-3)
            state = create_train_state(
                model, tx, jax.random.PRNGKey(0),
                (batch["mri"], batch["covars"], batch["roi_loc"],
                 batch["roi_std"], batch["roi_compact"]),
                {"train": True}, variables=variables,
            )
            from coma_unet_tpu.train.step import (
                make_split_train_step,
                split_step_supported,
            )

            lcfg = LossConfig()
            if split_step_supported(model, lcfg):
                # segment-compiled: the full packed Pallas family in training
                # (the monolithic fwd+bwd module overruns the remote compile
                # helper's Mosaic budget). COMA_TRAIN_SPLIT=0 reverts.
                # donate=True like production (halves optimizer-state HBM;
                # this loop threads `state`, so consuming the old state's
                # buffers is safe). Measured NOT to remove the ~242 s layout
                # retrace on the first post-step call (donation reuses the
                # buffer bytes but does not pin the output LAYOUT to the
                # input's — artifacts/r3/donate_probe.log: warm-up
                # [242151.1, 302.3, 302.7] ms with donation); the adaptive
                # warm loop below absorbs it either way.
                step = make_split_train_step(model, lcfg, donate=True)
                _note("train_step_kind", "split",
                      "train step: segment-compiled (packed family on)")
            else:
                step = make_train_step(model, lcfg, donate=True)
                _note("train_step_kind", "monolithic",
                      "train step: monolithic")
            roi_w = jnp.full((36,), 225.0)
            from coma_unet_tpu.train.step import aot_precompile_segments

            t0 = time.time()
            # leave >=240 s of budget after the AOT phase for the first
            # dispatch + warm + timed loop (VERDICT r4 item 1b)
            aot_precompile_segments(step, state, batch, roi_w,
                                    budget_s=max(60.0,
                                                 _budget_left() - 240.0))
            _note("train_aot_precompile_s", round(time.time() - t0, 1),
                  f"train AOT precompile: {time.time()-t0:.1f}s")
            t0 = time.time()
            state, aux = step(state, batch, roi_w, jax.random.PRNGKey(1))
            _ = float(aux["loss"])
            _note("train_compile_s", round(time.time() - t0, 1),
                  f"train step compile+run: {time.time()-t0:.1f}s")
            # Warm-up: the first post-compile executions of the big segment
            # executables run SECONDS each, and the tail is LONG — the r3
            # thread-bisect probes (artifacts/r3/thread_bisect.log,
            # split_merge_prekeys.log) measured ~250-400 s of cumulative
            # warm-up spread over the first few dozen executions before the
            # ~280 ms steady state; a 4-step warm cap here timed mid-warm-up
            # numbers (18-30 s/step averages that looked like relay thrash).
            # Warm adaptively until TWO consecutive steps land under 2 s,
            # bounded by steps and the wall-clock budget.
            warm_ms = []
            fast = 0
            for i in range(40):
                t1 = time.time()
                state, aux = step(state, batch, roi_w,
                                  jax.random.PRNGKey(100 + i))
                _ = float(aux["loss"])
                dt = time.time() - t1
                warm_ms.append(round(dt * 1000, 1))
                fast = fast + 1 if dt < 2.0 else 0
                if fast >= 2 or _budget_left() < 120:
                    break
            _note("train_warm_ms", warm_ms,
                  f"train warm-up steps (ms): {warm_ms}")
            n = 5
            t0 = time.time()
            for i in range(n):
                state, aux = step(state, batch, roi_w, jax.random.PRNGKey(i))
            loss = float(aux["loss"])  # one fetch amortizes the relay floor
            per_step = (time.time() - t0) / n
            _note("train_step_b2_ms", round(per_step * 1000, 1),
                  f"train step (b=2): {per_step*1000:.1f} ms "
                  f"({2/per_step:.2f} samples/s/chip), loss={loss:.3f}")
        except Exception as e:  # noqa: BLE001 — headline already emitted
            print(f"train-step bench failed: {e}", file=sys.stderr, flush=True)
            _note("train_step_error", str(e)[:200], "train section errored")
    else:
        print("skipping train-step bench (budget)", file=sys.stderr,
              flush=True)

    # eval engine (VERDICT r4 item 6): forward + the full voxel/ROI metric
    # accumulation — the device half of the reference's `contrastive_test`
    # (`attn_unet_data_parallel.py:1129-1359`). Budget-cheap: one program,
    # no backward.
    if _budget_left() > 120:
        try:
            from coma_unet_tpu.train import create_train_state as _cts
            from coma_unet_tpu.train.step import make_eval_step

            # the train section's donated steps consumed `variables`'
            # buffers — reload fresh params (msgpack cache, ~6 s); the r5
            # populate run's eval section died on 'Array has been deleted'
            eval_vars = cached_variables(model, batch,
                                         lambda: init_on_cpu(model, batch))
            eval_state = _cts(
                model, make_optimizer(1e-3), jax.random.PRNGKey(0),
                (batch["mri"], batch["covars"], batch["roi_loc"],
                 batch["roi_std"], batch["roi_compact"]),
                {"train": True}, variables=eval_vars,
            )
            eval_step = make_eval_step(model, num_rois=36)
            t0 = time.time()
            pred, vox, roi = eval_step(eval_state, batch)
            _ = float(jnp.sum(jax.tree.leaves(vox)[0]))
            _note("eval_compile_s", round(time.time() - t0, 1),
                  f"eval step compile+run: {time.time()-t0:.1f}s")
            out = None
            for _ in range(3):  # warm
                out = eval_step(eval_state, batch)
            _ = float(jnp.sum(jax.tree.leaves(out[1])[0]))
            n = 10
            t0 = time.time()
            for _ in range(n):
                out = eval_step(eval_state, batch)
            _ = float(jnp.sum(jax.tree.leaves(out[1])[0]))
            ms = (time.time() - t0) / n * 1000
            _note("eval_step_b2_ms", round(ms, 1),
                  f"eval step (b=2, fwd + metric suite): {ms:.1f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"eval bench failed: {e}", file=sys.stderr, flush=True)
    else:
        print("skipping eval bench (budget)", file=sys.stderr, flush=True)

    try:
        mfu_section()
    except Exception as e:  # noqa: BLE001
        print(f"MFU section failed: {e}", file=sys.stderr, flush=True)

    # 216^3 template-space section (VERDICT r3 item 3: a driver-visible
    # record of the template geometry — `VolumeDataset.py:121-126`).
    # Budget-gated: its compiles are large; with a warm .jax_cache it fits
    # comfortably, cold it only runs when the budget allows.
    # COMA_BENCH_216=0 skips, =1 forces (ignores the budget gate).
    want216 = os.environ.get("COMA_BENCH_216", "")
    if want216 != "0" and (want216 == "1" or _budget_left() > 600):
        try:
            import dataclasses as _dc

            cfg216 = _dc.replace(cfg, prompt_shape=(216, 216, 216))
            model216 = ContraAttnUNet(cfg216)
            batch216 = _make_batch(np.random.default_rng(0), b=1, s=216)
            t0 = time.time()
            v216 = cached_variables(model216, batch216,
                                    lambda: init_on_cpu(model216, batch216))
            _note("init_216_s", round(time.time() - t0, 1),
                  f"216^3 init: {time.time()-t0:.1f}s")

            @jax.jit
            def fwd216(v, m, c, l, s_, r):
                return model216.apply(v, m, c, l, s_, r, train=False,
                                      with_projections=False).out

            a216 = (v216, batch216["mri"], batch216["covars"],
                    batch216["roi_loc"], batch216["roi_std"],
                    batch216["roi_compact"])
            t0 = time.time()
            float(jnp.sum(fwd216(*a216)))
            _note("fwd_216_compile_s", round(time.time() - t0, 1),
                  f"216^3 forward compile+run: {time.time()-t0:.1f}s")
            n = 5
            t0 = time.time()
            out = None
            for _ in range(n):
                out = fwd216(*a216)
            float(jnp.sum(out))
            ms = (time.time() - t0) / n * 1000
            _note("fwd_216_b1_ms", round(ms, 1),
                  f"216^3 forward (b=1): {ms:.1f} ms/volume")

            if _budget_left() > 300 or want216 == "1":
                # import here too: the train-step section's imports are
                # inside its own budget gate (ADVICE r4 low: a forced 216
                # run with the train section skipped hit NameError)
                from coma_unet_tpu.train.step import (
                    make_split_train_step,
                    split_step_supported,
                )

                state216 = create_train_state(
                    model216, make_optimizer(1e-3), jax.random.PRNGKey(0),
                    (batch216["mri"], batch216["covars"],
                     batch216["roi_loc"], batch216["roi_std"],
                     batch216["roi_compact"]),
                    {"train": True}, variables=v216,
                )
                l216 = LossConfig(roi_weight=1.0)  # template space
                if split_step_supported(model216, l216):
                    # production large-volume settings (probe_216):
                    # donate + block remat + unfolded update fit HBM
                    step216 = make_split_train_step(
                        model216, l216, donate=True, remat_blocks=True,
                        fold_update=False,
                    )
                else:
                    step216 = make_train_step(model216, l216, donate=True)
                rw1 = jnp.full((36,), 1.0)
                from coma_unet_tpu.train.step import (
                    aot_precompile_segments as _aot216,
                )

                t0 = time.time()
                _aot216(step216, state216, batch216, rw1)
                _note("train_216_aot_s", round(time.time() - t0, 1),
                      f"216^3 AOT precompile: {time.time()-t0:.1f}s")
                t0 = time.time()
                state216, aux = step216(state216, batch216, rw1,
                                        jax.random.PRNGKey(1))
                _ = float(aux["loss"])
                _note("train_216_compile_s", round(time.time() - t0, 1),
                      f"216^3 train compile+run: {time.time()-t0:.1f}s")
                warm_ms, fast = [], 0
                for i in range(30):
                    t1 = time.time()
                    state216, aux = step216(state216, batch216, rw1,
                                            jax.random.PRNGKey(100 + i))
                    _ = float(aux["loss"])
                    dt = time.time() - t1
                    warm_ms.append(round(dt * 1000, 1))
                    fast = fast + 1 if dt < 5.0 else 0
                    if fast >= 2 or (_budget_left() < 60 and want216 != "1"):
                        break
                _note("train_216_warm_ms", warm_ms,
                      f"216^3 train warm-up (ms): {warm_ms}")
                n = 4
                t0 = time.time()
                for i in range(n):
                    state216, aux = step216(state216, batch216, rw1,
                                            jax.random.PRNGKey(i))
                loss = float(aux["loss"])
                per = (time.time() - t0) / n
                _note("train_216_b1_ms", round(per * 1000, 1),
                      f"216^3 train step (b=1): {per*1000:.1f} ms, "
                      f"loss={loss:.3f}")
        except Exception as e:  # noqa: BLE001
            print(f"216^3 bench failed: {e}", file=sys.stderr, flush=True)
    else:
        print("skipping 216^3 bench (budget)", file=sys.stderr, flush=True)

    try:
        update_baseline_md()
    except Exception as e:  # noqa: BLE001
        print(f"BASELINE.md update failed: {e}", file=sys.stderr, flush=True)


def update_baseline_md() -> None:
    """Rewrite BASELINE.md's measured table from BENCH_AUX so the living
    record can never lag the bench again (VERDICT r4 item 7). The table
    lives between BENCH:BEGIN/END markers; everything else is untouched."""
    path = os.path.join(os.path.dirname(__file__), "BASELINE.md")
    try:
        with open(path) as f:
            text = f.read()
    except OSError:
        return
    begin, end = "<!-- BENCH:BEGIN -->", "<!-- BENCH:END -->"
    if begin not in text or end not in text:
        return
    prov = _AUX.get("_provenance", {})

    def row(label, key, unit, note=""):
        v = _AUX.get(key)
        if v is None:
            return None
        return (f"| {label} | **{v} {unit}** | "
                f"`{key}` @ {prov.get(key, '?')} | {note} |")

    rows = [r for r in (
        row("full-volume synthesis p50 (b=2 fwd / 2)", "forward_p50_b2_ms",
            "ms b=2", "headline = value/2 per volume"),
        row("forward MFU", "forward_mfu_pct", "%",
            "vs 197 TFLOP/s v5e bf16 peak"),
        row("train step (b=2, RnC composite + AdamW)", "train_step_b2_ms",
            "ms", "segment-compiled split step"),
        row("eval step (b=2, fwd + metric suite)", "eval_step_b2_ms",
            "ms", "device half of contrastive_test"),
        row("216^3 forward (b=1)", "fwd_216_b1_ms", "ms", "template space"),
        row("216^3 train step (b=1)", "train_216_b1_ms", "ms",
            "split step, remat, unfolded update"),
    ) if r]
    table = "\n".join(
        ["", "| metric | measured | BENCH_AUX key @ run | notes |",
         "|---|---|---|---|"] + rows + [""])
    pre, _, rest = text.partition(begin)
    _, _, post = rest.partition(end)
    with open(path, "w") as f:
        f.write(pre + begin + table + end + post)
    print("BASELINE.md measured table refreshed", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
