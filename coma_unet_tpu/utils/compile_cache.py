"""Persistent-compile-cache hygiene for the axon TPU relay.

Small entries are a pure win: the 6.9 MB encoder program HITS and is
ready in ~1 s. Large entries are a GAMBLE (measured late r3,
artifacts/r3/cache_hit{,2}_probe.log + /tmp/bench_cachewarm{,2}.log):
the client-side deserialize is fast (2-13 s), but the first dispatch of
a client-loaded executable must ship it to the relay, and that ingest is
HIGH-VARIANCE — 16 s when the relay still retains the same bytes from a
previous remote compile (content dedup), 267-409 s for the 58 MB merged
train-step program on a cold relay, and 1181 s ONCE for the 32 MB
forward — i.e. it can cost 3x a fresh remote compile (356 s). An
unattended bench run cannot afford the bad tail, so entries above the
default cap are pruned before TPU sessions; fresh compiles still WRITE
big entries (the write path is harmless).

Override: `COMA_CACHE_PRUNE_MB` sets the cap; <= 0 disables pruning —
worth it for same-session iteration where relay retention makes big
hits nearly free. (An earlier relay build WEDGED outright on big-entry
loads; that hang is gone post-restart — loads now always complete, the
tail is just slow.)

Cache-key stability caveat (measured, scripts/module_hash_probe.py):
Mosaic kernel payloads serialize caller file:line locations inside the
opaque tpu_custom_call backend_config, which jax's key canonicalization
cannot strip — so ANY source edit in the trace call stack changes the
key. Entries only hit while the traced code is byte-identical to when
they were written; stale entries are harmless misses.
"""

from __future__ import annotations

import os
import sys


def ensure_compile_cache(cache_dir: str | None = None) -> str:
    """Activate the persistent compile cache even when jax was imported
    BEFORE `JAX_COMPILATION_CACHE_DIR` existed in the environment.

    The axon sitecustomize pre-imports jax, and jax snapshots the env var
    at import — so the `os.environ.setdefault(...)` every entry script
    does is a SILENT NO-OP unless the var was exported by the launching
    shell. That is the r5 root cause of the entire warm-cache failure
    class: manual runs prefixed `JAX_COMPILATION_CACHE_DIR=...` (per
    CLAUDE.md) wrote and hit entries, while the driver's bare
    `python bench.py` and un-prefixed probe runs silently compiled with
    the cache DISABLED every time (BENCH_r04 rc=124 after 1199.7 s of
    'warm' AOT; "Not writing persistent cache entry ... since cache is
    disabled/not initialized", /tmp/cache_diag3.log r5). Call this right
    after `import jax` from every entry point. Returns the active dir."""
    import jax

    path = (cache_dir
            or os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or os.path.join(
                os.path.dirname(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__)))), ".jax_cache"))
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", path)
    if jax.config.jax_compilation_cache_dir != path:
        jax.config.update("jax_compilation_cache_dir", path)
    return path


def prune_compile_cache(cache_dir: str | None = None,
                        max_mb: float = 16.0) -> int:
    """Delete persistent-cache entries larger than `max_mb`. Returns the
    number of files removed. No-op when the dir is unset/missing.

    Default 16 MB: every load at or below the 15 MB forward entry has
    measured fast; the 32/58 MB entries hit the slow-ingest tail (see
    module docstring). `COMA_CACHE_PRUNE_MB` overrides; 0 (or negative)
    disables pruning."""
    # activate the cache first — every entry point calls prune at
    # startup, so this is the single choke point that guarantees the
    # persistent cache is ON even under the pre-imported-jax environment
    # (see ensure_compile_cache)
    try:
        cache_dir = cache_dir or ensure_compile_cache()
    except Exception:  # noqa: BLE001 — pruning must never block startup
        cache_dir = cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR")
    env_cap = os.environ.get("COMA_CACHE_PRUNE_MB")
    if env_cap is not None:
        max_mb = float(env_cap)
        if max_mb <= 0:
            return 0
    if not cache_dir or not os.path.isdir(cache_dir):
        return 0
    removed = 0
    cap = max_mb * 1024 * 1024
    # Name-based drops independent of the size cap: BOTH hangs observed in
    # r5 were big-entry LOADS of the forward program as the process's FIRST
    # TPU action (the relay session's cold big-load can hang indefinitely —
    # 29 min and 12 min observed, artifacts/r5/bench_populate2.log /
    # bench_final_warm.log), while fresh remote compiles never hang AND
    # leave the relay session warm for every later load/ingest. Dropping
    # the forward entry trades ~250 s of deterministic compile for
    # removing the unbounded-hang mode from unattended (driver) runs.
    drop = tuple(filter(None, os.environ.get(
        "COMA_CACHE_DROP", "jit_forward-").split(",")))
    for name in os.listdir(cache_dir):
        if not name.endswith("-cache"):
            continue  # only JAX cache entries; params .msgpack etc. stay
        path = os.path.join(cache_dir, name)
        try:
            if name.startswith(drop) or os.path.getsize(path) > cap:
                os.remove(path)
                removed += 1
        except OSError:
            continue
    if removed:
        print(
            f"pruned {removed} oversized compile-cache entries "
            f"(> {max_mb:.0f} MB: big-executable ingest through the relay "
            f"is slower than recompiling in the bad tail)",
            file=sys.stderr, flush=True,
        )
    return removed
