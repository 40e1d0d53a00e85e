"""Persistent-compile-cache hygiene for the axon TPU relay.

The JAX persistent cache works through the remote-compile tunnel, and —
re-measured late r3 after a relay restart — big-entry loads now work
too: the 58 MB dec_bwd_update executable deserializes in ~2-10 s
(client-side cache HIT logged) instead of recompiling for 230-370 s
(artifacts/r3/cache_hit_probe.log, cache_hit2_probe.log). The first
DISPATCH of a client-loaded big executable still pays a one-time
~270-410 s relay-side ingest per process, but end-to-end that converts
a ~16-19 min cold start into ~5 min warm — so large entries are now
KEPT by default.

History: an earlier relay build WEDGED on exactly these loads (the run
hung >20 min on a 58 MB hit while recompiling took 550 s —
artifacts/r3/alternation_probe.log era), which is why this prune exists.
The cap now only evicts pathological entries (failed giant experiments);
`COMA_CACHE_PRUNE_MB` restores the old behavior if the hang returns.

Cache-key stability caveat (measured, scripts/module_hash_probe.py):
Mosaic kernel payloads serialize caller file:line locations inside the
opaque tpu_custom_call backend_config, which jax's key canonicalization
cannot strip — so ANY source edit in the trace call stack changes the
key. Entries only hit while the repo's traced code is byte-identical to
when they were written; stale entries are harmless misses.
"""

from __future__ import annotations

import os
import sys


def prune_compile_cache(cache_dir: str | None = None,
                        max_mb: float = 96.0) -> int:
    """Delete persistent-cache entries larger than `max_mb`. Returns the
    number of files removed. No-op when the dir is unset/missing.

    Default 96 MB keeps every production program (largest: the 58 MB
    merged dec_bwd_update) while evicting runaway experiments.
    `COMA_CACHE_PRUNE_MB` overrides `max_mb`; 0 (or negative) disables
    pruning entirely."""
    env_cap = os.environ.get("COMA_CACHE_PRUNE_MB")
    if env_cap is not None:
        max_mb = float(env_cap)
        if max_mb <= 0:
            return 0
    cache_dir = cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if not cache_dir or not os.path.isdir(cache_dir):
        return 0
    removed = 0
    cap = max_mb * 1024 * 1024
    for name in os.listdir(cache_dir):
        if not name.endswith("-cache"):
            continue  # only JAX cache entries; params .msgpack etc. stay
        path = os.path.join(cache_dir, name)
        try:
            if os.path.getsize(path) > cap:
                os.remove(path)
                removed += 1
        except OSError:
            continue
    if removed:
        print(
            f"pruned {removed} oversized compile-cache entries "
            f"(> {max_mb:.0f} MB)",
            file=sys.stderr, flush=True,
        )
    return removed
