"""Persistent-compile-cache hygiene for the axon TPU relay.

The JAX persistent cache works through the remote-compile tunnel — an
11 MB cached executable deserializes and loads in under a second. But a
cache HIT on a LARGE entry (measured: the 58 MB dec_grad program) WEDGES
the relay's executable-load RPC: the client blocks forever while a fresh
process sees a healthy relay (r3, artifacts/r3/alternation_probe.log —
the run before it hung >20 min on exactly that load and had to be
killed; recompiling the same program took 550 s and worked).

Until the relay's load path handles big executables, prune oversized
entries before any TPU session that might hit them. Fresh compiles still
WRITE big entries (harmless — the write path is fine); they just must
not be read back. Size cap default 16 MB: the proven-good load is 11 MB,
the proven-hang is 58 MB, and every small-program load observed is fine.
"""

from __future__ import annotations

import os
import sys


def prune_compile_cache(cache_dir: str | None = None,
                        max_mb: float = 16.0) -> int:
    """Delete persistent-cache entries larger than `max_mb`. Returns the
    number of files removed. No-op when the dir is unset/missing.

    `COMA_CACHE_PRUNE_MB` overrides `max_mb`; 0 (or negative) disables
    pruning entirely — the probe lever for re-testing whether the relay's
    big-executable load path still hangs."""
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
            f"(> {max_mb:.0f} MB: relay executable loads hang on big "
            f"cache hits)",
            file=sys.stderr, flush=True,
        )
    return removed
