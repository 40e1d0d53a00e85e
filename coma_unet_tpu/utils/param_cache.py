"""Host-side flagship-parameter cache.

Fresh flagship init costs minutes on this host (CPU init is seconds, but the
relay transfer of a freshly-initialized pytree has been measured anywhere
from ~7 s to 959 s — bench run 2026-08-19, artifacts/r3), so probes and
bench.py serialize the initialized variables once (flax msgpack, keyed by
spatial size) and restore + device_put on subsequent runs (~7 s measured).

Falls back to `init_fn` on any cache miss/mismatch (e.g. a model-config
change that alters parameter shapes makes `from_bytes` raise).
"""

import os
import sys
import time
from typing import Callable, Optional

import numpy as np


def cached_variables(
    model,
    batch,
    init_fn: Callable[[], object],
    cache_dir: Optional[str] = None,
    verbose: bool = True,
):
    """Restore flagship variables from the msgpack cache, else init + save.

    `init_fn` must return host- or device-resident variables for `model` at
    `batch`'s geometry; the restored pytree is device_put to the default
    device either way.
    """
    import jax
    from flax import serialization

    cache_dir = cache_dir or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.getcwd(), ".jax_cache"),
    )
    s = batch["mri"].shape[-1]
    path = os.path.join(cache_dir, f"flagship_vars_s{s}.msgpack")
    if os.path.exists(path):
        try:
            t0 = time.time()
            target = jax.eval_shape(
                lambda: model.init(
                    jax.random.PRNGKey(0), batch["mri"], batch["covars"],
                    batch["roi_loc"], batch["roi_std"], batch["roi_compact"],
                    train=False,
                )
            )
            zeros = jax.tree.map(lambda a: np.zeros(a.shape, a.dtype), target)
            with open(path, "rb") as f:
                variables = serialization.from_bytes(zeros, f.read())
            variables = jax.device_put(variables, jax.devices()[0])
            if verbose:
                print(f"params restored from cache ({time.time()-t0:.1f}s)",
                      file=sys.stderr, flush=True)
            return variables
        except Exception as e:  # noqa: BLE001 — stale cache: re-init
            if verbose:
                print(f"param cache unusable ({str(e)[:120]}); re-init",
                      file=sys.stderr, flush=True)
    t0 = time.time()
    variables = init_fn()
    if verbose:
        print(f"params initialized ({time.time()-t0:.1f}s)",
              file=sys.stderr, flush=True)
    try:
        host = jax.tree.map(np.asarray, variables)
        os.makedirs(cache_dir, exist_ok=True)
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(host))
    except OSError:
        pass
    return variables
