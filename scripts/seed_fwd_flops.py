"""One-time seeding of artifacts/fwd_flops.json — the static FLOP count of
the flagship b=2 128^3 inference forward, read from XLA's cost analysis of
the mathematically-identical pure-XLA lowering (pallas_convs=False).

bench.py memoizes this scalar so the driver's bench run does not pay the
multi-minute remote compile of the XLA-only forward (its compile-cache
entry is oversized and pruned at startup) just to print the MFU aux line.
Re-run after any change to the flagship architecture or bench geometry
(the JSON is keyed by a hash of ModelConfig + batch shape; a stale file is
simply a key miss, never a wrong number).
"""

import dataclasses
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

import jax  # noqa: E402
import numpy as np  # noqa: E402


def main() -> None:
    from __graft_entry__ import _make_batch, init_on_cpu
    from coma_unet_tpu.config import ModelConfig
    from coma_unet_tpu.models import ContraAttnUNet
    from coma_unet_tpu.utils.param_cache import cached_variables

    cfg = ModelConfig()
    model = ContraAttnUNet(cfg)
    batch = _make_batch(np.random.default_rng(0), b=2, s=128)
    variables = cached_variables(
        ContraAttnUNet(cfg), batch,
        lambda: init_on_cpu(ContraAttnUNet(cfg), batch))

    model_x = ContraAttnUNet(dataclasses.replace(cfg, pallas_convs=False))

    @jax.jit
    def forward_x(variables, mri, covars, roi_loc, roi_std, roi_compact):
        return model_x.apply(
            variables, mri, covars, roi_loc, roi_std, roi_compact,
            train=False, with_projections=False,
        ).out

    args = (variables, batch["mri"], batch["covars"], batch["roi_loc"],
            batch["roi_std"], batch["roi_compact"])
    ca = forward_x.lower(*args).compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    assert flops > 0, "cost analysis returned no flops"

    b, s = batch["mri"].shape[0], batch["mri"].shape[2]
    fkey = f"b{b}_s{s}_" + hashlib.sha1(
        repr(sorted(dataclasses.asdict(cfg).items())).encode()
    ).hexdigest()[:12]
    path = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                        "fwd_flops.json")
    memo = {}
    try:  # merge: other geometries' keys must survive
        with open(path) as f:
            memo = json.load(f)
    except (OSError, ValueError):
        pass
    memo[fkey] = flops
    with open(path, "w") as f:
        json.dump(memo, f)
    print(f"{fkey}: {flops:.6e} flops -> {path}", flush=True)


if __name__ == "__main__":
    main()
