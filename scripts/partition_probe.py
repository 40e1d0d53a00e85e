"""Partition the FULL-DEPTH flagship once (VERDICT r2 #7): a 5-level,
8-expert, bf16, modulator-on DP train step over the 8-device virtual CPU
mesh — the depth-5 program's GSPMD partitioning evidence that dryrun stage 1
(3 levels) leaves uncovered.

    python scripts/partition_probe.py [spatial=16] [n_devices=8]

Raises XLA:CPU's 40 s collective-rendezvous termination deadline (the
1-core host's per-shard bf16 step is slower than the default), which is why
this runs as a standalone probe rather than inside the driver's budgeted
dryrun. Results recorded in ROUND_NOTES.md.
"""

import os
import sys
import time

sys.path.insert(0, ".")

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
n_dev = int(sys.argv[2]) if len(sys.argv) > 2 else 8
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={n_dev}"
).strip()
# The rendezvous 20 s warn / 40 s terminate deadlines
# (xla_cpu_collective_call_{warn_stuck,terminate_timeout}_seconds) are
# DebugOptions fields NOT registered with this jaxlib's XLA_FLAGS parser
# (parse_flags_from_env aborts on them — measured r3); they must go in as
# per-compile compiler options via jit(...).lower(...).compile(...). The 8
# serialized bf16 shards on this 1-core host spread collective arrivals far
# past the default 40 s, which SIGABRTs the whole run otherwise.
_RDZV_OPTS = {
    "xla_cpu_collective_call_warn_stuck_seconds": "600",
    "xla_cpu_collective_call_terminate_timeout_seconds": "7200",
}

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _make_batch
from coma_unet_tpu.config import LossConfig, ModelConfig
from coma_unet_tpu.models import ContraAttnUNet
from coma_unet_tpu.parallel import make_mesh, make_sharded_train_step, shard_batch
from coma_unet_tpu.parallel.mesh import replicate_state
from coma_unet_tpu.train import create_train_state, make_optimizer


def main():
    s = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    devices = jax.devices()
    assert len(devices) >= n_dev
    mesh = make_mesh(data=n_dev, spatial=1, devices=devices[:n_dev])
    cfg = ModelConfig(prompt_shape=(s, s, s))  # full flagship otherwise
    assert cfg.channels == (32, 64, 128, 256, 512)
    assert cfg.num_experts == 8 and cfg.compute_dtype == "bfloat16"
    assert cfg.with_modulator
    model = ContraAttnUNet(cfg)
    rng = np.random.default_rng(0)
    batch = _make_batch(rng, b=n_dev, s=s)
    t0 = time.time()
    state = create_train_state(
        model, make_optimizer(1e-3), jax.random.PRNGKey(0),
        (batch["mri"], batch["covars"], batch["roi_loc"], batch["roi_std"],
         batch["roi_compact"]),
        {"train": True},
    )
    print(f"init: {time.time()-t0:.0f}s", flush=True)
    state = replicate_state(state, mesh)
    sbatch = shard_batch(batch, mesh)
    step = make_sharded_train_step(model, LossConfig(), mesh, donate=False)
    roi_w = jnp.full((36,), 225.0)
    t0 = time.time()
    lowered = step.lower(state, sbatch, roi_w, jax.random.PRNGKey(1))
    print(f"lowered: {time.time()-t0:.0f}s", flush=True)
    try:
        compiled = lowered.compile(compiler_options=_RDZV_OPTS)
    except Exception as e:  # older jaxlibs: unknown option names
        print(f"compiler_options rejected ({e}); default deadlines", flush=True)
        compiled = lowered.compile()
    print(f"compiled: {time.time()-t0:.0f}s", flush=True)
    new_state, aux = compiled(state, sbatch, roi_w, jax.random.PRNGKey(1))
    loss = float(aux["loss"])
    print(f"full-depth sharded step compile+run: {time.time()-t0:.0f}s "
          f"loss={loss:.4f}", flush=True)
    assert np.isfinite(loss) and int(new_state.step) == 1
    t0 = time.time()
    new_state, aux = compiled(new_state, sbatch, roi_w, jax.random.PRNGKey(2))
    loss2 = float(aux["loss"])
    print(f"second step: {time.time()-t0:.0f}s loss={loss2:.4f}", flush=True)
    assert np.isfinite(loss2)
    print(f"PARTITION_OK depth=5 widths={cfg.channels} experts=8 bf16 "
          f"n_devices={n_dev} spatial={s}", flush=True)


if __name__ == "__main__":
    main()
