"""Does the split step's OUTPUT state have the same avals as its INPUT
state? If not, the second step() invocation retraces and recompiles the
~230 s dec_bwd_update program — the measured "first warm-up step takes
244 s" pathology (artifacts/r3/cache_load_probe.log: a SECOND 56.6 MB
cache entry appears exactly one compile after the first step).

Purely abstract (eval_shape): no TPU, no compile.
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from __graft_entry__ import _make_batch, init_on_cpu
    from coma_unet_tpu.config import LossConfig, ModelConfig
    from coma_unet_tpu.models import ContraAttnUNet
    from coma_unet_tpu.train import create_train_state, make_optimizer
    from coma_unet_tpu.train.step import make_split_train_step
    from coma_unet_tpu.utils.param_cache import cached_variables

    jax.config.update("jax_platforms", "cpu")

    model = ContraAttnUNet(ModelConfig())
    rng = np.random.default_rng(0)
    batch = _make_batch(rng, b=2, s=128)
    variables = cached_variables(model, batch,
                                 lambda: init_on_cpu(model, batch))
    state = create_train_state(
        model, make_optimizer(1e-3), jax.random.PRNGKey(0),
        (batch["mri"], batch["covars"], batch["roi_loc"], batch["roi_std"],
         batch["roi_compact"]),
        {"train": True}, variables=variables,
    )
    step = make_split_train_step(model, LossConfig(), donate=False)
    roi_w = jnp.full((36,), 225.0)
    key = jax.random.PRNGKey(1)

    out_state, _aux = jax.eval_shape(step, state, batch, roi_w, key)

    in_leaves = jax.tree.leaves_with_path(state)
    out_leaves = jax.tree.leaves_with_path(out_state)
    assert len(in_leaves) == len(out_leaves), (
        f"structure differs: {len(in_leaves)} vs {len(out_leaves)}")
    n_diff = 0
    for (pi, a), (_po, b) in zip(in_leaves, out_leaves):
        ai = jax.api_util.shaped_abstractify(a)
        bi = (b if isinstance(b, jax.core.AbstractValue)
              else jax.api_util.shaped_abstractify(b))
        if str(ai) != str(bi):
            n_diff += 1
            if n_diff <= 20:
                print(f"DIFF {jax.tree_util.keystr(pi)}: {ai} -> {bi}")
    print(f"{n_diff} differing leaves of {len(in_leaves)}")


if __name__ == "__main__":
    main()
