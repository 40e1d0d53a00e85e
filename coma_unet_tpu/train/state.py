"""Train state: params (+ optional batch stats), optimizer state, step."""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any          # {} when the model has no BatchNorm
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state
        )


def create_train_state(
    model,
    tx: optax.GradientTransformation,
    rng: jax.Array,
    example_inputs: tuple,
    example_kwargs: Optional[dict] = None,
    variables: Optional[dict] = None,
) -> TrainState:
    """`variables` reuses an already-initialized pytree (e.g. the cheap
    CPU-side init from `__graft_entry__.init_on_cpu`) — on the remote-TPU
    backend a fresh `model.init` is a minutes-long compile."""
    if variables is None:
        variables = model.init(rng, *example_inputs, **(example_kwargs or {}))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.asarray(0, dtype=jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
    )


def param_count(params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))
