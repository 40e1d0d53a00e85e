"""`ConvAttn` reconstruction (SURVEY §2.9; `validation.py:540-553`): the
legacy ROI-vector regression model — 1D conv feature extractor with
multi-head self-attention over ROI positions, regressing the tau ROI-SUVR
vector. Paired with the Weighted* losses (`criterions.py:214-296`)."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvAttn(nn.Module):
    """forward(x [B, R]) -> [B, output_size]."""

    in_channels: int = 1
    first_out_channels: int = 16
    num_heads: int = 4
    output_size: int = 36

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        b, r = x.shape
        h = x[:, :, None]  # [B, R, 1] — ROI positions as the sequence
        h = nn.Conv(self.first_out_channels, kernel_size=(3,), padding="SAME",
                    name="conv1")(h)
        h = jax.nn.relu(h)
        h = nn.Conv(self.first_out_channels * 2, kernel_size=(3,),
                    padding="SAME", name="conv2")(h)
        h = jax.nn.relu(h)
        a = nn.LayerNorm(name="ln")(h)
        a = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, name="attn"
        )(a, a)
        h = h + a
        h = h.reshape(b, -1)
        h = jax.nn.relu(nn.Dense(128, name="fc1")(h))
        return nn.Dense(self.output_size, name="out")(h)


def train_convattn(
    model: ConvAttn,
    dataset,
    weights,
    epochs: int = 100,
    lr: float = 1e-3,
    batch_size: int = 32,
    seed: int = 0,
):
    """Minimal trainer for the ROI-vector pipeline (`model.train_model`
    contract) with the WeightedMSE criterion. Returns (params, losses)."""
    import numpy as np
    import optax

    from coma_unet_tpu.losses.weighted import weighted_mse

    xs = np.stack([dataset[i][0] for i in range(len(dataset))])
    ys = np.stack([dataset[i][1] for i in range(len(dataset))])
    rng = jax.random.PRNGKey(seed)
    params = model.init(rng, jnp.asarray(xs[:1]))
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    w = jnp.asarray(weights)

    @jax.jit
    def step(params, opt_state, xb, yb):
        def loss_fn(p):
            pred = model.apply(p, xb)
            return weighted_mse(pred, yb, w)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    losses = []
    n = xs.shape[0]
    rng_np = np.random.default_rng(seed)
    for _ in range(epochs):
        order = rng_np.permutation(n)
        epoch_loss = 0.0
        for i in range(0, n, batch_size):
            sel = order[i : i + batch_size]
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(xs[sel]), jnp.asarray(ys[sel])
            )
            epoch_loss += float(loss)
        losses.append(epoch_loss)
    return params, losses
