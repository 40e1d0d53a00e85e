"""Uncertainty-quantification heads + the classifier MLP.

- `MLP` — softmax classifier head (`attn_unet_data_parallel.py:99-117`;
  reserved for ABeta classification in the reference, kept for parity).
- `AleatoricUncertaintyNet` (`attn_unet_data_parallel.py:456-477`): predicts
  log sigma^2 from (x, q_hat) for the `heteroscedastic_loss`; confidence =
  1 / (1 + sigma^2).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class MLP(nn.Module):
    hidden_layers: Sequence[int]
    num_classes: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, h in enumerate(self.hidden_layers):
            x = jax.nn.relu(nn.Dense(h, name=f"fc{i}")(x))
        logits = nn.Dense(self.num_classes, name="out")(x)
        return jax.nn.softmax(logits, axis=-1)


class AleatoricUncertaintyNet(nn.Module):
    hidden: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray, q_hat: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: [B, F] features; q_hat: [B] point prediction.
        Returns (sigma2 [B, 1], confidence [B, 1])."""
        if x.ndim == 3:
            x = x.squeeze(1)
        h = jnp.concatenate([x, q_hat[:, None]], axis=-1).astype(jnp.float32)
        h = jax.nn.relu(nn.Dense(self.hidden, name="fc1")(h))
        h = jax.nn.relu(nn.Dense(self.hidden, name="fc2")(h))
        log_sigma2 = nn.Dense(1, name="out")(h)
        sigma2 = jnp.exp(log_sigma2)
        confidence = 1.0 / (1.0 + sigma2)
        return sigma2, confidence
