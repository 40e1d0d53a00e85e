"""Optimizer + LR control.

The reference trains with `torch.optim.AdamW(lr)` and
`ReduceLROnPlateau('min', patience=5)` stepped on the epoch-average loss
(`attn_unet_data_parallel.py:736-737,921`). Here: optax AdamW with the
learning rate exposed as an injected hyperparameter, and a host-side plateau
controller with torch semantics that rewrites the injected LR between epochs
(the decision is data-dependent and belongs outside jit).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import optax


def make_optimizer(
    lr: float,
    weight_decay: float = 0.01,
    grad_acc: int = 1,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    tx = optax.inject_hyperparams(optax.adamw)(
        learning_rate=lr, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay
    )
    if grad_acc > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_acc)
    return tx


def get_lr(opt_state) -> float:
    hp = _find_hyperparams(opt_state)
    return float(hp["learning_rate"])


def set_lr(opt_state, lr: float):
    """Return a copy of `opt_state` with the injected learning rate replaced.

    Functional (no in-place mutation of the hyperparams dict) so it is safe
    under buffer donation and independent of `inject_hyperparams` internals.
    """
    if hasattr(opt_state, "hyperparams"):
        old = opt_state.hyperparams["learning_rate"]
        new = (jnp.asarray(lr, old.dtype) if hasattr(old, "dtype")
               else type(old)(lr))
        hp = dict(opt_state.hyperparams)
        hp["learning_rate"] = new
        return opt_state._replace(hyperparams=hp)
    if hasattr(opt_state, "inner_opt_state"):  # MultiSteps wrapper
        return opt_state._replace(
            inner_opt_state=set_lr(opt_state.inner_opt_state, lr)
        )
    raise ValueError("optimizer state has no injected hyperparams")


def _find_hyperparams(opt_state):
    if hasattr(opt_state, "hyperparams"):
        return opt_state.hyperparams
    if hasattr(opt_state, "inner_opt_state"):  # MultiSteps wrapper
        return _find_hyperparams(opt_state.inner_opt_state)
    raise ValueError("optimizer state has no injected hyperparams")


@dataclass
class ReduceLROnPlateau:
    """torch `ReduceLROnPlateau` semantics: mode='min', threshold_mode='rel',
    threshold=1e-4, cooldown=0, min_lr=0."""

    patience: int = 5
    factor: float = 0.1
    threshold: float = 1e-4
    min_lr: float = 0.0
    best: float = float("inf")
    num_bad_epochs: int = 0

    def step(self, metric: float, current_lr: float) -> float:
        """Returns the (possibly reduced) learning rate."""
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.num_bad_epochs > self.patience:
            self.num_bad_epochs = 0
            return max(current_lr * self.factor, self.min_lr)
        return current_lr

    def state_dict(self) -> dict:
        return {
            "patience": self.patience,
            "factor": self.factor,
            "threshold": self.threshold,
            "min_lr": self.min_lr,
            "best": self.best,
            "num_bad_epochs": self.num_bad_epochs,
        }

    def load_state_dict(self, d: dict) -> None:
        for k, v in d.items():
            setattr(self, k, v)
