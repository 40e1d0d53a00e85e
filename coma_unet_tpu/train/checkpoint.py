"""Orbax checkpointing with the reference's cadence semantics
(`attn_unet_data_parallel.py:943-955`): every epoch write `latest`, every
`checkpoint_iter` epochs write `epoch_{E}`; payload = (step/epoch, params,
optimizer state, scheduler state, last loss) — the JAX analogue of the
torch state-dict bundle; resume restores all of it
(`validation.py:201-348`)."""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from coma_unet_tpu.train.optim import ReduceLROnPlateau
from coma_unet_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(self, save_path: str):
        self.root = os.path.abspath(os.path.join(save_path, "checkpoints"))
        os.makedirs(self.root, exist_ok=True)
        self._ckptr = ocp.PyTreeCheckpointer()

    def _payload(self, state: TrainState, epoch: int, loss: float,
                 scheduler: Optional[ReduceLROnPlateau]) -> Dict[str, Any]:
        return {
            "epoch": epoch,
            "loss": float(loss),
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": int(state.step),
            "scheduler": (scheduler or ReduceLROnPlateau()).state_dict(),
        }

    def save(self, state: TrainState, epoch: int, loss: float,
             scheduler: Optional[ReduceLROnPlateau] = None,
             tag: Optional[str] = None) -> str:
        name = tag if tag is not None else f"epoch_{epoch}"
        path = os.path.join(self.root, f"checkpoint_{name}")
        self._ckptr.save(
            path, self._payload(state, epoch, loss, scheduler), force=True
        )
        return path

    def save_epoch(self, state: TrainState, epoch: int, loss: float,
                   scheduler: Optional[ReduceLROnPlateau] = None,
                   checkpoint_iter: int = 5) -> None:
        """Reference cadence: `latest` every epoch + periodic epoch_{E}."""
        self.save(state, epoch, loss, scheduler, tag="latest_epoch")
        if epoch % checkpoint_iter == 0:
            self.save(state, epoch, loss, scheduler)

    def restore(
        self, state: TrainState, path: Optional[str] = None,
        scheduler: Optional[ReduceLROnPlateau] = None,
    ) -> Tuple[TrainState, int, float]:
        """Restore into (a template) TrainState. Returns (state, epoch, loss).
        `path` defaults to the latest checkpoint."""
        if path is None:
            path = os.path.join(self.root, "checkpoint_latest_epoch")
        path = os.path.abspath(path)  # orbax requires absolute paths
        # the on-disk tree always carries a scheduler dict; keep the template
        # structurally identical even when the caller doesn't restore one
        template = self._payload(
            state, 0, 0.0, scheduler or ReduceLROnPlateau()
        )
        restored = self._ckptr.restore(path, item=template)
        new_state = state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=jax.numpy.asarray(restored["step"], jax.numpy.int32),
        )
        if scheduler is not None and restored.get("scheduler"):
            scheduler.load_state_dict(restored["scheduler"])
        return new_state, int(restored["epoch"]), float(restored["loss"])


def parse_epoch_from_path(path: str) -> Optional[int]:
    """`checkpoint_epoch_{E}` -> E (resume path parsing,
    `validation.py:214-223`)."""
    base = os.path.basename(path.rstrip("/"))
    if base.startswith("checkpoint_epoch_"):
        try:
            return int(base.split("_")[-1])
        except ValueError:
            return None
    return None
