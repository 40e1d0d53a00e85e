"""Profiling — the TPU-native upgrade of the reference's (absent) tracing
story (SURVEY §5): `jax.profiler` trace capture around training/eval steps,
plus a lightweight step timer that forces a scalar fetch (remote-execution
relays make `block_until_ready` unreliable for timing)."""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """`with trace('/tmp/jax-trace'):` captures a profiler trace viewable in
    TensorBoard/Perfetto. No-op when log_dir is falsy."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock timer that forces completion via a scalar fetch."""

    def __init__(self):
        self.times = []

    @contextlib.contextmanager
    def measure(self, result_fetch=None):
        t0 = time.time()
        yield
        if result_fetch is not None:
            _ = float(jnp.sum(result_fetch)) if hasattr(
                result_fetch, "shape"
            ) else float(result_fetch)
        self.times.append(time.time() - t0)

    def p50(self) -> float:
        import numpy as np

        return float(np.median(self.times)) if self.times else float("nan")
