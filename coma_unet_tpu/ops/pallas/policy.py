"""Per-scope kernel-family policy for trace-time dispatch gates.

The Pallas dispatch gates (`pallas_disabled_families`, the fused
norm+FiLM+act gate in models/blocks.py) read process-wide env vars at
TRACE time. That is the right granularity for a monolithic step, but the
segment-compiled split train step (train/step.py:make_split_train_step)
needs a PER-SEGMENT mix: the relay keeps compiled executables in a
size-bounded cache (~91 MB measured, artifacts/r3/alternation_probe.log —
a 3-program chain over the cap re-uploads executables every step,
35-55 s/dispatch), and each kernel family costs different bytes in
different segments (e.g. the fused norm op is ~0.9 MB of Mosaic program
in enc_fwd but ~8.4 MB in dec_grad, measured /tmp/size_matrix r3). A
byte-budget-optimal step therefore keeps a family ON where it is cheap
and OFF where it is not — scoped here, not process-wide.

`kernel_policy(...)` is a context manager; the gates consult the active
policy FIRST and fall back to the env vars. The split step wraps each
segment's every invocation in its policy so first-call tracing (and any
retrace) sees the same configuration.

Reference parity: the reference has no analogue (single CUDA stream,
no executable-size-bounded dispatch path); this is TPU-relay plumbing.
"""

from __future__ import annotations

import contextvars
from typing import FrozenSet, Iterable, Optional

_POLICY: contextvars.ContextVar[Optional["KernelPolicy"]] = (
    contextvars.ContextVar("coma_kernel_policy", default=None)
)


class KernelPolicy:
    """One scope's kernel-family overrides.

    disable: extra families to disable (added to COMA_PALLAS_DISABLE).
    norm_fused: tri-state override of the fused instance-norm+FiLM+act
        gate — None defers to COMA_NORM_FUSED, True/False forces.
    """

    __slots__ = ("disable", "norm_fused", "_token")

    def __init__(self, disable: Iterable[str] = (),
                 norm_fused: Optional[bool] = None):
        self.disable: FrozenSet[str] = frozenset(
            f for f in disable if f
        )
        self.norm_fused = norm_fused
        self._token = None

    def __enter__(self) -> "KernelPolicy":
        self._token = _POLICY.set(self)
        return self

    def __exit__(self, *exc) -> None:
        _POLICY.reset(self._token)
        self._token = None

    def __repr__(self) -> str:  # policy strings appear in probe logs
        parts = []
        if self.disable:
            parts.append("disable=" + ",".join(sorted(self.disable)))
        if self.norm_fused is not None:
            parts.append(f"norm_fused={int(self.norm_fused)}")
        return "KernelPolicy(%s)" % "; ".join(parts)


kernel_policy = KernelPolicy  # context-manager alias for call sites


def current_policy() -> Optional[KernelPolicy]:
    return _POLICY.get()


def policy_disabled_families() -> FrozenSet[str]:
    pol = _POLICY.get()
    return pol.disable if pol is not None else frozenset()


def policy_norm_fused() -> Optional[bool]:
    """Tri-state fused-norm override from the active policy (None = defer
    to COMA_NORM_FUSED)."""
    pol = _POLICY.get()
    return pol.norm_fused if pol is not None else None


def parse_policy(spec: str) -> KernelPolicy:
    """Parse one policy spec: comma-separated items, each either a family
    name to disable (anything `COMA_PALLAS_DISABLE` accepts) or
    `norm=0|1` for the fused-norm override. E.g. "p1,norm=0"."""
    disable = []
    norm_fused = None
    for item in filter(None, (s.strip() for s in spec.split(","))):
        if item.startswith("norm="):
            norm_fused = item[len("norm="):] not in ("0", "false")
        else:
            disable.append(item)
    return KernelPolicy(disable=disable, norm_fused=norm_fused)


def parse_segment_policies(spec: str) -> dict:
    """Parse COMA_SPLIT_POLICY: `;`-separated `segment:policy` entries,
    e.g. "dec_grad:norm=0;enc_bwd_update:norm=0,p1". Unknown segment
    names are ignored by the consumer (make_split_train_step)."""
    out = {}
    for entry in filter(None, (s.strip() for s in spec.split(";"))):
        if ":" not in entry:
            continue
        seg, _, pol = entry.partition(":")
        out[seg.strip()] = parse_policy(pol)
    return out
