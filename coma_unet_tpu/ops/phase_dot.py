"""Pure-XLA phase-decomposed strided 3D convs for wide volumes.

Template-space geometry (direct 216^3, the reference's `w*` file mode —
`/root/reference/VolumeDataset.py:121-126`, `validation.py:66-68`) breaks
both conv backends on v5e:

  * XLA's conv lowering relayouts bf16 small-channel operands channel-minor
    with up to 8-16x layout padding — 4.8 GB of HLO temps PER
    bf16[1,32,216^3] operand (artifacts/r3/probe_216_oom.log), which is why
    the 216^3 encoder backward ResourceExhausts: the level-0 stride-2
    downsample's forward replay, dx (a transposed conv), and dw are each a
    wide XLA conv (scripts/trace_216_bwd.py).
  * the Mosaic wide-W strided kernels of this class crashed the remote
    compile helper (r3 g216 probe: 35 min compile, then endpoint death).

This module takes the third road: lower stride-2 (s2) and transposed
stride-2 (t2) k=3 SAME convs to parity-phase slices + per-tap
channel-contraction einsums. No `conv_general_dilated` anywhere, so XLA
keeps natural spatial-minor layouts (lane-dim W); and because slices, pads,
stacks, and dots are all AD-closed, `jax.vjp` of these functions produces
the same relayout-free op set for dx and dw — the property the Pallas
kernels need custom VJPs for.

Per-phase arithmetic (stride 2, k=3, SAME, even extents): output index o
reads input index i = 2o + (k-1) for tap k in {0,1,2}, so each tap is a
(possibly shifted) view of one input parity phase:

    k=0 -> phase 1, shifted by -1 (zero at o=0)
    k=1 -> phase 0
    k=2 -> phase 1

The 27 taps are grouped by kz into three stacked einsums
('tbczyx,toc->bozyx', contraction 9*Cin) so the MXU sees one big dot per
group instead of 27 thin ones. The transposed conv (lhs_dilation 2,
padding (1,2) per axis — `transposed_padding(3, 2)`) decomposes by OUTPUT
parity: even outputs take the middle tap, odd outputs taps 0 and 2 (input
shifted +1), and the 8 output phases interleave back with a
stack/transpose/reshape (pure layout ops).
"""

from __future__ import annotations

from itertools import product

import jax.numpy as jnp
from jax import lax

__all__ = ["phase_dot_s2", "phase_dot_t2", "shift_dot_dw"]

_SPATIAL = (2, 3, 4)  # NCDHW


def _shift_m1(a: jnp.ndarray, axis: int) -> jnp.ndarray:
    """b[o] = a[o-1], zero at o=0 (left zero-pad, drop last)."""
    pad = [(0, 0)] * a.ndim
    pad[axis] = (1, 0)
    return jnp.pad(lax.slice_in_dim(a, 0, a.shape[axis] - 1, axis=axis), pad)


def _shift_p1(a: jnp.ndarray, axis: int) -> jnp.ndarray:
    """b[o] = a[o+1], zero at o=n-1 (right zero-pad, drop first)."""
    pad = [(0, 0)] * a.ndim
    pad[axis] = (0, 1)
    return jnp.pad(lax.slice_in_dim(a, 1, a.shape[axis], axis=axis), pad)


# stride-2 tap -> (input parity phase, shift) per axis
_S2_TAP = {0: (1, -1), 1: (0, 0), 2: (1, 0)}


def phase_dot_s2(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Stride-2 k=3 SAME conv, NCDHW x [B,C,D,H,W] (even D/H/W), OIDHW
    w [O,C,3,3,3] -> [B,O,D/2,H/2,W/2]. Equals
    `lax.conv_general_dilated(x, w, (2,2,2), SAME)` to dot-accumulation
    tolerance."""
    if any(x.shape[a] % 2 for a in _SPATIAL):
        raise ValueError(f"phase_dot_s2 needs even spatial extents: {x.shape}")
    if w.shape[-3:] != (3, 3, 3) or w.shape[1] != x.shape[1]:
        raise ValueError(f"bad kernel {w.shape} for input {x.shape}")

    phases = {
        (pz, py, px): x[:, :, pz::2, py::2, px::2]
        for pz, py, px in product((0, 1), repeat=3)
    }

    def tap(kz: int, ky: int, kx: int) -> jnp.ndarray:
        (pz, sz), (py, sy), (px, sx) = _S2_TAP[kz], _S2_TAP[ky], _S2_TAP[kx]
        a = phases[(pz, py, px)]
        for axis, s in zip(_SPATIAL, (sz, sy, sx)):
            if s:
                a = _shift_m1(a, axis)
        return a

    out = None
    for kz in range(3):
        stack = jnp.stack([tap(kz, ky, kx)
                           for ky in range(3) for kx in range(3)])
        wt = jnp.stack([w[:, :, kz, ky, kx]
                        for ky in range(3) for kx in range(3)])
        y = jnp.einsum("tbczyx,toc->bozyx", stack, wt)
        out = y if out is None else out + y
    return out


def phase_dot_t2(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Transposed stride-2 k=3 conv (lhs_dilation (2,2,2), padding (1,2)
    per axis — `models.blocks.transposed_padding(3, 2)`), NCDHW
    x [B,I,N,N,N], OIDHW w [O,I,3,3,3] -> [B,O,2N,2N,2N]."""
    if w.shape[-3:] != (3, 3, 3) or w.shape[1] != x.shape[1]:
        raise ValueError(f"bad kernel {w.shape} for input {x.shape}")
    b, _, dz, dy_, dx_ = x.shape
    o = w.shape[0]

    # per OUTPUT parity q: list of (tap k, shift) along one axis
    per_axis = {0: [(1, 0)], 1: [(0, 0), (2, 1)]}

    phase_out = {}
    for q in product((0, 1), repeat=3):
        taps = list(product(per_axis[q[0]], per_axis[q[1]], per_axis[q[2]]))
        arrs, wts = [], []
        for (kz, sz), (ky, sy), (kx, sx) in taps:
            a = x
            for axis, s in zip(_SPATIAL, (sz, sy, sx)):
                if s:
                    a = _shift_p1(a, axis)
            arrs.append(a)
            wts.append(w[:, :, kz, ky, kx])
        phase_out[q] = jnp.einsum(
            "tbczyx,toc->bozyx", jnp.stack(arrs), jnp.stack(wts)
        )

    arr = jnp.stack([phase_out[q] for q in product((0, 1), repeat=3)])
    arr = arr.reshape(2, 2, 2, b, o, dz, dy_, dx_)
    arr = arr.transpose(3, 4, 5, 0, 6, 1, 7, 2)
    return arr.reshape(b, o, 2 * dz, 2 * dy_, 2 * dx_)


def shift_dot_dw(x: jnp.ndarray, g: jnp.ndarray, k: int,
                 batched: bool = False) -> jnp.ndarray:
    """Weight gradient of the stride-1 SAME k^3 conv as shifted-slice
    einsums (f32 accumulation, no conv op):

        dw[o, c, kz, ky, kx] = sum_pix x[c, pix + (k*-1)] * g[o, pix]

    Replaces the `jax.vjp(_xla_conv)` fallback in the Pallas conv VJPs
    for Cin == 1 (Mosaic rejects the [1, H*W] reshape in the dw kernel):
    that fallback re-enters XLA's conv lowering, which at wide shapes is
    the channel-minor relayout OOM class this module exists to avoid
    (scripts/trace_216_bwd.py — the in_conv pair was the last wide XLA
    conv left in the 216^3 encoder backward). `batched` returns the
    per-sample [B, O, C, k, k, k] grad (CondConv expert kernels)."""
    taps = range(-(k // 2), k // 2 + 1)
    arrs = []
    for tz in taps:
        for ty in taps:
            for tx in taps:
                a = x
                for axis, s in zip(_SPATIAL, (tz, ty, tx)):
                    if s == -1:
                        a = _shift_m1(a, axis)
                    elif s == 1:
                        a = _shift_p1(a, axis)
                arrs.append(a)
    stack = jnp.stack(arrs)  # [k^3, B, C, Z, Y, X]
    spec = "tbczyx,bozyx->boct" if batched else "tbczyx,bozyx->oct"
    dw = jnp.einsum(spec, stack, g, preferred_element_type=jnp.float32)
    return dw.reshape(dw.shape[:-1] + (k, k, k))
