"""Pallas parity phase-split prepasses.

probe_anatomy.log (r3, v5e): the XLA strided-slice phase-split prologue
(`x[:, :, :, hp::2, :]` and friends) costs 6.95 ms at bf16[2,32,128^3] —
~90% of the s2-v2 kernel's 7.95 ms total and the whole reason the p1
stride-1 family tied instead of winning. XLA lowers sublane/lane-strided
slices of bf16 through a slow shuffle path; these kernels do the same
split as a streaming Pallas pass instead:

  * H parity: upcast the slab to f32, reshape-split the sublane dim
    (Mosaic lowers sublane reshape-splits in f32 only — the s2-v1
    decimation pattern), downcast, write both phases.
  * W parity (s2-v2's lane-grouped layout): one [W, W] 0/1 permutation
    matmul on the MXU — exact for one-hot matrices in any dtype.

Outputs are bit-exact with the strided-slice formulations (tests).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CPARAMS = pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)


def _hsplit_kernel(x_ref, o0_ref, o1_ref):
    slab = x_ref[...].astype(jnp.float32)        # [C, H, W]
    c, h, w = slab.shape
    r = slab.reshape(c, h // 2, 2, w)            # f32 sublane reshape-split
    o0_ref[...] = r[:, :, 0, :].astype(o0_ref.dtype)
    o1_ref[...] = r[:, :, 1, :].astype(o1_ref.dtype)


def _hwsplit_kernel(x_ref, p_ref, o0_ref, o1_ref):
    slab = x_ref[...].astype(jnp.float32)        # [C, H, W]
    c, h, w = slab.shape
    perm = p_ref[...]                            # [W, W] one-hot f32
    r = slab.reshape(c, h // 2, 2, w)
    for hp, o_ref in ((0, o0_ref), (1, o1_ref)):
        ph = r[:, :, hp, :]
        # W-parity regroup (even lanes left, odd right) via an exact
        # one-hot matmul — strided lane slices don't lower in Mosaic
        g = jax.lax.dot_general(
            ph, perm, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        o_ref[...] = g.astype(o_ref.dtype)


def _w_parity_perm(w: int) -> np.ndarray:
    p = np.zeros((w, w), np.float32)
    p[np.arange(0, w, 2), np.arange(w // 2)] = 1.0
    p[np.arange(1, w, 2), np.arange(w // 2, w)] = 1.0
    return p


@partial(jax.jit, static_argnames=("interpret",))
def pallas_hsplit(x: jnp.ndarray, interpret: bool = False):
    """[B, C, D, H, W] -> (H0, H1), H parity phases [B, C, D, H/2, W]."""
    b, c, d, h, w = x.shape
    assert h % 2 == 0
    out = jax.ShapeDtypeStruct((b, c, d, h // 2, w), x.dtype)
    return pl.pallas_call(
        _hsplit_kernel,
        grid=(b, d),
        in_specs=[pl.BlockSpec((None, c, None, h, w),
                               lambda bi, di: (bi, 0, di, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((None, c, None, h // 2, w),
                                lambda bi, di: (bi, 0, di, 0, 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[out, out],
        compiler_params=_CPARAMS,
        interpret=interpret,
    )(x)


@partial(jax.jit, static_argnames=("interpret",))
def pallas_hwsplit(x: jnp.ndarray, interpret: bool = False):
    """[B, C, D, H, W] -> (P0, P1): the s2-v2 phase layout — H parity
    phases with W parity grouped on lanes (lanes [0, W/2) = even-w,
    [W/2, W) = odd-w). Equals `conv3d_strided._phase_split_xla`."""
    b, c, d, h, w = x.shape
    assert h % 2 == 0 and w % 2 == 0
    perm = jnp.asarray(_w_parity_perm(w))
    out = jax.ShapeDtypeStruct((b, c, d, h // 2, w), x.dtype)
    return pl.pallas_call(
        _hwsplit_kernel,
        grid=(b, d),
        in_specs=[
            pl.BlockSpec((None, c, None, h, w),
                         lambda bi, di: (bi, 0, di, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, w), lambda bi, di: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((None, c, None, h // 2, w),
                                lambda bi, di: (bi, 0, di, 0, 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[out, out],
        compiler_params=_CPARAMS,
        interpret=interpret,
    )(x, perm)
