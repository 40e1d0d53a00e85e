"""Which XLA formulation of the parity phase-split is cheapest on the chip?

probe_anatomy measured the strided-slice `_phase_split` prologue at 6.95 ms
for bf16[2,32,128^3] — ~90% of the s2-v2 kernel's total and the reason the
p1 family ties instead of winning. Each candidate below computes the SAME
H-parity (and for s2, W-parity-grouped) tensors; the winner replaces the
prologue in conv3d_strided/_p1.

    JAX_COMPILATION_CACHE_DIR=.jax_cache python scripts/probe_split.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

DT = jnp.bfloat16


def _fetch(out):
    return sum(float(jnp.sum(leaf.astype(jnp.float32)))
               for leaf in jax.tree.leaves(out))


def timeit(tag, fn, *args, n=20, warm=3):
    f = jax.jit(fn)
    t0 = time.time()
    _fetch(f(*args))
    compile_s = time.time() - t0
    for _ in range(warm):
        f(*args)
    t0 = time.time()
    out = None
    for _ in range(n):
        out = f(*args)
    _fetch(out)
    ms = (time.time() - t0) / n * 1000
    print(f"{tag:52s} {ms:8.2f} ms   (compile {compile_s:5.1f}s)", flush=True)
    return ms


def h_strided(x):
    return [x[:, :, :, hp::2, :] for hp in (0, 1)]


def h_reshape_idx(x):
    b, c, d, h, w = x.shape
    r = x.reshape(b, c, d, h // 2, 2, w)
    return [r[:, :, :, :, hp, :] for hp in (0, 1)]


def h_transpose(x):
    b, c, d, h, w = x.shape
    r = x.reshape(b, c, d, h // 2, 2, w).transpose(0, 1, 4, 2, 3, 5)
    return [r[:, :, 0], r[:, :, 1]]


def h_onehot(x, s_even, s_odd):
    # einsum over the sublane dim on the MXU: 0/1 selection is exact in bf16
    return [jnp.einsum("bcdhw,hk->bcdkw", x, s)
            for s in (s_even, s_odd)]


def dh_strided(x):
    return [x[:, :, pd::2, ph::2, :] for pd in (0, 1) for ph in (0, 1)]


def dh_reshape_idx(x):
    b, c, d, h, w = x.shape
    r = x.reshape(b, c, d // 2, 2, h // 2, 2, w)
    return [r[:, :, :, pd, :, ph, :] for pd in (0, 1) for ph in (0, 1)]


def s2v2_strided(x):
    # the current conv3d_strided._phase_split (H parity + W parity grouped)
    return [
        jnp.concatenate(
            [x[:, :, :, hp::2, 0::2], x[:, :, :, hp::2, 1::2]], axis=-1
        )
        for hp in (0, 1)
    ]


def s2v2_onehot_w(x, wsel, s_even, s_odd):
    # H split via reshape-index + W parity regroup via ONE lane-contraction
    # matmul (x @ P, P[w, w] a 0/1 permutation: even lanes left, odd right)
    b, c, d, h, w = x.shape
    r = x.reshape(b, c, d, h // 2, 2, w)
    return [jnp.einsum("bcdhw,wv->bcdhv", r[:, :, :, :, hp, :], wsel)
            for hp in (0, 1)]


def s2v2_h_onehot_w(x, wsel, s_even, s_odd):
    # both parities via MXU matmuls: H split one-hot + W regroup one-hot
    return [jnp.einsum("bcdhw,hk,wv->bcdkv", x, s, wsel)
            for s in (s_even, s_odd)]


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 32, 128, 128, 128)), DT)
    h = x.shape[3]
    w = x.shape[4]
    s_even = jnp.asarray(
        np.eye(h)[:, 0::2], DT)          # [H, H/2] pick even rows
    s_odd = jnp.asarray(np.eye(h)[:, 1::2], DT)
    perm = np.zeros((w, w), np.float32)
    perm[np.arange(0, w, 2), np.arange(w // 2)] = 1.0
    perm[np.arange(1, w, 2), np.arange(w // 2, w)] = 1.0
    wsel = jnp.asarray(perm, DT)

    print("devices:", jax.devices(), flush=True)
    timeit("h-split strided slice (current)", h_strided, x)
    timeit("h-split reshape+index", h_reshape_idx, x)
    timeit("h-split reshape+transpose (both at once)", h_transpose, x)
    timeit("h-split one-hot einsum (MXU)", h_onehot, x, s_even, s_odd)
    timeit("dh-split strided slice (p1 current)", dh_strided, x)
    timeit("dh-split reshape+index", dh_reshape_idx, x)
    timeit("s2v2-split strided (current)", s2v2_strided, x)
    timeit("s2v2-split W one-hot + H reshape", s2v2_onehot_w, x, wsel,
           s_even, s_odd)
    timeit("s2v2-split all one-hot (MXU)", s2v2_h_onehot_w, x, wsel,
           s_even, s_odd)


if __name__ == "__main__":
    main()
