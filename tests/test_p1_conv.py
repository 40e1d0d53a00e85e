"""Phase-decomposed stride-1 conv (ops/pallas/conv3d_p1): interpret-mode
exactness vs XLA for fwd / dw / full VJP, shared and per-sample kernels."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coma_unet_tpu.ops.pallas.conv3d_p1 import (
    _p1_dw,
    _p1_fwd,
    p1_supported,
    pallas_conv3d_p1,
    pallas_conv3d_p1_b,
)

HI = jax.lax.Precision.HIGHEST


def _xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"), precision=HI,
    )


@pytest.mark.parametrize("shape,co", [
    ((1, 3, 8, 6, 128), 5),
    ((2, 8, 4, 8, 128), 16),
    ((1, 1, 4, 4, 128), 4),    # Cin = 1 (the U-Net head input)
])
def test_fwd_matches_xla(shape, co):
    rng = np.random.default_rng(0)
    b, c = shape[:2]
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    w = jnp.asarray(rng.normal(size=(co, c, 3, 3, 3)) * 0.1, jnp.float32)
    got = _p1_fwd(x, w, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_xla_conv(x, w)),
                               rtol=1e-4, atol=1e-5)


def test_fwd_batched_kernels():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 6, 128)), jnp.float32)
    wb = jnp.asarray(rng.normal(size=(2, 6, 4, 3, 3, 3)) * 0.1, jnp.float32)
    got = _p1_fwd(x, wb, interpret=True)
    want = jnp.concatenate(
        [_xla_conv(x[i:i + 1], wb[i]) for i in range(2)]
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("batched", [False, True])
def test_dw_matches_xla(batched):
    rng = np.random.default_rng(2)
    b, ci, co = 2, 3, 5
    x = jnp.asarray(rng.normal(size=(b, ci, 4, 6, 128)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(b, co, 4, 6, 128)), jnp.float32)
    got = _p1_dw(x, g, batched=batched, interpret=True)
    if batched:
        want = jnp.stack([
            jax.grad(lambda w_: jnp.sum(_xla_conv(x[i:i + 1], w_)
                                        * g[i:i + 1]))(
                jnp.zeros((co, ci, 3, 3, 3)))
            for i in range(b)
        ])
    else:
        want = jax.grad(
            lambda w_: jnp.sum(_xla_conv(x, w_) * g)
        )(jnp.zeros((co, ci, 3, 3, 3)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_vjp_matches_xla():
    # interpret mode is automatic off-TPU (_interp) — the REAL custom-VJP
    # entry points run under CPU tests, no monkeypatching
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 8, 128)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(4, 4, 3, 3, 3)) * 0.1, jnp.float32)
    g1 = jax.grad(lambda a, b_: jnp.sum(pallas_conv3d_p1(a, b_) ** 2),
                  argnums=(0, 1))(x, w)
    g2 = jax.grad(lambda a, b_: jnp.sum(_xla_conv(a, b_) ** 2),
                  argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                               rtol=1e-3, atol=1e-3)


def test_vjp_batched_matches_unrolled():
    rng = np.random.default_rng(4)
    b = 2
    x = jnp.asarray(rng.normal(size=(b, 3, 4, 6, 128)), jnp.float32)
    wb = jnp.asarray(rng.normal(size=(b, 5, 3, 3, 3, 3)) * 0.1, jnp.float32)

    def loss_p1(a, w_):
        return jnp.sum(pallas_conv3d_p1_b(a, w_) ** 2)

    def loss_ref(a, w_):
        y = jnp.concatenate(
            [_xla_conv(a[i:i + 1], w_[i]) for i in range(b)]
        )
        return jnp.sum(y ** 2)

    g1 = jax.grad(loss_p1, argnums=(0, 1))(x, wb)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(x, wb)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                               rtol=1e-3, atol=1e-3)


def test_supported_gate():
    assert p1_supported((2, 32, 128, 128, 128), 32)
    assert p1_supported((2, 1, 128, 128, 128), 32)
    assert not p1_supported((2, 32, 128, 128, 256), 32)   # wide W
    assert not p1_supported((2, 64, 128, 128, 128), 32)   # Cin > 32
    assert not p1_supported((2, 32, 128, 128, 128), 64)   # Cout > 32
    assert not p1_supported((2, 32, 126, 128, 128), 32)   # D % 4 != 0
    assert not p1_supported((2, 32, 128, 4, 128), 32)     # H too small


@pytest.mark.parametrize("stack", ["1", "3"])
def test_stacked_variants_match_xla(stack, monkeypatch):
    """COMA_P1_STACK=3/1 fold the 9 tap dots into 3/1 stacked-K dots
    (VERDICT r4 item 2: cut the per-tap f32 accumulator traffic); same
    math as stack=9, pinned against XLA fwd + full VJP here."""
    monkeypatch.setenv("COMA_P1_STACK", stack)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 8, 128)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(6, 4, 3, 3, 3)) * 0.1, jnp.float32)
    got = _p1_fwd(x, w, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_xla_conv(x, w)),
                               rtol=1e-4, atol=1e-5)
    g1 = jax.grad(lambda a, b_: jnp.sum(pallas_conv3d_p1(a, b_) ** 2),
                  argnums=(0, 1))(x, w)
    g2 = jax.grad(lambda a, b_: jnp.sum(_xla_conv(a, b_) ** 2),
                  argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("stack", ["1", "3"])
def test_stacked_variants_batched(stack, monkeypatch):
    monkeypatch.setenv("COMA_P1_STACK", stack)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(2, 3, 4, 6, 128)), jnp.float32)
    wb = jnp.asarray(rng.normal(size=(2, 5, 3, 3, 3, 3)) * 0.1, jnp.float32)
    got = _p1_fwd(x, wb, interpret=True)
    want = jnp.concatenate(
        [_xla_conv(x[i:i + 1], wb[i]) for i in range(2)]
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_midsize_lanepad_exact():
    """The 96<W<128 lane-pad route (216^3 template geometry's level-1,
    108^3 — VERDICT r4 item 3): zero-pad W->128 and H->/8, run p1, crop.
    Exact for SAME k=3 because pad rows/cols are zero and the last true
    row/col's +1 tap reads the first pad zero (models/blocks.py conv3d)."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(1, 4, 8, 12, 108)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(6, 4, 3, 3, 3)) * 0.1, jnp.float32)
    xp = jnp.pad(x, [(0, 0), (0, 0), (0, 0), (0, 4), (0, 20)])
    got = _p1_fwd(xp, w, interpret=True)[..., :12, :108]
    np.testing.assert_allclose(np.asarray(got), np.asarray(_xla_conv(x, w)),
                               rtol=1e-4, atol=1e-5)
