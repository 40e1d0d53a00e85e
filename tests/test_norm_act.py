"""Fused instance-norm+FiLM+act (ops/pallas/norm_act.py) vs the reference
chain (InstanceNorm -> affine -> act), forward and grads, interpret mode
(conftest forces CPU -> the kernels auto-interpret through the REAL
custom-VJP entry points)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coma_unet_tpu.ops.pallas.norm_act import (
    _SLOPE,
    norm_act,
    norm_act_supported,
)

EPS = 1e-5


def ref_chain(x, alpha, scale, shift, act):
    xf = x.astype(jnp.float32)
    axes = tuple(range(2, x.ndim))
    mean = jnp.mean(xf, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=axes, keepdims=True)
    yhat = (xf - mean) * jax.lax.rsqrt(var + EPS)
    sh = scale.shape + (1,) * (x.ndim - 2)
    u = scale.reshape(sh) * yhat + shift.reshape(sh)
    if act == "relu":
        u = jnp.maximum(u, 0.0)
    elif act == "leakyrelu":
        u = jnp.where(u >= 0, u, _SLOPE * u)
    elif act == "prelu":
        u = jnp.where(u >= 0, u, alpha.reshape(-1)[0] * u)
    return u.astype(x.dtype)


def _mk(shape, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=shape), dtype)


@pytest.mark.parametrize("act", ["none", "relu", "leakyrelu", "prelu"])
def test_fwd_and_grads_match_reference(act):
    b, c, d, h, w = 2, 3, 4, 8, 128
    x = _mk((b, c, d, h, w))
    alpha = jnp.asarray([0.25], jnp.float32)
    scale = _mk((b, c), 1) * 0.1 + 1.0
    shift = _mk((b, c), 2) * 0.1

    got = norm_act(x, alpha, act, scale, shift)
    want = ref_chain(x, alpha, scale, shift, act)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def loss_fused(x_, a_, s_, t_):
        co = jnp.cos(jnp.arange(x_.size, dtype=jnp.float32)).reshape(x_.shape)
        return jnp.sum(norm_act(x_, a_, act, s_, t_) * co)

    def loss_ref(x_, a_, s_, t_):
        co = jnp.cos(jnp.arange(x_.size, dtype=jnp.float32)).reshape(x_.shape)
        return jnp.sum(ref_chain(x_, a_, s_, t_, act) * co)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, alpha, scale, shift)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, alpha, scale, shift)
    np.testing.assert_allclose(gf[0], gr[0], rtol=1e-3, atol=1e-4)
    if act == "prelu":
        np.testing.assert_allclose(gf[1], gr[1], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(gf[2], gr[2], rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(gf[3], gr[3], rtol=1e-3, atol=1e-3)


def test_c1_view_matches_reference():
    # the modulator's single-channel sites route through the [1, B, ...] view
    b, c, d, h, w = 3, 1, 4, 8, 128
    x = _mk((b, c, d, h, w), 3)
    alpha = jnp.asarray([0.25], jnp.float32)
    got = norm_act(x, alpha, "prelu")
    want = ref_chain(x, alpha, jnp.ones((b, c)), jnp.zeros((b, c)), "prelu")
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    gf = jax.grad(lambda x_: jnp.sum(norm_act(x_, alpha, "prelu") ** 2))(x)
    gr = jax.grad(
        lambda x_: jnp.sum(
            ref_chain(x_, alpha, jnp.ones((b, c)), jnp.zeros((b, c)),
                      "prelu") ** 2
        )
    )(x)
    np.testing.assert_allclose(gf, gr, rtol=1e-3, atol=1e-4)


def test_bf16_storage_f32_stats():
    x = _mk((2, 4, 4, 8, 128), 4, jnp.bfloat16)
    got = norm_act(x, None, "leakyrelu")
    want = ref_chain(x, jnp.zeros((1,)), jnp.ones((2, 4)), jnp.zeros((2, 4)),
                     "leakyrelu")
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(got.astype(np.float32),
                               want.astype(np.float32), rtol=0.1, atol=0.05)


def test_supported_gate():
    assert norm_act_supported((2, 16, 128, 128, 128))
    assert norm_act_supported((2, 64, 32, 64, 256))      # packed 64^3 layout
    assert norm_act_supported((2, 1, 128, 128, 128))     # C==1 via [1,B] view
    assert not norm_act_supported((1, 1, 128, 128, 128))  # b=c=1: no view
    assert not norm_act_supported((2, 16, 128, 128, 216))  # W not lane-aligned
    assert not norm_act_supported((2, 128, 32, 64, 256))   # C past VMEM plan
    assert not norm_act_supported((2, 16, 128, 128))
