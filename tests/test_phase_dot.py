"""phase_dot s2/t2 == lax.conv_general_dilated (values AND grads).

The phase-dot lowering exists so the 216^3 template-space path never emits
a wide XLA conv (scripts/trace_216_bwd.py, artifacts/r3/probe_216_oom.log);
these tests pin its math to the conv it replaces, including through
autodiff (its whole point is that dx/dw stay conv-free)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coma_unet_tpu.models.blocks import same_padding, transposed_padding
from coma_unet_tpu.ops.phase_dot import (
    phase_dot_s2,
    phase_dot_s2_einsum,
    phase_dot_t2,
    phase_dot_t2_einsum,
)

DIMNUMS = ("NCDHW", "OIDHW", "NCDHW")


def _xla_s2(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(2, 2, 2), padding=same_padding((3, 3, 3)),
        dimension_numbers=DIMNUMS,
    )


def _xla_t2(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1, 1),
        padding=transposed_padding((3, 3, 3), (2, 2, 2)),
        lhs_dilation=(2, 2, 2), dimension_numbers=DIMNUMS,
    )


@pytest.mark.parametrize("shape,cout", [((1, 3, 6, 8, 10), 5),
                                        ((2, 4, 8, 8, 8), 4),
                                        ((1, 1, 4, 6, 4), 2)])
def test_s2_matches_xla(shape, cout):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    w = jnp.asarray(rng.normal(size=(cout, shape[1], 3, 3, 3)), jnp.float32)
    np.testing.assert_allclose(phase_dot_s2(x, w), _xla_s2(x, w),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(phase_dot_s2_einsum(x, w), _xla_s2(x, w),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape,cout", [((1, 4, 3, 4, 5), 3),
                                        ((2, 2, 4, 4, 4), 4)])
def test_t2_matches_xla(shape, cout):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    w = jnp.asarray(rng.normal(size=(cout, shape[1], 3, 3, 3)), jnp.float32)
    np.testing.assert_allclose(phase_dot_t2(x, w), _xla_t2(x, w),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(phase_dot_t2_einsum(x, w), _xla_t2(x, w),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape,cout", [((1, 3, 6, 8, 10), 5),
                                        ((2, 4, 8, 8, 8), 4)])
def test_s2_std_matches_xla(shape, cout):
    from coma_unet_tpu.ops.phase_dot import phase_dot_s2_std

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    w = jnp.asarray(rng.normal(size=(cout, shape[1], 3, 3, 3)), jnp.float32)
    np.testing.assert_allclose(phase_dot_s2_std(x, w), _xla_s2(x, w),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape,cout", [((1, 4, 3, 4, 5), 3),
                                        ((2, 2, 4, 4, 4), 4)])
def test_t2_std_matches_xla(shape, cout):
    from coma_unet_tpu.ops.phase_dot import phase_dot_t2_std

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    w = jnp.asarray(rng.normal(size=(cout, shape[1], 3, 3, 3)), jnp.float32)
    np.testing.assert_allclose(phase_dot_t2_std(x, w), _xla_t2(x, w),
                               rtol=1e-5, atol=1e-5)


def _std_fns():
    from coma_unet_tpu.ops.phase_dot import phase_dot_s2_std, phase_dot_t2_std

    return [(phase_dot_s2_std, _xla_s2), (phase_dot_t2_std, _xla_t2)]


@pytest.mark.parametrize("fn,ref", [(phase_dot_s2_einsum, _xla_s2),
                                    (phase_dot_t2_einsum, _xla_t2)] + _std_fns())
def test_grads_match_xla(fn, ref):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 3, 4, 6, 4)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(2, 3, 3, 3, 3)), jnp.float32)

    def loss(f):
        return lambda x, w: jnp.sum(jnp.sin(f(x, w)))

    gx, gw = jax.grad(loss(fn), argnums=(0, 1))(x, w)
    rx, rw = jax.grad(loss(ref), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(gx, rx, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(gw, rw, rtol=1e-5, atol=1e-5)


def _bwd(fn):
    def f(x, w):
        y, vjp = jax.vjp(fn, x, w)
        return vjp(jnp.ones_like(y))
    return f


def test_einsum_vjp_emits_no_convs():
    """The einsum formulation's defining property: d/d(x,w) has no conv
    ops at all (kept as the zero-conv reference lowering)."""
    x = jax.ShapeDtypeStruct((1, 4, 8, 8, 8), jnp.float32)
    w = jax.ShapeDtypeStruct((6, 4, 3, 3, 3), jnp.float32)
    for fn in (phase_dot_s2_einsum, phase_dot_t2_einsum):
        jaxpr = jax.make_jaxpr(_bwd(fn))(x, w)
        assert "conv_general_dilated" not in str(jaxpr)


def test_std_vjp_convs_run_at_half_extent():
    """The dispatched (std) formulation's memory property: every conv in
    fwd+vjp (fwd, dx, dw) operates at HALF the full spatial extent — the
    full-extent small-channel conv (XLA's channel-minor relayout class,
    scripts/trace_216_bwd.py) never appears; full-extent tensors are only
    touched by layout ops (space-to-depth / depth-to-space)."""
    x = jax.ShapeDtypeStruct((1, 4, 8, 8, 8), jnp.float32)
    w = jax.ShapeDtypeStruct((6, 4, 3, 3, 3), jnp.float32)

    def walk(jaxpr, hits):
        for eqn in jaxpr.eqns:
            if eqn.primitive.name == "conv_general_dilated":
                hits.append(eqn.invars[0].aval.shape)
            for v in eqn.params.values():
                if hasattr(v, "jaxpr"):
                    walk(v.jaxpr, hits)
                elif hasattr(v, "eqns"):
                    walk(v, hits)

    # "full extent" = the larger of the op's input/output extents (8 for
    # s2 on an 8^3 input, 16 for t2); every conv must run at half that.
    for fn, full in ((phase_dot_s2, 8), (phase_dot_t2, 16)):
        hits = []
        walk(jax.make_jaxpr(_bwd(fn))(x, w).jaxpr, hits)
        assert hits, "std lowering should contain its k=2 conv"
        for lhs in hits:
            assert max(lhs[-3:]) <= full // 2, (fn.__name__, lhs)


@pytest.mark.parametrize("k", [1, 3])
@pytest.mark.parametrize("cin", [1, 3])
def test_shift_dot_dw_matches_xla(k, cin):
    from coma_unet_tpu.ops.phase_dot import shift_dot_dw

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, cin, 4, 6, 4)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(5, cin, k, k, k)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(2, 5, 4, 6, 4)), jnp.float32)

    def conv(w):
        pad = (k - 1) // 2
        return jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), [(pad, pad)] * 3, dimension_numbers=DIMNUMS)

    (ref,) = jax.vjp(conv, w)[1](g)
    np.testing.assert_allclose(shift_dot_dw(x, g, k), ref,
                               rtol=1e-5, atol=1e-5)


def test_shift_dot_dw_batched_matches_grouped():
    """Per-sample (CondConv) Cin==1 weight grad == the grouped-conv vjp it
    replaced in `_bwd_b` (ops/pallas/conv3d.py)."""
    from coma_unet_tpu.ops.phase_dot import shift_dot_dw

    k, b, cout = 3, 2, 4
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(b, 1, 4, 4, 4)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(b, cout, 1, k, k, k)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(b, cout, 4, 4, 4)), jnp.float32)

    def grouped(w_):
        kg = w_.reshape((b * cout, 1) + w_.shape[3:])
        xg = x.reshape((1, b) + x.shape[2:])
        y = jax.lax.conv_general_dilated(
            xg, kg, (1, 1, 1), [(1, 1)] * 3, dimension_numbers=DIMNUMS,
            feature_group_count=b)
        return y.reshape((b, cout) + y.shape[2:])

    (ref,) = jax.vjp(grouped, w)[1](g)
    np.testing.assert_allclose(shift_dot_dw(x, g, k, batched=True), ref,
                               rtol=1e-5, atol=1e-5)


def test_s2_rejects_odd_extent():
    x = jnp.zeros((1, 2, 5, 4, 4))
    w = jnp.zeros((2, 2, 3, 3, 3))
    with pytest.raises(ValueError):
        phase_dot_s2(x, w)
