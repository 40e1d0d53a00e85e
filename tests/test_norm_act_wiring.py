"""Convolution/CondConvolution with the fused norm+act path forced
(COMA_NORM_FUSED=force runs the Pallas kernels in interpret mode on CPU)
vs the unfused reference path: same param tree, same outputs/grads to
f32-vs-chain tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coma_unet_tpu.models.blocks import CondConvolution, Convolution


def _tree_paths(params):
    return set(jax.tree_util.tree_map_with_path(
        lambda p, _: jax.tree_util.keystr(p), params,
        is_leaf=lambda x: not isinstance(x, dict),
    ).keys()) if isinstance(params, dict) else set()


def _flat_names(params):
    return sorted(
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_flatten_with_path(params)[0]
    )


@pytest.mark.parametrize("act", ["prelu", "leakyrelu"])
def test_convolution_fused_matches_unfused(monkeypatch, act):
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 3, 4, 8, 128)), jnp.float32
    )
    mod = Convolution(out_channels=4, act=act, norm="instance",
                      use_pallas=True, dtype=jnp.float32)

    monkeypatch.setenv("COMA_NORM_FUSED", "force")
    params_f = mod.init(jax.random.PRNGKey(0), x, False)
    y_f = mod.apply(params_f, x, False)
    gx_f, gp_f = jax.grad(
        lambda x_, p_: jnp.sum(mod.apply(p_, x_, False) ** 2), argnums=(0, 1)
    )(x, params_f)

    monkeypatch.setenv("COMA_NORM_FUSED", "0")
    params_u = mod.init(jax.random.PRNGKey(0), x, False)
    assert _flat_names(params_f) == _flat_names(params_u)
    y_u = mod.apply(params_u, x, False)
    gx_u, gp_u = jax.grad(
        lambda x_, p_: jnp.sum(mod.apply(p_, x_, False) ** 2), argnums=(0, 1)
    )(x, params_u)

    np.testing.assert_allclose(y_f, y_u, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(gx_f, gx_u, rtol=1e-3, atol=1e-4)
    for (pf, lf), (pu, lu) in zip(
        jax.tree_util.tree_flatten_with_path(gp_f)[0],
        jax.tree_util.tree_flatten_with_path(gp_u)[0],
    ):
        assert pf == pu
        if jax.tree_util.keystr(pf) == "['params']['bias']":
            # a conv bias feeding instance norm is cancelled by the mean
            # subtraction: its true gradient is exactly 0, and both paths
            # produce only rounding-level noise around it
            np.testing.assert_allclose(lf, 0.0, atol=5e-2, err_msg=str(pf))
            np.testing.assert_allclose(lu, 0.0, atol=5e-2, err_msg=str(pf))
            continue
        np.testing.assert_allclose(lf, lu, rtol=1e-3, atol=2e-3,
                                   err_msg=str(pf))


def test_cond_convolution_fused_matches_unfused(monkeypatch):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 3, 4, 8, 128)), jnp.float32)
    cov = jnp.asarray(rng.normal(size=(2, 5)), jnp.float32)
    mod = CondConvolution(out_channels=4, act="prelu", norm="instance",
                          film=True, use_pallas=True, dtype=jnp.float32)

    monkeypatch.setenv("COMA_NORM_FUSED", "force")
    params_f = mod.init(jax.random.PRNGKey(0), x, cov, False)
    # non-zero FiLM so the fused scale/shift actually bites
    params_f = jax.tree.map(
        lambda v: v + 0.05 if v.ndim == 2 else v, params_f
    )
    y_f = mod.apply(params_f, x, cov, False)
    g_f = jax.grad(
        lambda p_: jnp.sum(mod.apply(p_, x, cov, False) ** 2)
    )(params_f)

    monkeypatch.setenv("COMA_NORM_FUSED", "0")
    params_u = mod.init(jax.random.PRNGKey(0), x, cov, False)
    assert _flat_names(params_f) == _flat_names(params_u)
    y_u = mod.apply(params_f, x, cov, False)
    g_u = jax.grad(
        lambda p_: jnp.sum(mod.apply(p_, x, cov, False) ** 2)
    )(params_f)

    np.testing.assert_allclose(y_f, y_u, rtol=1e-3, atol=1e-4)
    for (pf, lf), (pu, lu) in zip(
        jax.tree_util.tree_flatten_with_path(g_f)[0],
        jax.tree_util.tree_flatten_with_path(g_u)[0],
    ):
        assert pf == pu
        if jax.tree_util.keystr(pf) == "['params']['bias']":
            # cancelled by the norm's mean subtraction (see above)
            np.testing.assert_allclose(lf, 0.0, atol=5e-2, err_msg=str(pf))
            np.testing.assert_allclose(lu, 0.0, atol=5e-2, err_msg=str(pf))
            continue
        np.testing.assert_allclose(lf, lu, rtol=1e-3, atol=2e-3,
                                   err_msg=str(pf))
