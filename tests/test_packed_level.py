"""Packed 64^3-level plumbing + strided Pallas kernel math.

The flagship runs its second level in a PACKED layout (D-pairs on lanes,
`ops/pallas/conv3d_strided.py`); on CPU every packed conv takes the exact
XLA fallback, so the packed model must match the plain model bit-for-bit
(up to f32 summation order). The kernels themselves are checked in
interpret mode against XLA convs, including their custom VJPs.

Reference parity: the convs being accelerated are the level-transition
ConvBlock(strides=2) / UpBlock deconv of `attn_unet_data_parallel.py:310-346`
and `:120-131`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import coma_unet_tpu.ops.pallas.conv3d_strided as strided
from coma_unet_tpu.config import ModelConfig
from coma_unet_tpu.models.attention_unet import AttentionUNet
from coma_unet_tpu.models.blocks import transposed_padding
from coma_unet_tpu.ops.pallas.conv3d_packed import _packed_dw, _packed_fwd

HI = jax.lax.Precision.HIGHEST


def _rel(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return np.abs(a - b).max() / (np.abs(b).max() + 1e-8)


def _xla_s2(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (2, 2, 2), [(1, 1)] * 3,
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"), precision=HI)


def _xla_t2(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), transposed_padding((3, 3, 3), (2, 2, 2)),
        lhs_dilation=(2, 2, 2),
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"), precision=HI)


def _xla_s1(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"), precision=HI)


def test_pack_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 3, 6, 4, 8)), jnp.float32)
    assert np.array_equal(strided.unpack_w(strided.pack_w(x)), x)
    # element mapping: packed[..., p, h, wslot] with wslot = (d%2)*W + w
    xp = np.asarray(strided.pack_w(x))
    assert np.array_equal(xp[0, 0, 1, 2, 8:], np.asarray(x)[0, 0, 3, 2, :])


def test_s2_kernel_interpret_matches_xla():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 3, 8, 8, 8)), jnp.float32)
    w = jnp.asarray(rng.uniform(-0.3, 0.3, (5, 3, 3, 3, 3)), jnp.float32)
    out = strided.unpack_w(strided._s2_fwd(x, w, interpret=True))
    assert _rel(out, _xla_s2(x, w)) < 1e-5


def test_t2_kernel_interpret_matches_xla():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 3, 6, 8, 16)), jnp.float32)
    w = jnp.asarray(rng.uniform(-0.3, 0.3, (5, 3, 3, 3, 3)), jnp.float32)
    out = strided._t2_fwd(strided.pack_w(x), w, interpret=True)
    assert _rel(out, _xla_t2(x, w)) < 1e-5


def test_packed_stride1_kernel_interpret_matches_xla():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 3, 6, 8, 64)), jnp.float32)
    w = jnp.asarray(rng.uniform(-0.3, 0.3, (5, 3, 3, 3, 3)), jnp.float32)
    out = strided.unpack_w(_packed_fwd(strided.pack_w(x), w, interpret=True))
    assert _rel(out, _xla_s1(x, w)) < 1e-5


def test_strided_vjps_match_xla():
    rng = np.random.default_rng(4)
    b, cin, cout, d, h, wd = 2, 3, 5, 8, 8, 8
    x = jnp.asarray(rng.uniform(-1, 1, (b, cin, d, h, wd)), jnp.float32)
    w = jnp.asarray(rng.uniform(-0.3, 0.3, (cout, cin, 3, 3, 3)), jnp.float32)

    # stride-2: dx == transposed fwd w/ flipped kernel; dw == dilated corr
    g = jnp.asarray(
        rng.uniform(-1, 1, (b, cout, d // 2, h // 2, wd // 2)), jnp.float32)
    gp = strided.pack_w(g)
    _, vjp = jax.vjp(lambda a, k: _xla_s2(a, k), x, w)
    rdx, rdw = vjp(g)
    dx = strided._t2_fwd(gp, strided._flip_t(w), interpret=True)
    dw = strided._dw_dil(x, gp, interpret=True)
    dw = jnp.transpose(dw, (1, 2, 0)).reshape(cout, cin, 3, 3, 3)
    assert _rel(dx, rdx) < 1e-5 and _rel(dw, rdw) < 1e-5

    # transposed: dx == stride-2 fwd w/ flipped kernel; dw == dilated corr
    # with channels transposed and taps flipped (t' = 2 - t)
    g2 = jnp.asarray(
        rng.uniform(-1, 1, (b, cout, 2 * d, 2 * h, 2 * wd)), jnp.float32)
    _, vjp2 = jax.vjp(lambda a, k: _xla_t2(a, k), x, w)
    rdx2, rdw2 = vjp2(g2)
    dx2 = strided.unpack_w(
        strided._s2_fwd(g2, strided._flip_t(w), interpret=True))
    dwr = strided._dw_dil(g2, strided.pack_w(x), interpret=True)
    dw2 = jnp.flip(
        jnp.transpose(dwr, (2, 1, 0)).reshape(cout, cin, 3, 3, 3),
        axis=(2, 3, 4))
    assert _rel(dx2, rdx2) < 1e-5 and _rel(dw2, rdw2) < 1e-5


@pytest.mark.parametrize("fwd,dw", [
    (strided._s2_fwd_v1, strided._dw_dil_v1),
    (strided._s2_fwd_v2, strided._dw_v2),
])
def test_s2_versions_interpret_match_xla(fwd, dw):
    """Both s2/dw kernel generations (v1 decimation, v2 phase-split) stay
    exact regardless of which one COMA_S2_PHASE selects as default."""
    rng = np.random.default_rng(11)
    b, cin, cout, d, h, wd = 2, 3, 5, 8, 8, 8
    x = jnp.asarray(rng.uniform(-1, 1, (b, cin, d, h, wd)), jnp.float32)
    w = jnp.asarray(rng.uniform(-0.3, 0.3, (cout, cin, 3, 3, 3)), jnp.float32)
    out = strided.unpack_w(fwd(x, w, interpret=True))
    assert _rel(out, _xla_s2(x, w)) < 1e-5
    g = jnp.asarray(
        rng.uniform(-1, 1, (b, cout, d // 2, h // 2, wd // 2)), jnp.float32)
    gp = strided.pack_w(g)
    _, vjp = jax.vjp(lambda a, k: _xla_s2(a, k), x, w)
    _, rdw = vjp(g)
    got = dw(x, gp, interpret=True)
    got = jnp.transpose(got, (1, 2, 0)).reshape(cout, cin, 3, 3, 3)
    assert _rel(got, rdw) < 1e-5
    # per-sample (CondConv) weights
    wb = jnp.asarray(
        rng.uniform(-0.3, 0.3, (b, cout, cin, 3, 3, 3)), jnp.float32)
    out_b = fwd(x, wb, interpret=True)
    ref_b = jnp.concatenate(
        [fwd(x[i:i + 1], wb[i], interpret=True) for i in range(b)])
    assert _rel(out_b, ref_b) < 1e-5
    dw_b = dw(x, gp, batched=True, interpret=True)
    for i in range(b):
        dw_i = dw(x[i:i + 1], gp[i:i + 1], interpret=True)
        assert _rel(dw_b[i], dw_i) < 1e-5


@pytest.mark.parametrize("fwd", [strided._t2_fwd_v1, strided._t2_fwd_v2])
def test_t2_versions_interpret_match_xla(fwd):
    """Both t2 generations (v1 scatter-dilate, v2 phase-split) stay exact."""
    rng = np.random.default_rng(12)
    b, cin, cout, d, h, wd = 2, 3, 5, 6, 8, 16
    x = jnp.asarray(rng.uniform(-1, 1, (b, cin, d, h, wd)), jnp.float32)
    w = jnp.asarray(rng.uniform(-0.3, 0.3, (cout, cin, 3, 3, 3)), jnp.float32)
    out = fwd(strided.pack_w(x), w, interpret=True)
    assert _rel(out, _xla_t2(x, w)) < 1e-5
    wb = jnp.asarray(
        rng.uniform(-0.3, 0.3, (b, cout, cin, 3, 3, 3)), jnp.float32)
    out_b = fwd(strided.pack_w(x), wb, interpret=True)
    ref_b = jnp.concatenate(
        [fwd(strided.pack_w(x)[i:i + 1], wb[i], interpret=True)
         for i in range(b)])
    assert _rel(out_b, ref_b) < 1e-5


def test_packed_stride1_dw_matches_xla():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 3, 6, 8, 64)), jnp.float32)
    w = jnp.asarray(rng.uniform(-0.3, 0.3, (5, 3, 3, 3, 3)), jnp.float32)
    g = jnp.asarray(rng.uniform(-1, 1, (2, 5, 6, 8, 64)), jnp.float32)
    _, vjp = jax.vjp(lambda a, k: _xla_s1(a, k), x, w)
    _, rdw = vjp(g)
    dw = _packed_dw(strided.pack_w(x), strided.pack_w(g), interpret=True)
    assert _rel(dw, rdw) < 1e-5


@pytest.mark.parametrize("conditional", [False, True])
def test_packed_level_model_parity(conditional):
    """On CPU all packed convs take exact XLA fallbacks, so the packed-level
    model (W=128 triggers `packed_lvl`) must match pallas_convs=False."""
    shape = (8, 8, 128)  # D % 4 == 0, H % 2 == 0, W == 128
    kw = dict(
        channels=(4, 8, 16), strides=(2, 2), latent_spaces=(8, 8, 8),
        prompt_shape=shape, num_experts=2, compute_dtype="float32",
        dropout=0.0, conditional=conditional, remat=False,
    )
    cfg_p = ModelConfig(pallas_convs=True, **kw)
    cfg_n = ModelConfig(pallas_convs=False, **kw)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(2, 1) + shape), jnp.float32)
    cov = jnp.asarray(rng.uniform(0, 1, (2, 1, 6)), jnp.float32)

    m_p, m_n = AttentionUNet(cfg_p), AttentionUNet(cfg_n)
    params = m_p.init(jax.random.PRNGKey(0), x, cov, train=False)
    out_p = m_p.apply(params, x, cov, train=False)
    out_n = m_n.apply(params, x, cov, train=False)
    assert _rel(out_p.out, out_n.out) < 1e-5
    for a, b in zip(out_p.encoder, out_n.encoder):
        assert a.shape == b.shape and _rel(a, b) < 1e-5
    for a, b in zip(out_p.decoder, out_n.decoder):
        assert a.shape == b.shape and _rel(a, b) < 1e-5
    for a, b in zip(out_p.attention, out_n.attention):
        assert a.shape == b.shape and _rel(a, b) < 1e-5

    # gradients flow through the packed plumbing identically
    def loss(mdl, p):
        return jnp.sum(mdl.apply(p, x, cov, train=False).out ** 2)

    g_p = jax.grad(lambda p: loss(m_p, p))(params)
    g_n = jax.grad(lambda p: loss(m_n, p))(params)
    flat_p = jax.tree_util.tree_leaves(g_p)
    flat_n = jax.tree_util.tree_leaves(g_n)
    # pack/unpack reorders f32 summation, so near-zero leaves carry
    # cancellation noise — compare against the global gradient scale
    gmax = max(float(jnp.abs(b).max()) for b in flat_n)
    for a, b in zip(flat_p, flat_n):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=1e-3, atol=1e-4 * gmax,
        )


def test_batched_weight_kernels_match_per_sample():
    """The batched-weight (per-sample CondConv kernel) variants must equal a
    per-sample loop of the shared-weight kernels, forward and VJP."""
    import coma_unet_tpu.ops.pallas.conv3d as c3
    from coma_unet_tpu.ops.pallas.conv3d_packed import (
        _packed_dw, _packed_fwd,
    )

    rng = np.random.default_rng(7)
    b, cin, cout, d, h, wd = 3, 4, 5, 8, 8, 8
    x = jnp.asarray(rng.uniform(-1, 1, (b, cin, d, h, wd)), jnp.float32)
    wb = jnp.asarray(rng.uniform(-0.3, 0.3, (b, cout, cin, 3, 3, 3)),
                     jnp.float32)

    # stride-1
    out_b = c3._pallas_conv3d_fwd(x, wb, 3, interpret=True)
    ref = jnp.concatenate([
        c3._pallas_conv3d_fwd(x[i:i + 1], wb[i], 3, interpret=True)
        for i in range(b)
    ])
    assert _rel(out_b, ref) < 1e-6
    g = jnp.asarray(rng.uniform(-1, 1, out_b.shape), jnp.float32)
    dw_b = c3._pallas_conv3d_dw(x, g, 3, batched=True, interpret=True)
    for i in range(b):
        dw_i = c3._pallas_conv3d_dw(x[i:i + 1], g[i:i + 1], 3,
                                    interpret=True)
        assert _rel(dw_b[i], dw_i) < 1e-6

    # stride-2 (packed out)
    out_b = strided._s2_fwd(x, wb, interpret=True)
    ref = jnp.concatenate([
        strided._s2_fwd(x[i:i + 1], wb[i], interpret=True) for i in range(b)
    ])
    assert _rel(out_b, ref) < 1e-6
    gp = jnp.asarray(rng.uniform(-1, 1, out_b.shape), jnp.float32)
    dwd_b = strided._dw_dil(x, gp, batched=True, interpret=True)
    for i in range(b):
        dwd_i = strided._dw_dil(x[i:i + 1], gp[i:i + 1], interpret=True)
        assert _rel(dwd_b[i], dwd_i) < 1e-6

    # transposed (packed in)
    xp = strided.pack_w(x)
    wt = jnp.asarray(rng.uniform(-0.3, 0.3, (b, cout, cin, 3, 3, 3)),
                     jnp.float32)
    out_b = strided._t2_fwd(xp, wt, interpret=True)
    ref = jnp.concatenate([
        strided._t2_fwd(xp[i:i + 1], wt[i], interpret=True) for i in range(b)
    ])
    assert _rel(out_b, ref) < 1e-6

    # packed stride-1
    x64 = jnp.asarray(rng.uniform(-1, 1, (b, cin, d, h, 64)), jnp.float32)
    xp64 = strided.pack_w(x64)
    out_b = _packed_fwd(xp64, wb, interpret=True)
    ref = jnp.concatenate([
        _packed_fwd(xp64[i:i + 1], wb[i], interpret=True) for i in range(b)
    ])
    assert _rel(out_b, ref) < 1e-6
    g64 = jnp.asarray(rng.uniform(-1, 1, out_b.shape), jnp.float32)
    dwp_b = _packed_dw(xp64, g64, batched=True, interpret=True)
    for i in range(b):
        dwp_i = _packed_dw(xp64[i:i + 1], g64[i:i + 1], interpret=True)
        assert _rel(dwp_b[i], dwp_i) < 1e-6


def test_batched_vjp_ops_match_xla():
    """pallas_conv3d_{s2,t2}_b custom VJPs vs jax.vjp of per-sample XLA."""
    rng = np.random.default_rng(8)
    b, cin, cout, d, h, wd = 2, 3, 4, 8, 8, 8
    x = jnp.asarray(rng.uniform(-1, 1, (b, cin, d, h, wd)), jnp.float32)
    wb = jnp.asarray(rng.uniform(-0.3, 0.3, (b, cout, cin, 3, 3, 3)),
                     jnp.float32)

    def xla_s2_b(x_, w_):
        return jnp.concatenate([
            _xla_s2(x_[i:i + 1], w_[i]) for i in range(b)
        ])

    ref, vjp = jax.vjp(xla_s2_b, x, wb)
    g = jnp.asarray(rng.uniform(-1, 1, ref.shape), jnp.float32)
    rdx, rdw = vjp(g)
    gp = strided.pack_w(g)
    dx = strided._t2_fwd(gp, strided._flip_t_b(wb), interpret=True)
    dwd = strided._dw_dil(x, gp, batched=True, interpret=True)
    dw = jnp.transpose(dwd, (0, 2, 3, 1)).reshape(b, cout, cin, 3, 3, 3)
    assert _rel(strided.unpack_w(strided._s2_fwd(x, wb, interpret=True)),
                ref) < 1e-5
    assert _rel(dx, rdx) < 1e-5 and _rel(dw, rdw) < 1e-5

    def xla_t2_b(x_, w_):
        return jnp.concatenate([
            _xla_t2(x_[i:i + 1], w_[i]) for i in range(b)
        ])

    ref2, vjp2 = jax.vjp(xla_t2_b, x, wb)
    g2 = jnp.asarray(rng.uniform(-1, 1, ref2.shape), jnp.float32)
    rdx2, rdw2 = vjp2(g2)
    xp = strided.pack_w(x)
    dxp = strided._s2_fwd(g2, strided._flip_t_b(wb), interpret=True)
    dwd2 = strided._dw_dil(g2, xp, batched=True, interpret=True)
    dw2 = jnp.flip(
        jnp.transpose(dwd2, (0, 3, 2, 1)).reshape(b, cout, cin, 3, 3, 3),
        axis=(3, 4, 5))
    assert _rel(strided._t2_fwd(xp, wb, interpret=True), ref2) < 1e-5
    assert _rel(strided.unpack_w(dxp), rdx2) < 1e-5
    assert _rel(dw2, rdw2) < 1e-5


