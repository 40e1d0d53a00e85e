"""Pallas conv3d kernel: interpret-mode correctness vs XLA + gating."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coma_unet_tpu.ops.pallas.conv3d import (
    _pallas_conv3d_fwd,
    _xla_conv,
    pallas_conv3d,
    pallas_conv3d_supported,
)


@pytest.mark.parametrize("shape,k", [
    ((2, 4, 5, 8, 128), 3),
    ((1, 3, 4, 16, 128), 1),
    ((1, 1, 3, 8, 128), 3),   # single-channel (the U-Net head input)
])
def test_interpret_matches_xla(shape, k):
    rng = np.random.default_rng(0)
    b, c, d, h, w = shape
    co = c + 1
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    wk = jnp.asarray(rng.normal(size=(co, c, k, k, k)) * 0.1, jnp.float32)
    got = _pallas_conv3d_fwd(x, wk, k, interpret=True)
    want = _xla_conv(x, wk, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_gradients_match_xla():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 8, 128)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(4, 4, 3, 3, 3)) * 0.1, jnp.float32)

    import coma_unet_tpu.ops.pallas.conv3d as M

    # route the custom-vjp kernels through interpret mode for CPU testing
    orig_fwd = M._pallas_conv3d_fwd
    orig_dw = M._pallas_conv3d_dw
    M._pallas_conv3d_fwd = lambda x, w, k, interpret=False: orig_fwd(
        x, w, k, interpret=True
    )
    M._pallas_conv3d_dw = lambda x, g, k, interpret=False: orig_dw(
        x, g, k, interpret=True
    )
    try:
        g1 = jax.grad(lambda a, b: jnp.sum(pallas_conv3d(a, b, 3) ** 2),
                      argnums=(0, 1))(x, w)
    finally:
        M._pallas_conv3d_fwd = orig_fwd
        M._pallas_conv3d_dw = orig_dw
    g2 = jax.grad(lambda a, b: jnp.sum(_xla_conv(a, b, 3) ** 2),
                  argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                               rtol=1e-3, atol=1e-3)


def test_support_gate():
    import jax as _jax

    on_tpu = _jax.default_backend() == "tpu"
    ok = pallas_conv3d_supported((2, 16, 128, 128, 128), 3, (1, 1, 1), False)
    assert ok == on_tpu  # gate also requires the TPU backend
    # rejects: transposed, strided, wrong W, big C, groups
    assert not pallas_conv3d_supported((2, 16, 128, 128, 128), 3, (1, 1, 1), True)
    assert not pallas_conv3d_supported((2, 16, 64, 64, 64), 3, (2, 2, 2), False)
    assert not pallas_conv3d_supported((2, 16, 16, 16, 16), 3, (1, 1, 1), False)
    assert not pallas_conv3d_supported((2, 64, 128, 128, 128), 3, (1, 1, 1), False)
    assert not pallas_conv3d_supported(
        (2, 16, 128, 128, 128), 3, (1, 1, 1), False, groups=2
    )


def test_dw_kernel_matches_xla_interpret():
    from coma_unet_tpu.ops.pallas.conv3d import _pallas_conv3d_dw

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 3, 4, 8, 128)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(2, 5, 4, 8, 128)), jnp.float32)
    got = _pallas_conv3d_dw(x, g, 3, interpret=True)
    _, w_vjp = jax.vjp(
        lambda w_: _xla_conv(x, w_, 3), jnp.zeros((5, 3, 3, 3, 3))
    )
    (want,) = w_vjp(g)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=1e-3)


def test_htiled_wide_fwd_matches_xla_interpret():
    """h > 128 routes k=3 through the H-tiled wide kernel (1-row halos,
    H padded to a 32-row multiple) — exact vs XLA, incl. per-sample
    (CondConv) weights."""
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(1, 4, 3, 136, 128)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(5, 4, 3, 3, 3)) * 0.1, jnp.float32)
    got = _pallas_conv3d_fwd(x, w, 3, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_xla_conv(x, w, 3)),
                               rtol=1e-4, atol=1e-5)
    # batched (per-sample) weights
    xb = jnp.asarray(rng.normal(size=(2, 4, 3, 136, 128)), jnp.float32)
    wb = jnp.asarray(rng.normal(size=(2, 5, 4, 3, 3, 3)) * 0.1, jnp.float32)
    gotb = _pallas_conv3d_fwd(xb, wb, 3, interpret=True)
    refb = jnp.concatenate([
        _xla_conv(xb[i:i + 1], wb[i], 3) for i in range(2)
    ])
    np.testing.assert_allclose(np.asarray(gotb), np.asarray(refb),
                               rtol=1e-4, atol=1e-5)


def test_htiled_wide_dw_matches_xla_interpret():
    from coma_unet_tpu.ops.pallas.conv3d import _pallas_conv3d_dw

    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.normal(size=(2, 3, 3, 136, 128)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(2, 5, 3, 136, 128)), jnp.float32)
    got = _pallas_conv3d_dw(x, g, 3, interpret=True)
    _, w_vjp = jax.vjp(
        lambda w_: _xla_conv(x, w_, 3), jnp.zeros((5, 3, 3, 3, 3))
    )
    (want,) = w_vjp(g)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=1e-3)
    # batched: per-sample weight grads
    gotb = _pallas_conv3d_dw(x, g, 3, batched=True, interpret=True)
    for i in range(2):
        _, w_vjp = jax.vjp(
            lambda w_: _xla_conv(x[i:i + 1], w_, 3),
            jnp.zeros((5, 3, 3, 3, 3)),
        )
        (want_i,) = w_vjp(g[i:i + 1])
        np.testing.assert_allclose(np.asarray(gotb[i]), np.asarray(want_i),
                                   rtol=1e-3, atol=1e-3)


def test_packed_w64_matches_xla_interpret():
    from coma_unet_tpu.ops.pallas.conv3d_packed import pallas_conv3d_w64

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 4, 6, 8, 64)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(5, 4, 3, 3, 3)) * 0.1, jnp.float32)
    got = pallas_conv3d_w64(x, w, interpret=True)
    want = _xla_conv(x, w, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_pallas_instance_norm_interpret():
    from coma_unet_tpu.ops.pallas.instance_norm import pallas_instance_norm

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 4, 6, 8, 128)).astype(np.float32) * 3 + 1)
    got = np.asarray(pallas_instance_norm(x, act="relu", interpret=True))
    xf = np.asarray(x)
    m = xf.mean(axis=(2, 3, 4), keepdims=True)
    v = xf.var(axis=(2, 3, 4), keepdims=True)
    want = np.maximum((xf - m) / np.sqrt(v + 1e-5), 0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_wide_lane_pad_dispatch(monkeypatch):
    """W > 128 (template-space analogue): conv3d lane-pads into the Pallas
    path for k=3 (direct at c<=16, channel-split at c=32 — the unsplit wide
    Mosaic program crashes the compile helper) and stays exact vs XLA."""
    import coma_unet_tpu.models.blocks as B
    import coma_unet_tpu.ops.pallas.conv3d as M

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    orig_fwd = M._pallas_conv3d_fwd
    monkeypatch.setattr(
        M, "_pallas_conv3d_fwd",
        lambda x, w, k, interpret=False: orig_fwd(x, w, k, interpret=True),
    )
    rng = np.random.default_rng(7)
    pad3 = B.same_padding((3, 3, 3))
    for cin in (4, 32):  # direct wide path / channel-split wide path
        x = jnp.asarray(rng.normal(size=(1, cin, 6, 8, 136)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(8, cin, 3, 3, 3)) * 0.1, jnp.float32)
        got = B.conv3d(x, w, (1, 1, 1), pad3, use_pallas=True)
        ref = _xla_conv(x, w, 3)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)
    # the support gate itself: k=3 wide slabs capped at 16 channels
    assert pallas_conv3d_supported((1, 16, 216, 216, 256), 3, (1, 1, 1), False)
    assert not pallas_conv3d_supported(
        (1, 32, 216, 216, 256), 3, (1, 1, 1), False)
    assert pallas_conv3d_supported((1, 32, 216, 216, 256), 1, (1, 1, 1), False)


def test_wide_lane_pad_four_way_split(monkeypatch):
    """64-channel k=3 at wide W (216^3 merge convs) -> four 16-channel
    lane-padded pallas convs, exact vs XLA."""
    import coma_unet_tpu.models.blocks as B
    import coma_unet_tpu.ops.pallas.conv3d as M

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    orig_fwd = M._pallas_conv3d_fwd
    calls = []
    monkeypatch.setattr(
        M, "_pallas_conv3d_fwd",
        lambda x, w, k, interpret=False: (
            calls.append(x.shape), orig_fwd(x, w, k, interpret=True)
        )[1],
    )
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(1, 64, 6, 8, 136)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(8, 64, 3, 3, 3)) * 0.1, jnp.float32)
    got = B.conv3d(x, w, (1, 1, 1), B.same_padding((3, 3, 3)),
                   use_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_xla_conv(x, w, 3)),
                               rtol=1e-4, atol=1e-4)
    # four 16-channel lane-padded kernel invocations, not an XLA fallback
    assert calls == [(1, 16, 6, 8, 256)] * 4


def test_cond_conv_wide_lane_pad(monkeypatch):
    """Per-sample (CondConv) k=3 convs at wide W lane-pad + channel-chunk
    through the batched kernel, exact vs per-sample XLA."""
    import coma_unet_tpu.models.blocks as B
    import coma_unet_tpu.ops.pallas.conv3d as M

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    orig_fwd = M._pallas_conv3d_fwd
    calls = []
    monkeypatch.setattr(
        M, "_pallas_conv3d_fwd",
        lambda x, w, k, interpret=False: (
            calls.append(x.shape), orig_fwd(x, w, k, interpret=True)
        )[1],
    )
    rng = np.random.default_rng(9)
    b = 2
    x = jnp.asarray(rng.normal(size=(b, 32, 6, 8, 136)), jnp.float32)
    kern = jnp.asarray(rng.normal(size=(b, 8, 32, 3, 3, 3)) * 0.1,
                       jnp.float32)
    got = B.cond_conv3d(x, kern, (1, 1, 1), None, True, False, False,
                        padding=B.same_padding((3, 3, 3)))
    assert got is not None
    ref = jnp.concatenate([
        _xla_conv(x[i:i + 1], kern[i], 3) for i in range(b)
    ])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    # two 16-channel chunks through the batched kernel (per-sample weights)
    assert calls == [(b, 16, 6, 8, 256)] * 2


@pytest.mark.parametrize("batched", [False, True])
def test_k1_gradients_match_xla(batched):
    """k=1 VJP through the D-tiled pointwise kernels (r5: launch-overhead
    amortization, conv3d.py _k1_dtile) — dx and dw vs XLA."""
    import coma_unet_tpu.ops.pallas.conv3d as M

    rng = np.random.default_rng(5)
    b = 2
    x = jnp.asarray(rng.normal(size=(b, 4, 8, 8, 128)), jnp.float32)
    shape_w = (b, 3, 4, 1, 1, 1) if batched else (3, 4, 1, 1, 1)
    w = jnp.asarray(rng.normal(size=shape_w) * 0.1, jnp.float32)

    orig_fwd, orig_dw = M._pallas_conv3d_fwd, M._pallas_conv3d_dw
    M._pallas_conv3d_fwd = lambda x, w, k, interpret=False: orig_fwd(
        x, w, k, interpret=True)
    M._pallas_conv3d_dw = lambda x, g, k, batched=False, interpret=False: \
        orig_dw(x, g, k, batched=batched, interpret=True)
    try:
        op = M.pallas_conv3d_b if batched else M.pallas_conv3d
        g1 = jax.grad(lambda a, b_: jnp.sum(op(a, b_, 1) ** 2),
                      argnums=(0, 1))(x, w)
    finally:
        M._pallas_conv3d_fwd, M._pallas_conv3d_dw = orig_fwd, orig_dw
    if batched:
        def ref(a, w_):
            y = jnp.concatenate(
                [_xla_conv(a[i:i + 1], w_[i], 1) for i in range(b)])
            return jnp.sum(y ** 2)
    else:
        def ref(a, w_):
            return jnp.sum(_xla_conv(a, w_, 1) ** 2)
    g2 = jax.grad(ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                               rtol=1e-3, atol=1e-3)
