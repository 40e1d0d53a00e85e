"""Model shape / gradient / conditioning tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coma_unet_tpu.models import ContraAttnUNet
from coma_unet_tpu.models.blocks import CondConvolution, Convolution
from tests.conftest import make_batch


def test_forward_shapes(tiny_model_config, rng, tiny_batch):
    model = ContraAttnUNet(tiny_model_config)
    b = tiny_batch
    params = model.init(rng, b["mri"], b["covars"], b["roi_loc"], b["roi_std"],
                        b["roi_compact"], train=False)
    outs = model.apply(params, b["mri"], b["covars"], b["roi_loc"], b["roi_std"],
                       b["roi_compact"], train=False)
    assert outs.out.shape == (2, 1, 16, 16, 16)
    assert (np.asarray(outs.out) >= 0).all()  # final ReLU
    assert len(outs.projections) == 3
    # per-level projection dims: s^3 at full res, (s/2)^3, (s/4)^3
    assert outs.projections[0].shape == (2, 16 ** 3)
    assert outs.projections[1].shape == (2, 8 ** 3)
    assert outs.projections[2].shape == (2, 4 ** 3)
    assert outs.final_projection.shape == (2, 32)
    # encoder features: top level first, halving resolution
    assert [e.shape for e in outs.encoder] == [
        (2, 4, 16, 16, 16), (2, 8, 8, 8, 8), (2, 16, 4, 4, 4)
    ]
    # attention maps for the two gated levels
    assert [a.shape for a in outs.attention] == [
        (2, 1, 16, 16, 16), (2, 1, 8, 8, 8)
    ]


def test_covariates_change_output(tiny_model_config, rng, tiny_batch):
    """The CondConv routing + FiLM must actually condition the output."""
    model = ContraAttnUNet(tiny_model_config)
    b = tiny_batch
    params = model.init(rng, b["mri"], b["covars"], b["roi_loc"], b["roi_std"],
                        b["roi_compact"], train=False)
    out1 = model.apply(params, b["mri"], b["covars"], b["roi_loc"], b["roi_std"],
                       b["roi_compact"], train=False).out
    cov2 = b["covars"] + 1.5
    out2 = model.apply(params, b["mri"], cov2, b["roi_loc"], b["roi_std"],
                       b["roi_compact"], train=False).out
    assert float(jnp.abs(out1 - out2).max()) > 1e-6


def test_abeta_switches_prompt(tiny_model_config, rng, tiny_batch):
    """covariate[..., 0] == 1 selects the positive dynamic prompt
    (`attn_unet_data_parallel.py:638-639`)."""
    model = ContraAttnUNet(tiny_model_config)
    b = tiny_batch
    params = model.init(rng, b["mri"], b["covars"], b["roi_loc"], b["roi_std"],
                        b["roi_compact"], train=False)
    cov_pos = b["covars"].at[:, 0].set(1.0)
    cov_neg = b["covars"].at[:, 0].set(0.0)
    out_pos = model.apply(params, b["mri"], cov_pos, b["roi_loc"], b["roi_std"],
                          b["roi_compact"], train=False).out
    out_neg = model.apply(params, b["mri"], cov_neg, b["roi_loc"], b["roi_std"],
                          b["roi_compact"], train=False).out
    assert float(jnp.abs(out_pos - out_neg).max()) > 1e-6


def test_grads_flow(tiny_model_config, rng, tiny_batch):
    model = ContraAttnUNet(tiny_model_config)
    b = tiny_batch
    params = model.init(rng, b["mri"], b["covars"], b["roi_loc"], b["roi_std"],
                        b["roi_compact"], train=True)

    def loss(p):
        outs = model.apply(p, b["mri"], b["covars"], b["roi_loc"], b["roi_std"],
                           b["roi_compact"], train=True)
        return jnp.mean(jnp.square(outs.out - b["tau"])) + 1e-3 * jnp.mean(
            outs.projections[-1]
        )

    grads = jax.grad(loss)(params)
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    nonzero = sum(float(jnp.abs(g).sum()) > 0 for g in leaves)
    assert nonzero > len(leaves) * 0.5


def test_condconv_expert_mixture_matches_per_sample_loop(rng):
    """Grouped-conv CondConv == looping samples with their mixed kernels."""
    mod = CondConvolution(
        out_channels=3, kernel_size=3, strides=1, conv_only=True,
        num_experts=4, num_covars=5, dtype=jnp.float32,
    )
    x = jax.random.normal(rng, (3, 2, 6, 6, 6))
    cov = jax.random.normal(jax.random.PRNGKey(1), (3, 5))
    params = mod.init(rng, x, cov)
    batched = mod.apply(params, x, cov)
    for i in range(3):
        single = mod.apply(params, x[i : i + 1], cov[i : i + 1])
        np.testing.assert_allclose(
            np.asarray(batched[i]), np.asarray(single[0]), rtol=1e-4, atol=1e-5
        )


def test_transposed_conv_doubles_size(rng):
    mod = Convolution(out_channels=2, kernel_size=3, strides=2,
                      is_transposed=True, dtype=jnp.float32)
    x = jax.random.normal(rng, (1, 3, 5, 5, 5))
    params = mod.init(rng, x)
    y = mod.apply(params, x)
    assert y.shape == (1, 2, 10, 10, 10)


def test_transposed_condconv_doubles_size(rng):
    mod = CondConvolution(out_channels=2, kernel_size=3, strides=2,
                          is_transposed=True, num_covars=6, dtype=jnp.float32)
    x = jax.random.normal(rng, (2, 3, 5, 5, 5))
    cov = jax.random.normal(rng, (2, 6))
    params = mod.init(rng, x, cov)
    y = mod.apply(params, x, cov)
    assert y.shape == (2, 2, 10, 10, 10)


def test_flagship_odd_template_geometry():
    """Template-space 216^3 produces odd level sizes (27 at level 3); the
    decoder crops the upsample to the skip (the torch reference crashes
    here — its direct template-space path was never validated). Scaled-down
    odd geometry: 28 -> 14 -> 7 -> 4 -> 2."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from coma_unet_tpu.config import ModelConfig
    from coma_unet_tpu.models.attention_unet import AttentionUNet

    s = 28
    cfg = ModelConfig(
        channels=(2, 3, 4, 5, 6), strides=(2, 2, 2, 2),
        latent_spaces=(8,) * 5, prompt_shape=(s, s, s), num_experts=2,
        compute_dtype="float32", remat=False,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 1, s, s, s)), jnp.float32)
    cov = jnp.asarray(rng.uniform(0, 1, (1, 1, 6)), jnp.float32)
    m = AttentionUNet(cfg)
    params = m.init(jax.random.PRNGKey(0), x, cov, train=False)
    out = m.apply(params, x, cov, train=False)
    assert out.out.shape == (1, 1, s, s, s)
    assert np.isfinite(np.asarray(out.out)).all()
    sizes = [f.shape[-1] for f in out.encoder]
    assert sizes == [28, 14, 7, 4, 2]


def test_dynamic_prompt_initializer_pinned():
    """__graft_entry__.init_on_cpu's small-spatial fast path re-draws the
    `*_dynamic_prompt` leaves with N(0, 1) at the true prompt shape; pin
    contra.py's initializer (normal(1.0)) here so a future change to the
    modulator's prompt init breaks THIS test instead of silently training
    bench/entry-point models from params that differ from model.init."""
    import jax

    from coma_unet_tpu.config import ModelConfig
    from coma_unet_tpu.models import ContraAttnUNet

    cfg = ModelConfig(
        channels=(2, 4, 8), strides=(2, 2, 2), latent_spaces=(8, 8, 8),
        prompt_shape=(32, 32, 32), num_experts=2, compute_dtype="float32",
    )
    model = ContraAttnUNet(cfg)
    import numpy as np

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 1, 32, 32, 32)), jnp.float32)
    cov = jnp.asarray(rng.normal(size=(1, 3)), jnp.float32)
    loc = jnp.asarray(rng.normal(size=(1, 36)), jnp.float32)
    compact = jnp.zeros((1, 32, 32, 32), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, cov, loc, loc, compact,
                        train=False)["params"]
    for name in ("pos_dynamic_prompt", "neg_dynamic_prompt",
                 "general_dynamic_prompt"):
        leaf = np.asarray(params[name], np.float32).ravel()
        assert leaf.shape[0] == 32 ** 3
        assert abs(float(leaf.mean())) < 0.05, name
        assert abs(float(leaf.std()) - 1.0) < 0.05, name
