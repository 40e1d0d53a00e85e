"""Per-segment kernel-family policy (ops/pallas/policy.py).

The split train step scopes kernel-family gates per compiled segment so
the 3-program chain stays under the relay's ~91 MB executable-cache cap
(artifacts/r3/alternation_probe.log). These tests pin the scoping
semantics the dispatch gates rely on: policies compose with (and
override) the process-wide env vars, apply at trace time through jit,
and the split step threads them through without changing the math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coma_unet_tpu.models.blocks import _norm_act_ok
from coma_unet_tpu.ops.pallas.conv3d import pallas_disabled_families
from coma_unet_tpu.ops.pallas.policy import (
    KernelPolicy,
    current_policy,
    kernel_policy,
    parse_policy,
    parse_segment_policies,
)

_OK_SHAPE = (2, 8, 4, 8, 128)  # passes norm_act_supported


def test_policy_scoping_and_env_union(monkeypatch):
    monkeypatch.setenv("COMA_PALLAS_DISABLE", "t2")
    assert pallas_disabled_families() == {"t2"}
    with kernel_policy(disable={"p1", "s2"}):
        assert pallas_disabled_families() == {"t2", "p1", "s2"}
        assert current_policy().disable == {"p1", "s2"}
    assert pallas_disabled_families() == {"t2"}
    assert current_policy() is None


def test_policy_nesting_restores_outer():
    with kernel_policy(disable={"a"}):
        with kernel_policy(disable={"b"}):
            # inner policy REPLACES (not unions) — each segment states its
            # full override set
            assert pallas_disabled_families() >= {"b"}
            assert "a" not in current_policy().disable
        assert current_policy().disable == {"a"}


def test_norm_fused_policy_overrides_env(monkeypatch):
    # env force (CPU interpret mode) + policy off -> gate closed
    monkeypatch.setenv("COMA_NORM_FUSED", "force")
    assert _norm_act_ok(_OK_SHAPE, "instance", "relu", 0.0, True)
    with kernel_policy(norm_fused=False):
        assert not _norm_act_ok(_OK_SHAPE, "instance", "relu", 0.0, True)
    # env off + policy on -> gate opens ("force" semantics preserved so
    # the CPU interpret path still qualifies)
    monkeypatch.setenv("COMA_NORM_FUSED", "0")
    assert not _norm_act_ok(_OK_SHAPE, "instance", "relu", 0.0, True)
    with kernel_policy(norm_fused=True):
        # off-TPU the policy alone cannot open the gate (no "force") —
        # it must not silently enable interpret kernels in production
        assert not _norm_act_ok(_OK_SHAPE, "instance", "relu", 0.0, True)
    monkeypatch.setenv("COMA_NORM_FUSED", "force")
    with kernel_policy(norm_fused=True):
        assert _norm_act_ok(_OK_SHAPE, "instance", "relu", 0.0, True)


def test_policy_applies_at_jit_trace_time(monkeypatch):
    monkeypatch.delenv("COMA_PALLAS_DISABLE", raising=False)
    from coma_unet_tpu.train.step import _with_policy

    seen = []

    @jax.jit
    def f(x):
        seen.append(frozenset(pallas_disabled_families()))  # trace-time read
        return x + 1.0

    call = _with_policy(f, KernelPolicy(disable={"p1"}))
    out = call(jnp.zeros(()))
    np.testing.assert_allclose(out, 1.0)
    assert seen == [frozenset({"p1"})]


def test_parse_policy():
    pol = parse_policy("p1,norm=0")
    assert pol.disable == {"p1"}
    assert pol.norm_fused is False
    pol = parse_policy("norm=1")
    assert pol.disable == frozenset()
    assert pol.norm_fused is True
    pol = parse_policy("")
    assert pol.disable == frozenset() and pol.norm_fused is None


def test_parse_segment_policies():
    pols = parse_segment_policies(
        "dec_grad:norm=0;enc_bwd_update:norm=0,p1; enc_fwd:t2")
    assert set(pols) == {"dec_grad", "enc_bwd_update", "enc_fwd"}
    assert pols["dec_grad"].norm_fused is False
    assert pols["enc_bwd_update"].disable == {"p1"}
    assert pols["enc_bwd_update"].norm_fused is False
    assert pols["enc_fwd"].disable == {"t2"}
    assert pols["enc_fwd"].norm_fused is None


def test_env_spec_reaches_split_defaults(monkeypatch):
    from coma_unet_tpu.train.step import default_segment_policies

    monkeypatch.setenv("COMA_SPLIT_POLICY", "dec_grad:norm=0,p1")
    pols = default_segment_policies()
    assert set(pols) == {"dec_grad"}
    assert pols["dec_grad"].disable == {"p1"}
    monkeypatch.setenv("COMA_SPLIT_POLICY", "")
    assert default_segment_policies() == {}
    monkeypatch.delenv("COMA_SPLIT_POLICY")
    pols = default_segment_policies()
    # measured default: the proven-good pre-p1/pre-norm-fusion chain in
    # every split segment (split_normoff_probe.log: 89.2 MB still thrashes)
    for seg in ("enc_fwd", "dec_grad", "enc_bwd_update", "enc_bwd"):
        assert pols[seg].norm_fused is False
        assert "p1" in pols[seg].disable


@pytest.mark.parametrize("spec", ["dec_grad:norm=0,p1,s2;enc_fwd:norm=1"])
def test_split_step_runs_under_policies(spec, rng, monkeypatch):
    """Segment policies thread through the split step without changing the
    math (on CPU every Pallas gate resolves False either way, so this pins
    wiring: chaining, donation, and the policy context per call)."""
    from coma_unet_tpu.config import LossConfig, ModelConfig
    from coma_unet_tpu.models import ContraAttnUNet
    from coma_unet_tpu.ops.pallas.policy import parse_segment_policies
    from coma_unet_tpu.train import create_train_state, make_optimizer
    from coma_unet_tpu.train.step import (
        make_split_train_step,
        make_train_step,
    )
    from tests.conftest import make_batch

    monkeypatch.setenv("COMA_TRAIN_PACKED", "1")
    cfg = ModelConfig(
        channels=(4, 8), strides=(2, 2), latent_spaces=(32, 32),
        prompt_shape=(16, 16, 16), num_experts=4, compute_dtype="float32",
    )
    model = ContraAttnUNet(cfg)
    lcfg = LossConfig()
    batch = make_batch(rng)
    roi_w = jnp.full((36,), 225.0)
    key = jax.random.PRNGKey(3)

    def _state():
        return create_train_state(
            model, make_optimizer(1e-3), jax.random.PRNGKey(0),
            (batch["mri"], batch["covars"], batch["roi_loc"],
             batch["roi_std"], batch["roi_compact"]),
            {"train": True},
        )

    mono = make_train_step(model, lcfg, donate=False)
    split = make_split_train_step(
        model, lcfg, donate=False,
        segment_policies=parse_segment_policies(spec),
    )
    _, aux_m = mono(_state(), batch, roi_w, key)
    _, aux_s = split(_state(), batch, roi_w, key)
    np.testing.assert_allclose(aux_s["loss"], aux_m["loss"],
                               rtol=1e-5, atol=1e-6)
