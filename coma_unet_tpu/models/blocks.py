"""Building blocks for the covariate-modulated 3D attention U-Net.

Behavioral parity targets (reference file:line cited per class):
  * `Convolution`   — MONAI `Convolution` (conv -> norm -> dropout -> act,
                      "NDA" ordering), used throughout
                      `attn_unet_data_parallel.py` via MONAI.
  * `ConvBlock`     — MONAI `attentionunet.ConvBlock` (two Convolutions).
  * `CondConvolution`/`CondConvBlock` — the missing `CondConv` module
                      reconstructed from its call sites
                      (`attn_unet_data_parallel.py:126,285-306`; SURVEY §2.9):
                      per-example expert-mixture convolution (CondConv, Yang
                      et al. 2019) routed from the covariate vector, plus an
                      optional FiLM scale-shift.
  * `AttentionGate` — `ObservableAttentionBlock`
                      (`attn_unet_data_parallel.py:134-150`):
                      psi = sigmoid(psi_conv(relu(W_g g + W_x x))), out = x*psi.
  * `UpBlock`       — `attn_unet_data_parallel.py:120-131` (transposed conv).
  * `StackedFusionConvLayers` — `attn_unet_data_parallel.py:480-501`.
  * `ProjectionHead`— `attn_unet_data_parallel.py:436-454`.

TPU-first design: activations are NCDHW — channels *second*, W innermost.
TPU memory tiles the last two dims to (sublane, 128-lane); this network's
channel counts are tiny (1..32) at full 128^3 resolution, so a channels-last
layout would pad the lane dim up to 128x (measured: 8.9 GB of activations
ballooning to 32.8 GB of padded HBO). With W=128 on lanes and H on sublanes,
full-resolution tensors tile exactly. The expert-mixture conv unrolls into B
dense convs for small batches (XLA's grouped-conv lowering measured ~40%
slower) and falls back to one grouped `conv_general_dilated` otherwise;
stride-1 small-channel convs route through the Pallas direct-conv kernel
(`ops/pallas/conv3d.py`); bfloat16 compute, float32 params and norm stats.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any

# ---------------------------------------------------------------------------
# small utilities
# ---------------------------------------------------------------------------


def _triple(v: Union[int, Sequence[int]]) -> Tuple[int, int, int]:
    if isinstance(v, int):
        return (v, v, v)
    t = tuple(v)
    assert len(t) == 3
    return t  # type: ignore[return-value]


def same_padding(kernel: Tuple[int, int, int]) -> Tuple[Tuple[int, int], ...]:
    return tuple((k // 2, k - 1 - k // 2) for k in kernel)


def transposed_padding(
    kernel: Tuple[int, int, int], strides: Tuple[int, int, int]
) -> Tuple[Tuple[int, int], ...]:
    """lhs-dilated conv padding for an exact `out = in * s` transposed conv:
    with p = (k-1)//2 this equals torch ConvTranspose3d(k, s, padding=p,
    output_padding=s+2p-k) — e.g. (k=3,s=2,p=1,op=1) the MONAI 'SAME'
    deconv, or (k=2,s=2,p=0,op=0) the UNETR deconv."""
    out = []
    for k, s in zip(kernel, strides):
        p = (k - 1) // 2
        out.append((k - 1 - p, s - 1 + p))
    return tuple(out)


class PReLU(nn.Module):
    """torch-default PReLU: one shared learnable slope, init 0.25."""

    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        alpha = self.param(
            "alpha", nn.initializers.constant(0.25), (1,), self.param_dtype
        )
        return jnp.where(x >= 0, x, alpha.astype(x.dtype) * x)


def get_act(name: Optional[str]) -> Optional[Callable]:
    if name is None or name == "none":
        return None
    name = name.lower()
    if name == "relu":
        return jax.nn.relu
    if name == "leakyrelu":
        return lambda x: jax.nn.leaky_relu(x, negative_slope=1e-2)
    if name == "sigmoid":
        return jax.nn.sigmoid
    if name == "tanh":
        return jnp.tanh
    if name == "gelu":
        return jax.nn.gelu
    raise ValueError(f"unknown activation {name}")


class InstanceNorm(nn.Module):
    """Per-sample, per-channel normalization over spatial dims.

    Matches torch `InstanceNorm3d` defaults (affine=False, eps=1e-5) used by
    MONAI's Norm.INSTANCE. Stats in float32 regardless of compute dtype.
    """

    epsilon: float = 1e-5
    use_scale: bool = False
    use_bias: bool = False
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig_dtype = x.dtype
        xf = x.astype(jnp.float32)
        axes = tuple(range(2, x.ndim))  # spatial dims of NCDHW
        mean = jnp.mean(xf, axis=axes, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=axes, keepdims=True)
        # normalize in the compute dtype: the f32 stats are per-(B,C) scalars,
        # so the full-resolution tensor never materializes in f32.
        y = (x - mean.astype(orig_dtype)) * jax.lax.rsqrt(
            var + self.epsilon
        ).astype(orig_dtype)
        c = x.shape[1]
        shape = (c,) + (1,) * (x.ndim - 2)
        if self.use_scale:
            y = y * self.param(
                "scale", nn.initializers.ones, (c,), self.param_dtype
            ).reshape(shape).astype(orig_dtype)
        if self.use_bias:
            y = y + self.param(
                "bias", nn.initializers.zeros, (c,), self.param_dtype
            ).reshape(shape).astype(orig_dtype)
        return y


class Norm(nn.Module):
    """Norm factory: 'instance' | 'batch' | 'none'.

    'batch' uses flax BatchNorm with running stats (mutable 'batch_stats'
    collection); pass `axis_name` for cross-replica (SyncBN-style) stats on a
    device mesh — the TPU-native upgrade of the reference's imported-but-dead
    `SyncBatchNorm` (`attn_unet_data_parallel.py:32`).
    """

    kind: str = "instance"
    axis_name: Optional[str] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        if self.kind in (None, "none"):
            return x
        if self.kind == "instance":
            return InstanceNorm(param_dtype=self.param_dtype, name="inorm")(x)
        if self.kind == "batch":
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                axis=1,  # NCDHW feature axis
                dtype=jnp.float32,
                param_dtype=self.param_dtype,
                axis_name=self.axis_name,
                name="bnorm",
            )(x)
        raise ValueError(f"unknown norm {self.kind}")


# ---------------------------------------------------------------------------
# convolution primitives
# ---------------------------------------------------------------------------

_DIMNUMS = ("NCDHW", "OIDHW", "NCDHW")


def conv_kernel_init(fan_in: int):
    """torch Conv3d default (kaiming uniform, a=sqrt(5)):
    U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / float(np.sqrt(fan_in))

    def init(key, shape, dtype):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


def _norm_act_ok(shape, norm: Optional[str], act: Optional[str],
                 dropout: float, use_pallas: bool) -> bool:
    """Gate for the fused instance-norm(+FiLM)+act Pallas path
    (ops/pallas/norm_act.py). COMA_NORM_FUSED=0 disables; "norm" in
    COMA_PALLAS_DISABLE disables (trace-time Mosaic-budget lever);
    COMA_NORM_FUSED=force enables off-TPU (CPU wiring tests run the same
    kernels in interpret mode). A scoped `kernel_policy(norm_fused=...)`
    (ops/pallas/policy.py) overrides the env — the split train step uses
    it to keep the fused op only in segments where its Mosaic bytes fit
    the relay executable-cache budget."""
    from coma_unet_tpu.ops.pallas.norm_act import norm_act_supported
    from coma_unet_tpu.ops.pallas.policy import policy_norm_fused

    env = os.environ.get("COMA_NORM_FUSED", "1")
    pol = policy_norm_fused()
    if pol is not None:
        # keep "force" semantics (off-TPU interpret tests) when the policy
        # re-enables under a force env
        env = ("force" if env == "force" else "1") if pol else "0"
    if env == "0" or not use_pallas or norm != "instance":
        return False
    if act not in (None, "none", "relu", "leakyrelu", "prelu"):
        return False
    if dropout > 0.0 or "norm" in _pallas_disabled():
        return False
    if not (_on_tpu() or env == "force"):
        return False
    return norm_act_supported(shape)


def _prelu_alpha(param_dtype) -> jnp.ndarray:
    """The torch-default shared PReLU slope as a [1] f32 array, created
    through the SAME `PReLU(name="prelu")` submodule as the unfused path
    (identical param tree either way): PReLU(-1) == -alpha, so the probe
    is exact and its gradient is d(alpha)/dalpha == 1. Must be called from
    inside the owning module's compact `__call__`."""
    probe = jnp.full((1,), -1.0, jnp.float32)
    return -PReLU(param_dtype=param_dtype, name="prelu")(probe)


# The Pallas kernel families hard-code their padding (SAME for stride-1/
# stride-2, the (1,2) transposed-SAME for t2); dispatch must verify the
# caller actually asked for that padding or fall back to XLA.
_SAME3 = ((1, 1), (1, 1), (1, 1))
_T2PAD3 = ((1, 2), (1, 2), (1, 2))


def _pad_eq(padding, expected) -> bool:
    try:
        return tuple(tuple(p) for p in padding) == expected
    except TypeError:  # string paddings ("SAME"/"VALID") -> XLA fallback
        return False


def _pallas_disabled() -> set:
    """Trace-time kill switches (COMA_PALLAS_DISABLE="t2,s2,packed,s1,k1,k3"):
    each named family contributes NO Mosaic program anywhere in the traced
    module — the remote compile helper OOMs past a cumulative Mosaic budget
    (~35 large kernels/module, measured r2-r3), so train steps must budget
    which families they spend it on. "s1" = the whole stride-1 conv3d
    family; "k1" / "k3" = only its k=1 (pointwise, where XLA's matmul
    lowering is closest to parity) / k=3 instantiations — "k3" exists for
    216^3 training, where the wide k=3 fwd+dx+dw Mosaic programs alone
    exceed the helper budget but the cheap k=1 programs are the main HBM
    saver. Single shared parser (conv3d.py) so dispatch and the VJPs'
    cross-kernel substitutions always agree."""
    from coma_unet_tpu.ops.pallas.conv3d import pallas_disabled_families

    return pallas_disabled_families()


def conv3d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    strides: Tuple[int, int, int],
    padding,
    groups: int = 1,
    lhs_dilation: Optional[Tuple[int, int, int]] = None,
    use_pallas: bool = False,
    packed_in: bool = False,
    packed_out: bool = False,
) -> jnp.ndarray:
    if packed_in or packed_out:
        return _conv3d_packed(
            x, kernel, strides, padding, groups, lhs_dilation,
            use_pallas, packed_in, packed_out,
        )
    if use_pallas and lhs_dilation is None:
        from coma_unet_tpu.ops.pallas.conv3d import (
            pallas_conv3d,
            pallas_conv3d_supported,
        )
        from coma_unet_tpu.ops.pallas.conv3d_p1 import (
            p1_supported,
            pallas_conv3d_p1,
        )

        k = kernel.shape[-1]
        disabled = _pallas_disabled()
        if "s1" in disabled or f"k{k}" in disabled:
            return jax.lax.conv_general_dilated(
                x, kernel, window_strides=strides, padding=padding,
                lhs_dilation=lhs_dilation, dimension_numbers=_DIMNUMS,
                feature_group_count=groups,
            )
        cubic = (kernel.shape[-3:] == (k, k, k)
                 and _pad_eq(padding, same_padding((k, k, k))))
        cin = x.shape[1]
        wd = x.shape[-1]
        # W > 128 but not lane-aligned (e.g. template-space 216^3): zero-pad
        # W up to the next multiple of 128 — exact for SAME convs (the pad
        # columns only feed outputs inside the cropped-off pad region; for
        # k=3 the first pad column IS the SAME-pad zero the true right edge
        # needs), and ~1.2x padding beats XLA's up-to-15x channel-minor
        # relayout (measured: 4.8 GB HLO temps per bf16[1,{16,32},216^3]
        # conv, probe_216 OOM dump). k=3 wide slabs are capped at c<=16 by
        # `pallas_conv3d_supported` (the c=32 Mosaic program crashed the
        # remote compile helper, r3 g216); the channel-split fallback below
        # covers c=32 as two 16-channel convs.
        # r5 extension: the SAME trick for 96 < W < 128 (the 216^3
        # template geometry's LEVEL-1, 108^3) — without it every level-1
        # conv at 216 geometry fell to the XLA relayout class, which is
        # where the 6.5x backward/forward ratio of the r3 216^3 train
        # step lived (VERDICT r4 item 3) — but measured r5: no fwd win
        # (392 vs 382 ms) and the 216^3 dec_grad bwd module crashes the
        # compile helper (exit 1, artifacts/r5/bench_populate.log), so
        # it defaults OFF. H is zero-padded to a multiple of 8; exact
        # by the SAME-pad argument (test_midsize_lanepad_exact).
        hh = x.shape[-2]
        midpad = (96 < wd < 128
                  and os.environ.get("COMA_LANEPAD_MID", "0") != "0")
        pad = (-wd) % 128 if (wd > 128 or midpad) else 0
        hpad = (-hh) % 8 if (pad and hh % 8) else 0
        pshape = x.shape[:-2] + (hh + hpad, wd + pad)

        def padded(a):
            return jnp.pad(
                a, [(0, 0)] * (a.ndim - 2) + [(0, hpad), (0, pad)]
            ) if pad else a

        def cropped(y):
            return y[..., :hh, :wd] if pad else y

        # NB: an opt-in COMA_WIDE_S2 branch (wide-slab Pallas s2, chunked to
        # <=16 channels) lived here through r3 but was never probed on
        # hardware. Deleted (VERDICT r3 item 6, probe-or-delete): probing
        # means compiling a fresh wide-slab Mosaic program — the class whose
        # c=32 instance ran the remote compile helper 35 min and then
        # crashed it AND the session's TPU relay (r3 g216 probe) — while
        # the default phase-dot lowering below is the measured winner at
        # these shapes (artifacts/r3/phase_dot_probe.log). Unexercised
        # dispatch branches in the conv router are a silent-wrong-results
        # risk surface (ADVICE r2 item 2), so the branch is gone rather
        # than gated; `git log -S COMA_WIDE_S2` recovers it if wide-slab s2
        # ever earns a probe budget.
        if (k == 3 and cubic and strides == (2, 2, 2) and groups == 1
                and wd > 128 and all(s % 2 == 0 for s in x.shape[2:])
                and _on_tpu()
                and os.environ.get("COMA_PHASE_DOT", "1") != "0"):
            # wide stride-2 (template-space 216^3) DEFAULT: the pure-XLA
            # phase-dot lowering (parity-phase slices + channel-contraction
            # einsums, ops/phase_dot.py). No conv op ever reaches XLA — at
            # these shapes XLA's conv lowering relayouts bf16 small-channel
            # operands channel-minor (4.8 GB HLO temps per bf16[1,32,216^3],
            # probe_216 OOM dump) — and autodiff keeps dx/dw conv-free too,
            # which is what let the 216^3 encoder backward fit HBM
            # (scripts/trace_216_bwd.py). COMA_PHASE_DOT=0 restores the XLA
            # fallback.
            from coma_unet_tpu.ops.phase_dot import phase_dot_s2

            return phase_dot_s2(x, kernel)

        if cubic and groups == 1:
            # conv is linear in the input channels: when the full-width conv
            # exceeds the gate, split into 2 or 4 channel chunks of pallas
            # convs and add (exact). parts=2 covers the 64->32 merge conv at
            # full resolution; parts=4 the 64-channel merges at lane-padded
            # 216^3, where wide k=3 slabs are capped at 16 channels (the
            # c=32 Mosaic program crashes the remote compile helper).
            # p1 runs on exactly one 128-lane tile: native W=128 or the
            # mid-size lane-padded case (108 -> 128); wider slabs are
            # rejected by p1_supported on the chunk shape either way.
            use_p1 = (k == 3 and wd + pad == 128 and "p1" not in disabled
                      and _on_tpu()
                      and os.environ.get("COMA_S1_PHASE", "1") != "0")
            cout = kernel.shape[0]
            for parts in (1, 2, 4):
                if cin % parts:
                    continue
                chunk_shape = (x.shape[0], cin // parts) + pshape[2:]
                p1_ok = use_p1 and p1_supported(chunk_shape, cout)
                if not p1_ok and not pallas_conv3d_supported(
                    chunk_shape, k, strides, is_transposed=False,
                ):
                    continue
                ch = cin // parts
                xp_ = padded(x)
                out = None
                for i in range(parts):
                    if p1_ok:
                        # phase-decomposed s1 (conv3d_p1.py): 4x MXU row
                        # fill at Cout<=32 — hardware A/B in
                        # artifacts/r3/kernel_probe_p1.log
                        y = pallas_conv3d_p1(xp_[:, i * ch:(i + 1) * ch],
                                             kernel[:, i * ch:(i + 1) * ch])
                    else:
                        y = pallas_conv3d(xp_[:, i * ch:(i + 1) * ch],
                                          kernel[:, i * ch:(i + 1) * ch], k)
                    out = y if out is None else out + y
                return cropped(out)
    if (use_pallas and lhs_dilation == (2, 2, 2) and strides == (1, 1, 1)
            and groups == 1 and kernel.shape[-3:] == (3, 3, 3)
            and _pad_eq(padding, _T2PAD3) and x.shape[-1] > 64
            and _on_tpu()
            and os.environ.get("COMA_PHASE_DOT", "1") != "0"):
        # wide transposed stride-2 (decoder upsample past the 128-lane
        # packed path, e.g. 108^3 -> 216^3): same phase-dot rationale as the
        # s2 branch above — XLA's transposed-conv lowering at these shapes
        # is the 4.8 GB channel-minor relayout class (probe_216 OOM dump,
        # up0 offender), and its VJP would re-enter it for dx/dw.
        from coma_unet_tpu.ops.phase_dot import phase_dot_t2

        return phase_dot_t2(x, kernel)
    # NB: no preferred_element_type override — for bf16 operands the TPU MXU
    # accumulates in f32 natively, and forcing f32 outputs breaks the conv
    # transpose rule under AD (f32 cotangent vs bf16 kernel).
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=strides,
        padding=padding,
        lhs_dilation=lhs_dilation,
        dimension_numbers=_DIMNUMS,
        feature_group_count=groups,
    )


def _conv3d_packed(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    strides: Tuple[int, int, int],
    padding,
    groups: int,
    lhs_dilation: Optional[Tuple[int, int, int]],
    use_pallas: bool,
    packed_in: bool,
    packed_out: bool,
) -> jnp.ndarray:
    """Convs whose input and/or output live in the PACKED 64^3-level layout
    ([B, C, D/2, H, 2W], D-pairs on lanes — ops/pallas/conv3d_strided.py).

    Pallas fast paths when shapes/backend allow; otherwise an exact XLA
    fallback that converts layouts at the boundary, so the model is
    numerically identical on CPU (tests) and TPU."""
    from coma_unet_tpu.ops.pallas.conv3d_packed import pallas_conv3d_packed
    from coma_unet_tpu.ops.pallas.conv3d_strided import (
        pack_w,
        pallas_conv3d_s2,
        pallas_conv3d_t2,
        unpack_w,
    )

    k = kernel.shape[-1]
    cubic3 = kernel.shape[-3:] == (3, 3, 3)
    cin, cout = kernel.shape[1], kernel.shape[0]
    tpu = _on_tpu() and use_pallas and groups == 1
    transposed = lhs_dilation is not None
    disabled = _pallas_disabled()

    if transposed and packed_in and not packed_out:
        # decoder upsample: packed 64^3 -> full-res 128^3
        if (tpu and "t2" not in disabled and cubic3
                and _pad_eq(padding, _T2PAD3)
                and lhs_dilation == (2, 2, 2)
                and strides == (1, 1, 1) and x.shape[-1] == 128
                and x.shape[-2] >= 8 and cin <= 64 and cout <= 32):
            return pallas_conv3d_t2(x, kernel)
        return conv3d(unpack_w(x), kernel, strides, padding, groups,
                      lhs_dilation)
    if not transposed and packed_out and not packed_in:
        # encoder downsample: full-res 128^3 -> packed 64^3
        if (tpu and "s2" not in disabled and cubic3
                and _pad_eq(padding, _SAME3)
                and strides == (2, 2, 2) and x.shape[-1] == 128
                and x.shape[-3] % 4 == 0 and x.shape[-2] % 2 == 0
                and x.shape[-2] >= 16 and cin <= 32 and cout <= 64):
            return pallas_conv3d_s2(x, kernel)
        return pack_w(conv3d(x, kernel, strides, padding, groups))
    if not transposed and packed_in and packed_out and strides == (1, 1, 1):
        if (tpu and "packed" not in disabled and cubic3
                and _pad_eq(padding, _SAME3)
                and x.shape[-1] == 128 and x.shape[-2] >= 8
                and cin <= 128 and cout <= 128):
            return pallas_conv3d_packed(x, kernel)
        if k == 1:
            # pointwise convs are layout-agnostic: run directly on the
            # packed tensor (pallas stride-1 k=1 kernel when it qualifies)
            return conv3d(x, kernel, (1, 1, 1), [(0, 0)] * 3, groups,
                          use_pallas=use_pallas)
        return pack_w(
            conv3d(unpack_w(x), kernel, strides, padding, groups)
        )
    # anything else: exact fallback through layout conversion
    y = conv3d(unpack_w(x) if packed_in else x, kernel, strides, padding,
               groups, lhs_dilation)
    return pack_w(y) if packed_out else y


def cond_conv3d(
    x: jnp.ndarray,
    kern: jnp.ndarray,
    strides: Tuple[int, int, int],
    lhs_dilation: Optional[Tuple[int, int, int]],
    use_pallas: bool,
    packed_in: bool,
    packed_out: bool,
    padding=None,
) -> Optional[jnp.ndarray]:
    """PER-SAMPLE-kernel conv (the CondConv expert mixture,
    `kern` [B, Cout, Cin, k, k, k]) through ONE batched pallas call.

    Returns None when no batched kernel family applies — the caller falls
    back to the per-sample unroll / grouped conv. One instance per conv site
    (instead of B unrolled ones) keeps the Mosaic compile footprint flat in
    batch size and replaces XLA's ~40%-slower grouped lowering for DP
    batches."""
    from coma_unet_tpu.ops.pallas.conv3d import (
        pallas_conv3d_b,
        pallas_conv3d_supported,
    )
    from coma_unet_tpu.ops.pallas.conv3d_packed import pallas_conv3d_packed_b
    from coma_unet_tpu.ops.pallas.conv3d_strided import (
        pallas_conv3d_s2_b,
        pallas_conv3d_t2_b,
    )

    if not (_on_tpu() and use_pallas) or x.shape[0] < 2:
        return None
    cout, cin = kern.shape[1], kern.shape[2]
    cubic3 = kern.shape[-3:] == (3, 3, 3)
    k = kern.shape[-1]
    transposed = lhs_dilation is not None
    disabled = _pallas_disabled()
    if (transposed and packed_in and not packed_out and "t2" not in disabled
            and cubic3 and _pad_eq(padding, _T2PAD3)
            and lhs_dilation == (2, 2, 2) and strides == (1, 1, 1)
            and x.shape[-1] == 128 and x.shape[-2] >= 8
            and cin <= 64 and cout <= 32):
        return pallas_conv3d_t2_b(x, kern)
    if (not transposed and packed_out and not packed_in
            and "s2" not in disabled and cubic3 and _pad_eq(padding, _SAME3)
            and strides == (2, 2, 2)
            and x.shape[-1] == 128 and x.shape[-3] % 4 == 0
            and x.shape[-2] % 2 == 0 and x.shape[-2] >= 16
            and cin <= 32 and cout <= 64):
        return pallas_conv3d_s2_b(x, kern)
    if (not transposed and packed_in and packed_out
            and "packed" not in disabled and cubic3
            and _pad_eq(padding, _SAME3) and strides == (1, 1, 1)
            and x.shape[-1] == 128 and x.shape[-2] >= 8
            and cin <= 128 and cout <= 128):
        return pallas_conv3d_packed_b(x, kern)
    if (not transposed and not packed_in and not packed_out
            and "s1" not in disabled
            and f"k{k}" not in disabled
            and strides == (1, 1, 1) and k in (1, 3)
            and kern.shape[-3:] == (k, k, k)
            and _pad_eq(padding, same_padding((k, k, k)))):
        # same W zero-pad-to-lane-multiple trick as conv3d (exact for SAME,
        # k in {1, 3}; the support gate caps wide k=3 slabs at c<=16 —
        # channel-chunked like conv3d, conv being linear in input channels)
        from coma_unet_tpu.ops.pallas.conv3d_p1 import (
            p1_supported,
            pallas_conv3d_p1_b,
        )

        wd, hh = x.shape[-1], x.shape[-2]
        midpad = (96 < wd < 128
                  and os.environ.get("COMA_LANEPAD_MID", "0") != "0")
        pad = (-wd) % 128 if (wd > 128 or midpad) else 0
        hpad = (-hh) % 8 if (pad and hh % 8) else 0
        pshape = x.shape[:-2] + (hh + hpad, wd + pad)
        use_p1 = (k == 3 and wd + pad == 128 and "p1" not in disabled
                  and os.environ.get("COMA_S1_PHASE", "1") != "0")
        # (cond_conv3d is only reached when _on_tpu() — see the early gate)
        for parts in (1, 2, 4):
            if cin % parts:
                continue
            chunk_shape = (x.shape[0], cin // parts) + pshape[2:]
            p1_ok = use_p1 and p1_supported(chunk_shape, cout)
            if not p1_ok and not pallas_conv3d_supported(
                chunk_shape, k, strides, is_transposed=False,
            ):
                continue
            ch = cin // parts
            xp_ = (jnp.pad(
                x, [(0, 0)] * (x.ndim - 2) + [(0, hpad), (0, pad)]
            ) if pad else x)
            out = None
            for i in range(parts):
                if p1_ok:
                    y = pallas_conv3d_p1_b(xp_[:, i * ch:(i + 1) * ch],
                                           kern[:, :, i * ch:(i + 1) * ch])
                else:
                    y = pallas_conv3d_b(xp_[:, i * ch:(i + 1) * ch],
                                        kern[:, :, i * ch:(i + 1) * ch], k)
                out = y if out is None else out + y
            return out[..., :hh, :wd] if pad else out
    return None


class Convolution(nn.Module):
    """MONAI-equivalent Convolution: conv (or transposed conv) -> norm ->
    dropout -> act. `conv_only=True` skips norm/dropout/act."""

    out_channels: int
    kernel_size: Union[int, Sequence[int]] = 3
    strides: Union[int, Sequence[int]] = 1
    act: Optional[str] = "prelu"
    norm: Optional[str] = "instance"
    dropout: float = 0.0
    conv_only: bool = False
    is_transposed: bool = False
    use_bias: bool = True
    use_pallas: bool = False
    packed_in: bool = False
    packed_out: bool = False
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        kernel_size = _triple(self.kernel_size)
        strides = _triple(self.strides)
        in_ch = x.shape[1]
        fan_in = in_ch * int(np.prod(kernel_size))
        w = self.param(
            "kernel",
            conv_kernel_init(fan_in),
            (self.out_channels, in_ch) + kernel_size,
            self.param_dtype,
        )
        x = x.astype(self.dtype)
        wc = w.astype(self.dtype)
        pk = dict(packed_in=self.packed_in, packed_out=self.packed_out)
        if self.is_transposed:
            y = conv3d(
                x, wc, (1, 1, 1),
                transposed_padding(kernel_size, strides),
                lhs_dilation=strides, use_pallas=self.use_pallas, **pk,
            )
        else:
            y = conv3d(x, wc, strides, same_padding(kernel_size),
                       use_pallas=self.use_pallas, **pk)
        if self.use_bias:
            b = self.param(
                "bias", nn.initializers.zeros, (self.out_channels,), self.param_dtype
            )
            y = y + b.astype(y.dtype).reshape(1, -1, 1, 1, 1)
        y = y.astype(self.dtype)
        if self.conv_only:
            return y
        if _norm_act_ok(y.shape, self.norm, self.act, self.dropout,
                        self.use_pallas):
            from coma_unet_tpu.ops.pallas.norm_act import norm_act

            alpha = (_prelu_alpha(self.param_dtype)
                     if self.act == "prelu" else None)
            return norm_act(y, alpha, self.act)
        y = Norm(kind=self.norm, axis_name=self.axis_name,
                 param_dtype=self.param_dtype, name="norm")(y, train=train)
        if self.dropout > 0.0:
            y = nn.Dropout(rate=self.dropout, deterministic=not train)(y)
        if self.act == "prelu":
            y = PReLU(param_dtype=self.param_dtype, name="prelu")(y)
        else:
            fn = get_act(self.act)
            if fn is not None:
                y = fn(y)
        return y


class CondConvolution(nn.Module):
    """Covariate-conditioned convolution (the reconstructed `CondConv`).

    A routing head maps the per-sample covariate vector [B, K] (or [B, 1, K])
    to sigmoid gates over `num_experts` expert kernels (CondConv, Yang et al.
    2019); the per-sample mixed kernel is applied as a single grouped conv
    with feature_group_count = batch. Optionally a FiLM scale-shift (also from
    the covariates) follows normalization — BASELINE.json frames the reference
    behavior as "FiLM-style covariate modulation", so both mechanisms are
    first-class.

    Call-site contract (`attn_unet_data_parallel.py:126,296-306,324`):
    forward(x, covariate) with covariate [B, 1, K]; supports is_transposed,
    conv_only, strides/kernel_size/padding/dropout/num_experts/num_covars.
    """

    out_channels: int
    kernel_size: Union[int, Sequence[int]] = 3
    strides: Union[int, Sequence[int]] = 1
    act: Optional[str] = "prelu"
    norm: Optional[str] = "instance"
    dropout: float = 0.0
    conv_only: bool = False
    is_transposed: bool = False
    num_experts: int = 8
    num_covars: int = 5
    film: bool = True
    use_bias: bool = True
    use_pallas: bool = False
    packed_in: bool = False
    packed_out: bool = False
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, covariate: Optional[jnp.ndarray], train: bool = True
    ) -> jnp.ndarray:
        kernel_size = _triple(self.kernel_size)
        strides = _triple(self.strides)
        b, in_ch = x.shape[0], x.shape[1]
        fan_in = in_ch * int(np.prod(kernel_size))

        experts = self.param(
            "experts",
            conv_kernel_init(fan_in),
            (self.num_experts, self.out_channels, in_ch) + kernel_size,
            self.param_dtype,
        )

        if covariate is None:
            cov = jnp.zeros((b, self.num_covars), dtype=jnp.float32)
        else:
            cov = covariate.reshape(b, -1)[:, : self.num_covars].astype(jnp.float32)

        # routing gates [B, E]; sigmoid per the CondConv paper.
        routing = nn.Dense(
            self.num_experts, dtype=jnp.float32, param_dtype=self.param_dtype,
            name="route",
        )(cov)
        gates = jax.nn.sigmoid(routing)

        x = x.astype(self.dtype)
        # Mix kernels per sample.
        kern = jnp.einsum(
            "be,e...->b...", gates.astype(self.dtype), experts.astype(self.dtype)
        )  # [B, Cout, Cin, kd, kh, kw]
        pk = dict(packed_in=self.packed_in, packed_out=self.packed_out)
        if self.is_transposed:
            pad = transposed_padding(kernel_size, strides)
            run = lambda xi, ki: conv3d(  # noqa: E731
                xi, ki, (1, 1, 1), pad, lhs_dilation=strides,
                use_pallas=self.use_pallas, **pk,
            )
        else:
            pad = same_padding(kernel_size)
            run = lambda xi, ki: conv3d(  # noqa: E731
                xi, ki, strides, pad, use_pallas=self.use_pallas, **pk
            )
        # one batched pallas call for the whole per-sample mixture when a
        # kernel family supports it (flat compile footprint, no grouped conv)
        y = cond_conv3d(
            x, kern,
            (1, 1, 1) if self.is_transposed else strides,
            strides if self.is_transposed else None,
            self.use_pallas, self.packed_in, self.packed_out,
            padding=pad,
        )
        if y is not None:
            pass
        elif b <= 4:
            # Unroll per sample: B dense convs beat one grouped conv — XLA's
            # TPU grouped-conv lowering costs ~40% extra (measured 371 ms ->
            # 269 ms forward at 128^3 for the whole conditional U-Net).
            y = jnp.concatenate(
                [run(x[i : i + 1], kern[i]) for i in range(b)], axis=0
            )
        else:
            kern_g = kern.reshape((b * self.out_channels, in_ch) + kernel_size)
            xg = x.reshape((1, b * in_ch) + x.shape[2:])
            if self.is_transposed:
                y = conv3d(xg, kern_g, (1, 1, 1), pad, groups=b,
                           lhs_dilation=strides, **pk)
            else:
                y = conv3d(xg, kern_g, strides, pad, groups=b, **pk)
            y = y.reshape((b, self.out_channels) + y.shape[2:])
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.out_channels,), self.param_dtype
            )
            y = y + bias.astype(y.dtype).reshape(1, -1, 1, 1, 1)
        y = y.astype(self.dtype)
        if self.conv_only:
            return y
        if _norm_act_ok(y.shape, self.norm, self.act, self.dropout,
                        self.use_pallas):
            # fused instance-norm + FiLM + act: the per-(b,c) scale/shift
            # ride the kernel's aux block (ops/pallas/norm_act.py), so the
            # whole post-conv chain is two streamed passes
            from coma_unet_tpu.ops.pallas.norm_act import norm_act

            scale = shift = None
            if self.film:
                film = nn.Dense(
                    2 * self.out_channels, dtype=jnp.float32,
                    param_dtype=self.param_dtype,
                    kernel_init=nn.initializers.zeros, name="film",
                )(cov)
                sc, shift = jnp.split(film, 2, axis=-1)
                scale = 1.0 + sc
            alpha = (_prelu_alpha(self.param_dtype)
                     if self.act == "prelu" else None)
            return norm_act(y, alpha, self.act, scale, shift)
        y = Norm(kind=self.norm, axis_name=self.axis_name,
                 param_dtype=self.param_dtype, name="norm")(y, train=train)
        if self.film:
            film = nn.Dense(
                2 * self.out_channels, dtype=jnp.float32,
                param_dtype=self.param_dtype,
                kernel_init=nn.initializers.zeros, name="film",
            )(cov)
            scale, shift = jnp.split(film, 2, axis=-1)
            scale = (1.0 + scale)[:, :, None, None, None].astype(y.dtype)
            shift = shift[:, :, None, None, None].astype(y.dtype)
            y = y * scale + shift
        if self.dropout > 0.0:
            y = nn.Dropout(rate=self.dropout, deterministic=not train)(y)
        if self.act == "prelu":
            y = PReLU(param_dtype=self.param_dtype, name="prelu")(y)
        else:
            fn = get_act(self.act)
            if fn is not None:
                y = fn(y)
        return y


# ---------------------------------------------------------------------------
# composite blocks
# ---------------------------------------------------------------------------


class ConvBlock(nn.Module):
    """attentionunet.ConvBlock: Convolution(stride s) + Convolution(stride 1),
    ReLU activations. Conditional variant = CondConvBlock semantics (covariate
    routed into both convs)."""

    out_channels: int
    strides: Union[int, Sequence[int]] = 1
    kernel_size: Union[int, Sequence[int]] = 3
    dropout: float = 0.0
    conditional: bool = False
    num_covars: int = 5
    num_experts: int = 8
    film: bool = True
    norm: str = "instance"
    remat: bool = False
    use_pallas: bool = False
    packed_in: bool = False
    packed_out: bool = False
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        covariate: Optional[jnp.ndarray] = None,
        train: bool = True,
    ) -> jnp.ndarray:
        # inner per-conv remat keeps the backward-recompute peak at ~one
        # conv's tensors (XLA's conv layouts pad small-channel activations
        # up to 8x, so every avoided live tensor counts at 128^3)
        if self.remat:
            Cond = nn.remat(CondConvolution, static_argnums=(3,))
            Conv = nn.remat(Convolution, static_argnums=(2,))
        else:
            Cond, Conv = CondConvolution, Convolution
        common = dict(
            kernel_size=self.kernel_size,
            act="relu",
            norm=self.norm,
            dropout=self.dropout,
            use_pallas=self.use_pallas,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            axis_name=self.axis_name,
        )
        # conv0 takes the block's input layout and produces the block's
        # output layout; conv1 (stride 1) stays in the output layout
        pk0 = dict(packed_in=self.packed_in, packed_out=self.packed_out)
        pk1 = dict(packed_in=self.packed_out, packed_out=self.packed_out)
        if self.conditional:
            x = Cond(
                out_channels=self.out_channels, strides=self.strides,
                num_covars=self.num_covars, num_experts=self.num_experts,
                film=self.film, name="conv0", **pk0, **common,
            )(x, covariate, train)
            x = Cond(
                out_channels=self.out_channels, strides=1,
                num_covars=self.num_covars, num_experts=self.num_experts,
                film=self.film, name="conv1", **pk1, **common,
            )(x, covariate, train)
        else:
            x = Conv(
                out_channels=self.out_channels, strides=self.strides,
                name="conv0", **pk0, **common,
            )(x, train)
            x = Conv(
                out_channels=self.out_channels, strides=1, name="conv1",
                **pk1, **common,
            )(x, train)
        return x


class AttentionGate(nn.Module):
    """Additive attention gate (`ObservableAttentionBlock`,
    `attn_unet_data_parallel.py:134-150`):

        psi = sigmoid(norm(conv1x1(relu(norm(conv1x1(g)) + norm(conv1x1(x))))))
        out = x * psi

    Returns (out, psi) so attention maps are a first-class debug output
    (SURVEY §5 requires attention-coefficient capture)."""

    f_int: int
    norm: str = "instance"
    remat: bool = False
    use_pallas: bool = False
    packed: bool = False  # g/x arrive (and out/psi leave) in packed layout
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self, g: jnp.ndarray, x: jnp.ndarray, train: bool = True
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        Conv = nn.remat(Convolution, static_argnums=(2,)) if self.remat \
            else Convolution
        common = dict(
            kernel_size=1, strides=1, act=None, norm=self.norm,
            use_pallas=self.use_pallas,
            packed_in=self.packed, packed_out=self.packed,
            dtype=self.dtype, param_dtype=self.param_dtype,
            axis_name=self.axis_name,
        )
        g1 = Conv(out_channels=self.f_int, name="W_g", **common)(g, train)
        x1 = Conv(out_channels=self.f_int, name="W_x", **common)(x, train)
        a = jax.nn.relu(g1 + x1)
        psi = Conv(out_channels=1, name="psi", **common)(a, train)
        psi = jax.nn.sigmoid(psi.astype(jnp.float32)).astype(x.dtype)
        return x * psi, psi


class UpBlock(nn.Module):
    """Transposed-conv upsampling (`UpBlock`, ref :120-131); conditional path
    swaps in the expert-mixture transposed conv (`CondConvolution(
    is_transposed=True)`)."""

    out_channels: int
    strides: Union[int, Sequence[int]] = 2
    kernel_size: Union[int, Sequence[int]] = 3
    dropout: float = 0.0
    conditional: bool = False
    num_covars: int = 6
    num_experts: int = 8
    film: bool = True
    norm: str = "instance"
    use_pallas: bool = False
    packed_in: bool = False
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        covariate: Optional[jnp.ndarray] = None,
        train: bool = True,
    ) -> jnp.ndarray:
        common = dict(
            kernel_size=self.kernel_size, strides=self.strides, act="relu",
            norm=self.norm, dropout=self.dropout, is_transposed=True,
            use_pallas=self.use_pallas, packed_in=self.packed_in,
            dtype=self.dtype, param_dtype=self.param_dtype,
            axis_name=self.axis_name,
        )
        if self.conditional:
            return CondConvolution(
                out_channels=self.out_channels, num_covars=self.num_covars,
                num_experts=self.num_experts, film=self.film, name="up", **common,
            )(x, covariate, train=train)
        return Convolution(out_channels=self.out_channels, name="up", **common)(
            x, train=train
        )


class StackedFusionConvLayers(nn.Module):
    """N-conv LeakyReLU fusion stack (`attn_unet_data_parallel.py:480-501`):
    in->bottleneck, (num_convs-2) x bottleneck->bottleneck, bottleneck->out,
    each a Convolution with LeakyReLU(1e-2) activation."""

    bottleneck_channels: int
    out_channels: int
    num_convs: int = 3
    norm: str = "instance"
    remat: bool = False
    use_pallas: bool = False
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        Conv = nn.remat(Convolution, static_argnums=(2,)) if self.remat \
            else Convolution
        widths = (
            [self.bottleneck_channels] * (self.num_convs - 1) + [self.out_channels]
        )
        for i, w in enumerate(widths):
            x = Conv(
                out_channels=w, act="leakyrelu", norm=self.norm,
                use_pallas=self.use_pallas,
                dtype=self.dtype, param_dtype=self.param_dtype, name=f"conv{i}",
            )(x, train)
        return x


class ProjectionHead(nn.Module):
    """Per-level contrastive embedding (`ProjectionHead`, ref :436-454):
    1x1x1 ConvBlock to one channel -> flatten -> ReLU."""

    norm: str = "instance"
    use_pallas: bool = False
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = ConvBlock(
            out_channels=1, kernel_size=1, norm=self.norm,
            use_pallas=self.use_pallas, dtype=self.dtype,
            param_dtype=self.param_dtype, name="conv",
        )(x, train=train)
        x = x.reshape(x.shape[0], -1)
        return jax.nn.relu(x.astype(jnp.float32))
