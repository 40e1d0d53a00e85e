"""Covariate-conditioned 3D Attention U-Net.

Re-architecture of `ObservableAttentionUnet`
(`attn_unet_data_parallel.py:243-434`): the reference builds the encoder-
decoder recursively and threads activations through a nested-tuple pyramid
(`:235-240`) that `forward` re-unrolls (`:389-432`). Here the network is an
explicit iterative encoder/decoder over flat lists — the same computation and
feature-extraction order, expressed as a clean pytree XLA can schedule.

Per-level feature order matches the reference's unrolled lists exactly:
  encoder_feats = [c0@full, c1@1/2, ..., c_{L-1}@1/2^{L-1}]   (ref :401-421)
  decoder_feats = [c0 merged (final), c1 merged, ..., c_{L-2} merged]

Covariate threading matches `:209,212,425,428`: ConvBlocks (head + encoder)
see covariate[..., :5]; UpBlocks and the 1x1 reduce conv see all 6.
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from coma_unet_tpu.config import ModelConfig
from coma_unet_tpu.models.blocks import (
    AttentionGate,
    CondConvolution,
    ConvBlock,
    Convolution,
    UpBlock,
    _triple,
)
from coma_unet_tpu.ops.pallas.conv3d_strided import pack_w, unpack_w


@flax.struct.dataclass
class UNetFeatures:
    out: jnp.ndarray                      # [B, out_channels, D, H, W]
    encoder: Tuple[jnp.ndarray, ...]      # per-level encoder features
    decoder: Tuple[jnp.ndarray, ...]      # per-level merged decoder features
    attention: Tuple[jnp.ndarray, ...]    # psi maps, top level first


class AttentionUNet(nn.Module):
    """The encoder-decoder backbone (reduce_channels included).

    `stage` splits the forward at the encoder/decoder boundary so the train
    step can compile the two halves as SEPARATE XLA programs (the remote TPU
    compile helper OOMs past a cumulative Mosaic-kernel budget per module —
    see `train.step.make_split_train_step`):
      * "full"    — the whole network (default; init always uses this).
      * "encoder" — head + down blocks only; returns the encoder feature
        tuple (all in the standard unpacked layout).
      * "decoder" — consumes `encoder_feats` (the "encoder" stage's output)
        and runs gates/up/merge/reduce. The packed-64^3 skip is recomputed
        via `pack_w` (a pure layout transform, exact inverse of `unpack_w`).
    Module names are identical across stages, so one param pytree serves all
    three; gradients w.r.t. encoder params flow only through
    `encoder_feats`, which is exactly the cut the split train step needs.
    """

    config: ModelConfig

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        covariate: Optional[jnp.ndarray] = None,
        train: bool = True,
        stage: str = "full",
        encoder_feats: Optional[Tuple[jnp.ndarray, ...]] = None,
    ) -> UNetFeatures:
        if stage not in ("full", "encoder", "decoder"):
            raise ValueError(f"unknown stage {stage!r}")
        if stage == "decoder" and encoder_feats is None:
            raise ValueError("stage='decoder' requires encoder_feats")
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)
        pdtype = jnp.dtype(cfg.param_dtype)
        channels = cfg.channels
        strides = cfg.strides
        depth = len(channels)

        cov_block = None
        cov_full = None
        if cfg.conditional and covariate is not None:
            cov_full = covariate.reshape(covariate.shape[0], -1)
            cov_block = cov_full[:, : cfg.block_num_covars]

        # Rematerialize per-block: XLA's TPU conv layouts store small-channel
        # full-resolution activations with up to 128x tile padding, so keeping
        # every block's activations for backward OOMs at 128^3; recompute them.
        if cfg.remat:
            Block = nn.remat(ConvBlock, static_argnums=(3,))
            Up = nn.remat(UpBlock, static_argnums=(3,))
            Gate = nn.remat(AttentionGate, static_argnums=(3,))
            Merge = nn.remat(Convolution, static_argnums=(2,))
            CondReduce = nn.remat(CondConvolution, static_argnums=(3,))
        else:
            Block, Up, Gate, Merge, CondReduce = (
                ConvBlock, UpBlock, AttentionGate, Convolution, CondConvolution
            )

        block_args = dict(
            kernel_size=cfg.kernel_size,
            dropout=cfg.dropout,
            conditional=cfg.conditional,
            num_covars=cfg.block_num_covars,
            num_experts=cfg.num_experts,
            film=cfg.film,
            norm=cfg.norm,
            remat=cfg.remat,
            use_pallas=cfg.pallas_convs,
            dtype=dtype,
            param_dtype=pdtype,
        )

        # The 64^3 level runs in the PACKED layout (D-pairs on lanes,
        # ops/pallas/conv3d_strided.py): the stride-2 down0 conv EMITS packed,
        # every 64^3-level op (conv1, gate1, merge1) consumes/produces packed,
        # and the up0 transposed conv CONSUMES packed — zero pack/unpack
        # transposes inside the level. External features (encoder/decoder/psi
        # lists) are always unpacked; XLA drops the conversions when unused.
        # The predicate is evaluated on level-0 spatial dims so the "decoder"
        # stage (which never sees x) resolves it identically.
        lvl0 = x if stage != "decoder" else encoder_feats[0]
        packed_lvl = (
            cfg.pallas_convs and cfg.packed_level and depth >= 3
            and _triple(cfg.kernel_size) == (3, 3, 3)
            and _triple(cfg.up_kernel_size) == (3, 3, 3)
            and strides[0] == 2 and lvl0.shape[-1] == 128
            and lvl0.shape[-3] % 4 == 0 and lvl0.shape[-2] % 2 == 0
            and channels[0] <= 32 and channels[1] <= 64
        )

        # The packed level runs WITHOUT remat: its activations are 8x smaller
        # than level 0's (so storing them is cheap), and avoiding the
        # backward recompute halves both the step's Pallas work and the
        # number of large Mosaic kernels per compiled module (the remote
        # compile helper OOMs past a cumulative kernel budget).
        pk_args = dict(block_args, remat=False)

        if stage == "decoder":
            encoder = list(encoder_feats)
            skip1_packed = pack_w(encoder[1]) if packed_lvl else None
        else:
            # ---- encoder ----
            # head: ConvBlock(in -> channels[0], stride 1)  (ref :289-294)
            h = Block(out_channels=channels[0], strides=1, name="head",
                      **block_args)(x, cov_block, train)
            encoder = [h]
            skip1_packed = None
            for i in range(depth - 1):
                pk = packed_lvl and i == 0
                h = (Block if not pk else ConvBlock)(
                    out_channels=channels[i + 1], strides=strides[i],
                    name=f"down{i}", packed_out=pk,
                    **(block_args if not pk else pk_args),
                )(h, cov_block, train)
                if pk:
                    skip1_packed = h
                    h = unpack_w(h)
                encoder.append(h)
            if stage == "encoder":
                return tuple(encoder)

        # ---- decoder (bottom-up) ----
        attention_maps: List[Any] = [None] * (depth - 1)
        decoder_rev: List[jnp.ndarray] = []
        d = encoder[-1]
        for i in range(depth - 2, -1, -1):
            pk_lvl = packed_lvl and i == 1   # 64^3 gate/merge run packed
            pk_in = packed_lvl and i == 0    # up0 consumes the packed merge
            up = (Up if not pk_in else UpBlock)(
                out_channels=channels[i], strides=strides[i],
                kernel_size=cfg.up_kernel_size, dropout=cfg.dropout,
                conditional=cfg.conditional, num_covars=cfg.num_covars,
                num_experts=cfg.num_experts, film=cfg.film, norm=cfg.norm,
                use_pallas=cfg.pallas_convs, packed_in=pk_in,
                dtype=dtype, param_dtype=pdtype, name=f"up{i}",
            )(d, cov_full, train)
            if up.shape[2:] != encoder[i].shape[2:]:
                # odd level sizes (e.g. template-space 216^3: 27 -> up 28):
                # crop the upsample to the skip, classic U-Net style. The
                # reference's own flagship CRASHES here (ConvTranspose3d
                # emits 2*d vs the odd skip; its template-space direct path
                # was never validated — SURVEY §5) — cropping makes direct
                # 216^3 training well-defined.
                ed, eh, ew = encoder[i].shape[2:]
                up = up[:, :, :ed, :eh, :ew]
            up_l = pack_w(up) if pk_lvl else up
            skip = skip1_packed if pk_lvl else encoder[i]
            att, psi = (Gate if not pk_lvl else AttentionGate)(
                f_int=max(channels[i] // 2, 1), norm=cfg.norm,
                remat=cfg.remat and not pk_lvl, use_pallas=cfg.pallas_convs,
                packed=pk_lvl, dtype=dtype,
                param_dtype=pdtype, name=f"gate{i}",
            )(up_l, skip, train)
            merged = (Merge if not pk_lvl else Convolution)(
                out_channels=channels[i], kernel_size=3, act="prelu",
                norm=cfg.norm, dropout=cfg.dropout,
                use_pallas=cfg.pallas_convs,
                packed_in=pk_lvl, packed_out=pk_lvl, dtype=dtype,
                param_dtype=pdtype, name=f"merge{i}",
            )(jnp.concatenate([att, up_l], axis=1), train)
            attention_maps[i] = unpack_w(psi) if pk_lvl else psi
            decoder_rev.append(unpack_w(merged) if pk_lvl else merged)
            d = merged

        decoder = list(reversed(decoder_rev))

        # ---- 1x1 reduce conv (ref :296-306): conv_only, full 6 covars ----
        if cfg.conditional:
            # use_pallas matters here despite the tiny FLOP count: the XLA
            # lowering of the 32->1 conv picks a channel-minor layout whose
            # relayout copies dominate HBM at 216^3 (2x 4.8 GB temps — 8x
            # padded input copy + 256x padded output, probe_216 OOM dump)
            out = CondReduce(
                out_channels=cfg.out_channels, kernel_size=1, strides=1,
                conv_only=True, num_experts=cfg.num_experts,
                num_covars=cfg.num_covars, film=cfg.film, dtype=dtype,
                use_pallas=cfg.pallas_convs,
                param_dtype=pdtype, name="reduce",
            )(d, cov_full, train)
        else:
            out = Merge(
                out_channels=cfg.out_channels, kernel_size=1, strides=1,
                conv_only=True, dtype=dtype, param_dtype=pdtype,
                use_pallas=cfg.pallas_convs, name="reduce",
            )(d, train)

        return UNetFeatures(
            out=out,
            encoder=tuple(encoder),
            decoder=tuple(decoder),
            attention=tuple(attention_maps),
        )
