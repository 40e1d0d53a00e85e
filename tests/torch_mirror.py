"""Plain-torch functional mirror of the reconstructed flagship ContraAttnUNet.

VERDICT r3 item 4: the parity bar in BASELINE.md is model-level, but r1-r3
pinned only primitives (tests/test_torch_parity.py). This module mirrors the
ASSEMBLED flagship — backbone, CondConv expert routing + FiLM, attention
gates, modulator head, projection heads — in torch primitives, driven
directly by the flax param pytree, so an end-to-end forward and a one-step
AdamW update can be compared number-for-number.

Scope note: the reference's own `CondConv` module is missing from its repo
(SURVEY §2.9), so this is an apples-to-apples check of everything EXCEPT
that unknowable module: both sides here implement the SAME reconstruction
(sigmoid-routed expert mixture + FiLM). What this pins is that the JAX/Flax
assembly computes exactly what a torch implementation of the reconstruction
computes — layer ordering, norm semantics, padding, covariate threading,
prompt selection, ROI painting (`attn_unet_data_parallel.py:503-693`).

Everything is f32 and eager; no torch modules are registered — the forward
is a pure function of (params, inputs) where params is a nested dict of
torch tensors (leaves may be `requires_grad=True` for the AdamW step test).
"""

from __future__ import annotations

import torch
import torch.nn.functional as F


def _t(params, *path):
    node = params
    for p in path:
        node = node[p]
    return node


def instance_norm(x: torch.Tensor) -> torch.Tensor:
    # torch InstanceNorm3d defaults: affine=False, eps=1e-5
    return F.instance_norm(x, eps=1e-5)


def act_fn(name):
    if name is None:
        return lambda x: x
    if name == "relu":
        return F.relu
    if name == "leakyrelu":
        return lambda x: F.leaky_relu(x, negative_slope=1e-2)
    raise ValueError(name)


def conv(x, w, b, stride=1, transposed=False):
    """Our OIDHW correlation conv / lhs-dilated transposed conv in torch.

    Transposed mapping pinned by tests/test_torch_parity.py: our kernel
    [Cout, Cin, k, k, k] equals flip+io-swap of torch's ConvTranspose3d
    weight [Cin, Cout, k, k, k]; (k=3, s=2, p=1, output_padding=1) is the
    MONAI 'SAME' deconv (`models/blocks.py:transposed_padding`)."""
    k = w.shape[-1]
    if transposed:
        w_t = torch.flip(w, dims=(2, 3, 4)).permute(1, 0, 2, 3, 4)
        return F.conv_transpose3d(
            x, w_t, bias=b, stride=stride, padding=(k - 1) // 2,
            output_padding=stride + 2 * ((k - 1) // 2) - k,
        )
    return F.conv3d(x, w, bias=b, stride=stride, padding=k // 2)


def convolution(params, x, act="prelu", stride=1, transposed=False,
                conv_only=False, norm=True):
    """blocks.Convolution: conv -> bias -> [norm -> dropout -> act]."""
    y = conv(x, params["kernel"], params["bias"], stride, transposed)
    if conv_only:
        return y
    if norm:
        y = instance_norm(y)
    if act == "prelu":
        return F.prelu(y, params["prelu"]["alpha"])
    return act_fn(act)(y)


def cond_convolution(params, x, cov, num_covars, act="relu", stride=1,
                     transposed=False, conv_only=False, film=True):
    """blocks.CondConvolution: sigmoid expert routing -> per-sample conv ->
    bias -> norm -> FiLM -> act."""
    b = x.shape[0]
    cov = cov.reshape(b, -1)[:, :num_covars].float()
    gates = torch.sigmoid(
        cov @ _t(params, "route", "kernel") + _t(params, "route", "bias")
    )  # [B, E]
    experts = params["experts"]  # [E, Cout, Cin, k, k, k]
    kern = torch.einsum("be,eoidhw->boidhw", gates, experts)
    y = torch.cat(
        [conv(x[i:i + 1], kern[i], None, stride, transposed)
         for i in range(b)], dim=0,
    )
    y = y + params["bias"].reshape(1, -1, 1, 1, 1)
    if conv_only:
        return y
    y = instance_norm(y)
    if film:
        f = cov @ _t(params, "film", "kernel") + _t(params, "film", "bias")
        scale, shift = torch.chunk(f, 2, dim=-1)
        y = y * (1.0 + scale)[:, :, None, None, None] \
            + shift[:, :, None, None, None]
    return act_fn(act)(y)


def conv_block(params, x, cov, num_covars, stride, conditional=True):
    """blocks.ConvBlock: Convolution(stride) + Convolution(1), relu acts."""
    if conditional:
        x = cond_convolution(params["conv0"], x, cov, num_covars,
                             act="relu", stride=stride)
        return cond_convolution(params["conv1"], x, cov, num_covars,
                                act="relu", stride=1)
    x = convolution(params["conv0"], x, act="relu", stride=stride)
    return convolution(params["conv1"], x, act="relu", stride=1)


def attention_gate(params, g, x):
    """blocks.AttentionGate: psi = sigmoid(norm(conv(relu(Wg g + Wx x))))."""
    g1 = convolution(params["W_g"], g, act=None)
    x1 = convolution(params["W_x"], x, act=None)
    a = F.relu(g1 + x1)
    psi = torch.sigmoid(convolution(params["psi"], a, act=None))
    return x * psi, psi


def fusion_stack(params, x, num_convs=3):
    """blocks.StackedFusionConvLayers: N k=3 convs, leakyrelu(1e-2)."""
    for i in range(num_convs):
        x = convolution(params[f"conv{i}"], x, act="leakyrelu")
    return x


def projection_head(params, x):
    """blocks.ProjectionHead: 1x1 ConvBlock to 1 ch -> flatten -> relu."""
    x = conv_block(params["conv"], x, None, 0, stride=1, conditional=False)
    return F.relu(x.reshape(x.shape[0], -1))


def unet_forward(params, x, cov_full, cfg):
    """models/attention_unet.AttentionUNet (unpacked path)."""
    channels, strides = cfg.channels, cfg.strides
    depth = len(channels)
    cov_block = cov_full.reshape(x.shape[0], -1)[:, :cfg.block_num_covars]
    nb = cfg.block_num_covars

    h = conv_block(params["head"], x, cov_block, nb, stride=1,
                   conditional=cfg.conditional)
    encoder = [h]
    for i in range(depth - 1):
        h = conv_block(params[f"down{i}"], h, cov_block, nb,
                       stride=strides[i], conditional=cfg.conditional)
        encoder.append(h)

    d = encoder[-1]
    for i in range(depth - 2, -1, -1):
        if cfg.conditional:
            up = cond_convolution(
                params[f"up{i}"]["up"], d, cov_full, cfg.num_covars,
                act="relu", stride=strides[i], transposed=True,
            )
        else:
            up = convolution(params[f"up{i}"]["up"], d, act="relu",
                             stride=strides[i], transposed=True)
        att, _psi = attention_gate(params[f"gate{i}"], up, encoder[i])
        d = convolution(params[f"merge{i}"], torch.cat([att, up], dim=1),
                        act="prelu")

    if cfg.conditional:
        out = cond_convolution(params["reduce"], d, cov_full,
                               cfg.num_covars, conv_only=True)
    else:
        out = convolution(params["reduce"], d, conv_only=True)
    return out, encoder


def paint_roi(compact, values):
    """ops/roi.paint_roi_values: per-sample gather of per-ROI scalars."""
    b = compact.shape[0]
    out = torch.zeros(compact.shape, dtype=values.dtype)
    for i in range(values.shape[1]):
        out = torch.where(compact == i + 1,
                          values[:, i].reshape((b,) + (1,) * (compact.ndim - 1)),
                          out)
    return out


def modulator(params, x, out, cov, roi_loc, roi_std, roi_compact):
    """models/contra.ContraAttnUNet._modulator."""
    b = x.shape[0]
    abeta = cov.reshape(b, -1)[:, 0]
    is_pos = (abeta == 1.0).reshape(b, 1, 1, 1, 1)
    prompt = torch.where(is_pos, params["pos_dynamic_prompt"],
                         params["neg_dynamic_prompt"])

    loc = torch.nan_to_num(roi_loc.float())
    std = torch.nan_to_num(roi_std.float())
    suvr = paint_roi(roi_compact, loc)[:, None]
    saliency = paint_roi(roi_compact, std)[:, None]
    mask = x >= 1e-4
    suvr = torch.where(mask, suvr, torch.zeros(()))
    saliency = torch.where(mask, saliency, torch.zeros(()))

    mod_in = torch.cat([prompt * torch.ones_like(out), saliency, suvr], dim=1)
    modulated = params["general_dynamic_prompt"] + fusion_stack(
        params["deep_modulator_3c"], mod_in
    )
    fused = fusion_stack(params["fusion_layer"],
                         torch.cat([modulated, out], dim=1))
    final = convolution(params["final_pred_head"],
                        torch.cat([out, fused], dim=1), act="prelu")
    return F.relu(final)


def contra_forward(params, batch, cfg):
    """End-to-end ContraAttnUNet.forward -> (out, projections, final_proj)."""
    x = batch["mri"]
    cov = batch["covars"]
    out, encoder = unet_forward(params["unet"], x, cov, cfg)
    if cfg.with_modulator:
        out = modulator(params, x, out, cov, batch["roi_loc"],
                        batch["roi_std"], batch["roi_compact"])
    else:
        out = F.relu(out)
    projections = tuple(
        projection_head(params[f"proj{i}"], encoder[i])
        for i in range(len(cfg.channels))
    )
    pooled = out.mean(dim=(2, 3, 4))
    final_proj = F.relu(
        pooled @ _t(params, "final_proj", "kernel")
        + _t(params, "final_proj", "bias")
    )
    return out, projections, final_proj
