"""Walk the enc_bwd/dec_grad jaxprs at 216^3 and list every lax conv that
still falls back to XLA (the channel-minor-relayout OOM class on v5e,
artifacts/r3/probe_216_*.log), plus the pallas_call population. Pure
trace-time analysis: runs on CPU with the TPU dispatch gates forced on, so
it reflects exactly what the chip probe (scripts/probe_216.py) traces.

    python scripts/trace_216_bwd.py [S=216] [b=1]
"""

import os
import sys
from collections import Counter

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

import coma_unet_tpu.models.blocks as blocks
import coma_unet_tpu.ops.pallas.conv3d as _c3

blocks._on_tpu = lambda: True  # trace the TPU dispatch on CPU
_orig_supported = _c3.pallas_conv3d_supported


def _supported_as_tpu(*a, **kw):
    real = jax.default_backend
    jax.default_backend = lambda: "tpu"
    try:
        return _orig_supported(*a, **kw)
    finally:
        jax.default_backend = real


_c3.pallas_conv3d_supported = _supported_as_tpu

from coma_unet_tpu.config import LossConfig, ModelConfig
from coma_unet_tpu.models import ContraAttnUNet
from coma_unet_tpu.train.step import train_remat_variant
from coma_unet_tpu.losses.composite import GenerativeContrastiveLoss

S = int(sys.argv[1]) if len(sys.argv) > 1 else 216
B = int(sys.argv[2]) if len(sys.argv) > 2 else 1


def walk(jaxpr, hits, depth=0):
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "conv_general_dilated":
            lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
            out = eqn.outvars[0].aval
            hits["convs"].append(
                (tuple(lhs.shape), tuple(rhs.shape), tuple(out.shape),
                 eqn.params.get("window_strides"),
                 eqn.params.get("lhs_dilation"),
                 str(lhs.dtype))
            )
        elif name == "pallas_call":
            hits["pallas"][eqn.params.get("name", "?")] += 1
        for sub in jax.core.jaxprs_in_params(eqn.params) \
                if hasattr(jax.core, "jaxprs_in_params") else []:
            walk(sub, hits, depth + 1)
        # recurse into call/closed jaxprs the portable way
        for v in eqn.params.values():
            if isinstance(v, jax.extend.core.ClosedJaxpr):
                walk(v.jaxpr, hits, depth + 1)
            elif hasattr(v, "eqns"):
                walk(v, hits, depth + 1)
            elif isinstance(v, (list, tuple)):
                for u in v:
                    if isinstance(u, jax.extend.core.ClosedJaxpr):
                        walk(u.jaxpr, hits, depth + 1)
                    elif hasattr(u, "eqns"):
                        walk(u, hits, depth + 1)


def report(tag, fn, *args):
    jx = jax.make_jaxpr(fn)(*args)
    hits = {"convs": [], "pallas": Counter()}
    walk(jx.jaxpr, hits)
    print(f"== {tag}: {len(hits['convs'])} XLA convs, "
          f"{sum(hits['pallas'].values())} pallas_calls")
    wide = []
    for lhs, rhs, out, ws, ld, dt in hits["convs"]:
        vox = max(np.prod(lhs[2:]), np.prod(out[2:]))
        gb = 0.0
        # channel-minor relayout cost model: bf16 pads C up to mult of 16(?)
        # -> flag anything with spatial >= 128^3 and C <= 64
        if vox >= 128 ** 3 and (lhs[1] <= 64 or out[1] <= 64):
            wide.append((lhs, rhs, out, ws, ld, dt))
    for lhs, rhs, out, ws, ld, dt in sorted(wide, key=lambda t: -np.prod(t[0])):
        print(f"   WIDE XLA conv lhs={lhs} rhs={rhs} out={out} "
              f"strides={ws} lhs_dil={ld} {dt}")
    small = len(hits["convs"]) - len(wide)
    if small:
        print(f"   (+{small} small XLA convs)")
    for k, v in sorted(hits["pallas"].items()):
        print(f"   pallas {k} x{v}")


def main():
    cfg = ModelConfig(prompt_shape=(S, S, S))
    model = train_remat_variant(ContraAttnUNet(cfg), True)

    def _enc(params, batch, rng):
        return model.apply({"params": params}, batch["mri"], batch["covars"],
                           train=True, rngs={"dropout": rng}, stage="encoder")

    sds = lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype)  # noqa: E731
    batch_s = {
        "mri": jax.ShapeDtypeStruct((B, 1, S, S, S), jnp.float32),
        "tau": jax.ShapeDtypeStruct((B, 1, S, S, S), jnp.float32),
        "roi_compact": jax.ShapeDtypeStruct((B, S, S, S), jnp.int32),
        "covars": jax.ShapeDtypeStruct((B, 6), jnp.float32),
        "roi_loc": jax.ShapeDtypeStruct((B, 36), jnp.float32),
        "roi_std": jax.ShapeDtypeStruct((B, 36), jnp.float32),
    }
    rng_s = jax.ShapeDtypeStruct((2,), jnp.uint32)
    params_s = jax.eval_shape(
        lambda k, m, c, l, st, r: model.init(k, m, c, l, st, r, train=False),
        rng_s, batch_s["mri"], batch_s["covars"], batch_s["roi_loc"],
        batch_s["roi_std"], batch_s["roi_compact"],
    )["params"]

    feats_s = jax.eval_shape(_enc, params_s, batch_s, rng_s)

    def enc_bwd(params, batch, rng, g_feats):
        _, vjp_fn = jax.vjp(lambda p: _enc(p, batch, rng), params)
        return vjp_fn(g_feats)[0]

    report("enc_fwd", _enc, params_s, batch_s, rng_s)
    report("enc_bwd", enc_bwd, params_s, batch_s, rng_s, feats_s)

    criterion = GenerativeContrastiveLoss(LossConfig(roi_weight=1.0))

    def _dec_loss(params, feats, batch, roi_weights, rng):
        outs = model.apply(
            {"params": params}, batch["mri"], batch["covars"],
            batch.get("roi_loc"), batch.get("roi_std"),
            batch.get("roi_compact"), train=True, with_projections=True,
            rngs={"dropout": rng}, stage="decoder", encoder_feats=feats,
        )
        losses = criterion(
            outs.out, batch["tau"], batch["roi_compact"], roi_weights,
            rnc_features=outs.projections[-1], rnc_labels=batch["covars"],
        )
        return losses.total

    rw_s = jax.ShapeDtypeStruct((36,), jnp.float32)
    report("dec_grad", jax.grad(_dec_loss, argnums=(0, 1)),
           params_s, feats_s, batch_s, rw_s, rng_s)


if __name__ == "__main__":
    main()
