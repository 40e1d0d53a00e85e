"""Attribute Mosaic payload bytes per kernel in a split-step segment.

Lowers ONE segment (enc/dec/bwd — same traces as scripts/bisect_enc_bwd.py)
for the TPU target WITHOUT compiling (lowering is local; only the compile
RPC is remote), then sizes every `tpu_custom_call` payload in the
StableHLO. Payload bytes are the serialized Mosaic module per kernel —
the input the remote helper compiles, and the best local proxy for which
family bloats the compiled executable past the relay's cache budget
(ROUND_NOTES "Relay executable-cache budget").

    COMA_NORM_FUSED=0 COMA_PALLAS_DISABLE=p1 \
    python scripts/payload_attrib.py dec
"""

import collections
import os
import re
import sys
import time

sys.path.insert(0, ".")

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from __graft_entry__ import _make_batch
    from coma_unet_tpu.config import LossConfig, ModelConfig
    from coma_unet_tpu.losses.composite import GenerativeContrastiveLoss
    from coma_unet_tpu.models import ContraAttnUNet

    mode = sys.argv[1] if len(sys.argv) > 1 else "dec"
    print("env:",
          {k: v for k, v in os.environ.items() if k.startswith("COMA_")},
          flush=True)
    import dataclasses

    cfg = dataclasses.replace(ModelConfig(), remat=False)
    model = ContraAttnUNet(cfg)
    rng = np.random.default_rng(0)
    batch = _make_batch(rng, b=2, s=128)
    batch_abs = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), batch
    )
    var_abs = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0), batch["mri"], batch["covars"],
            batch["roi_loc"], batch["roi_std"], batch["roi_compact"],
            train=False,
        )
    )
    params_abs = var_abs["params"]
    rng_abs = jax.ShapeDtypeStruct((2,), jnp.uint32)

    def _enc(params, b, rng):
        return model.apply(
            {"params": params}, b["mri"], b["covars"],
            train=True, rngs={"dropout": rng}, stage="encoder",
        )

    feats_abs = jax.eval_shape(_enc, params_abs, batch_abs, rng_abs)

    if mode == "enc":
        fn = jax.jit(_enc)
        args = (params_abs, batch_abs, rng_abs)
    elif mode == "dec":
        criterion = GenerativeContrastiveLoss(LossConfig())

        def _dec_loss(params, b, feats, roi_weights, rng):
            outs = model.apply(
                {"params": params}, b["mri"], b["covars"],
                b.get("roi_loc"), b.get("roi_std"), b.get("roi_compact"),
                train=True, with_projections=True, rngs={"dropout": rng},
                stage="decoder", encoder_feats=feats,
            )
            losses = criterion(
                outs.out, b["tau"], b["roi_compact"], roi_weights,
                rnc_features=outs.projections[-1], rnc_labels=b["covars"],
                voxel_weights=None, valid=b.get("valid_mask"),
            )
            return losses.total, {"loss": losses.total}

        fn = jax.jit(jax.value_and_grad(_dec_loss, argnums=(0, 2),
                                        has_aux=True))
        roi_abs = jax.ShapeDtypeStruct((36,), jnp.float32)
        args = (params_abs, batch_abs, feats_abs, roi_abs, rng_abs)
    else:  # bwd
        def _enc_bwd(params, b, rng, g_feats):
            _, vjp_fn = jax.vjp(lambda p: _enc(p, b, rng), params)
            return vjp_fn(g_feats)[0]

        fn = jax.jit(_enc_bwd)
        args = (params_abs, batch_abs, rng_abs, feats_abs)

    t0 = time.time()
    txt = fn.lower(*args).as_text()
    print(f"lowered ({time.time()-t0:.1f}s), {len(txt)/1e6:.1f} MB "
          f"StableHLO text", flush=True)

    # every Mosaic kernel lowers to stablehlo.custom_call
    # @tpu_custom_call with the serialized module in backend_config;
    # the kernel body name ("..._kernel") rides inside the payload.
    sizes = collections.Counter()
    counts = collections.Counter()
    for m in re.finditer(
        r'custom_call[^\n]*?@tpu_custom_call[^\n]*?backend_config\s*=\s*"'
        r'((?:[^"\\]|\\.)*)"', txt,
    ):
        payload = m.group(1)
        names = set(re.findall(r"_(?:\w+_)?kernel\w*", payload[:200000]))
        nm = re.search(r'func\.func public @(\w+)', payload)
        key = nm.group(1) if nm else (sorted(names)[0] if names else "?")
        sizes[key] += len(payload)
        counts[key] += 1
    total = sum(sizes.values())
    print(f"{mode}: {total/1e6:.1f} MB total Mosaic payload, "
          f"{sum(counts.values())} calls")
    for k, v in sizes.most_common(25):
        print(f"  {v/1e6:7.2f} MB  x{counts[k]:<3d} {k}")


if __name__ == "__main__":
    main()
