"""Is the split step's traced module stable run-over-run? Lowers the real
segment programs (no compile) and prints the cache-key component hashes.
Two consecutive runs diff clean iff the persistent compile cache can ever
hit. Usage:

    python scripts/module_hash_probe.py > /tmp/mh1.txt 2>&1   (x2, diff)
"""

import hashlib
import sys

sys.path.insert(0, ".")

import jax
import numpy as np

import jax._src.cache_key as ck


def _h(update):
    o = hashlib.sha256()
    update(o)
    return o.hexdigest()[:16]


def main():
    import jax.numpy as jnp

    from __graft_entry__ import _make_batch
    from coma_unet_tpu.config import LossConfig, ModelConfig
    from coma_unet_tpu.models import ContraAttnUNet
    from coma_unet_tpu.train import create_train_state, make_optimizer
    from coma_unet_tpu.train.step import make_split_train_step

    model = ContraAttnUNet(ModelConfig())
    rng = np.random.default_rng(0)
    batch = _make_batch(rng, b=2, s=128)

    from __graft_entry__ import init_on_cpu
    from coma_unet_tpu.utils.param_cache import cached_variables

    variables = cached_variables(model, batch, lambda: init_on_cpu(model, batch))
    state = create_train_state(
        model, make_optimizer(1e-3), jax.random.PRNGKey(0),
        (batch["mri"], batch["covars"], batch["roi_loc"], batch["roi_std"],
         batch["roi_compact"]),
        {"train": True}, variables=variables,
    )
    from coma_unet_tpu.train.step import default_segment_policies

    step = make_split_train_step(model, LossConfig(), donate=False)
    segs = step.segments
    pols = default_segment_policies()
    roi_w = jnp.full((36,), 225.0)
    key = jax.random.PRNGKey(1)

    lowered = {}
    with pols["enc_fwd"]:
        lowered["enc_fwd"] = segs["enc_fwd"].jitted.lower(
            state.params, batch, key)
        feats = jax.eval_shape(segs["enc_fwd"].jitted,
                               state.params, batch, key)
    feats = jax.tree.map(lambda a: jnp.zeros(a.shape, a.dtype), feats)
    with pols["dec_bwd_update"]:
        lowered["dec_bwd_update"] = segs["dec_bwd_update"].jitted.lower(
            state, feats, batch, roi_w, key, None)

    for name, low in lowered.items():
        module = low._lowering.stablehlo()
        print(f"{name} module:",
              _h(lambda o: ck._hash_computation(
                  o, module, ck.IgnoreCallbacks.NO)))
        text = low.as_text()
        print(f"{name} text_sha:",
              hashlib.sha256(text.encode()).hexdigest()[:16],
              f"({len(text)} chars)")

    if "--dump" in sys.argv:
        with open("/tmp/dec_module.txt", "w") as f:
            f.write(lowered["dec_bwd_update"].as_text())
        print("dumped /tmp/dec_module.txt")

    if "--compile" not in sys.argv:
        return

    # hook the cache key computation and AOT-compile enc_fwd on the real
    # backend: prints ONE hash per key component so two runs can be diffed
    # (module? compile options? accelerator config?)
    real_get = ck.get

    def probed_get(module, devices, compile_options, backend,
                   compression_algorithm="zstandard",
                   ignore_callbacks=ck.IgnoreCallbacks.NO):
        print("---- cache_key.get ----")
        print("module:", _h(lambda o: ck._hash_computation(
            o, module, ignore_callbacks)))
        print("devices:", _h(lambda o: ck._hash_devices(o, devices)))
        print("compile_options:", _h(
            lambda o: ck._hash_serialized_compile_options(
                o, compile_options)))
        print("accelerator_config:", _h(
            lambda o: ck._hash_accelerator_config(o, devices)))
        print("env_option_overrides:",
              sorted(compile_options.env_option_overrides))
        print("exe_build_options:\n",
              compile_options.executable_build_options)
        key = real_get(module, devices, compile_options, backend,
                       compression_algorithm, ignore_callbacks)
        print("whole_key:", key)
        return key

    ck.get = probed_get
    import time

    t0 = time.time()
    exe = lowered["enc_fwd"].compile()
    print(f"enc_fwd AOT compile: {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
