"""Why does the persistent compile cache miss run-over-run on the axon
backend? jax's cache key hashes several components (serialized MLIR,
jaxlib version, compile options, accelerator config, compression, custom
hooks). This hooks `jax._src.cache_key.get` to print ONE hash per
component for a fixed toy program, so two consecutive runs can be diffed
component-by-component.

Usage: python scripts/cache_key_probe.py > /tmp/ckey1.txt 2>&1  (x2, diff)
"""

import hashlib
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import jax._src.cache_key as ck

_real_get = ck.get


def _h(update):
    o = hashlib.sha256()
    update(o)
    return o.hexdigest()[:16]


def probed_get(module, devices, compile_options, backend,
               compression_algorithm="zstandard",
               ignore_callbacks=ck.IgnoreCallbacks.NO):
    print("---- cache_key.get call ----")
    print("module_name:", module.operation.attributes.get("sym_name", "?"))
    print("module:", _h(lambda o: ck._hash_computation(o, module, ignore_callbacks)))
    print("devices:", _h(lambda o: ck._hash_devices(o, devices)))
    print("compile_options:", _h(
        lambda o: ck._hash_serialized_compile_options(o, compile_options)))
    print("accelerator_config:", _h(
        lambda o: ck._hash_accelerator_config(o, devices)))
    print("compression:", _h(lambda o: o.update(
        compression_algorithm.encode())))
    # dump the interesting option fields verbatim for diffing
    ebo = compile_options.executable_build_options
    print("env_option_overrides:", sorted(compile_options.env_option_overrides))
    print("exe_build_options:\n", ebo)
    key = _real_get(module, devices, compile_options, backend,
                    compression_algorithm, ignore_callbacks)
    print("whole_key:", key)
    return key


ck.get = probed_get
# compilation_cache looks `cache_key.get` up through the module at call
# time, so patching the module attribute is sufficient
import jax._src.compilation_cache as cc  # noqa: E402

assert cc.cache_key is ck


def main():
    fn = jax.jit(lambda x: jnp.sum(x * 2.0 + 1.0))
    x = np.ones((8, 128), np.float32)
    out = fn(x)
    print("result:", float(out))


if __name__ == "__main__":
    main()
