"""Characterize the relay's executable-cache policy.

Measured (artifacts/r3/alternation_probe.log): every PAIR of split-step
programs alternates at exactly the sum of their solo times, but the
3-program chain pays ~35-55 s per dispatch — eviction. Two hypotheses fit:
a 2-slot LRU (count-bounded) or a total-size cap between 91 MB (dec+enc_bwd,
fits) and 102 MB (all three, thrashes).

Discriminator: cycle the 11 MB enc_fwd program with two TINY programs.
  * slow cycle  -> count-bounded LRU (2 slots)
  * fast cycle  -> size-bounded cache (small programs coexist fine)

Cheap: enc_fwd hits the persistent compile cache (~1 s), tinies compile in
seconds. Run: JAX_COMPILATION_CACHE_DIR=.jax_cache python scripts/probe_exec_cache.py
"""

import os
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
    from coma_unet_tpu.config import LossConfig, ModelConfig
    from coma_unet_tpu.models import ContraAttnUNet
    from coma_unet_tpu.train.step import make_split_train_step
    from scripts.train_step_probe import cached_flagship_variables
    from __graft_entry__ import _make_batch

    cfg = ModelConfig()
    model = ContraAttnUNet(cfg)
    rng = np.random.default_rng(0)
    batch = _make_batch(rng, b=2, s=128)
    variables = cached_flagship_variables(model, batch)
    params = variables["params"]
    step = make_split_train_step(model, LossConfig(), donate=False)
    enc_fwd = step.segments["enc_fwd"]
    key = jax.random.PRNGKey(0)

    t0 = time.time()
    feats = enc_fwd(params, batch, key)
    _ = float(jnp.sum(feats[-1].astype(jnp.float32)))
    print(f"enc_fwd warm: {time.time()-t0:.1f}s", flush=True)

    # two tiny programs with distinct HLO
    @jax.jit
    def tiny_a(x):
        return jnp.sum(x * 2.0 + 1.0)

    @jax.jit
    def tiny_b(x):
        return jnp.sum(jnp.sin(x))

    xs = jnp.ones((128, 128), jnp.float32)
    print("tiny_a", float(tiny_a(xs)), "tiny_b", float(tiny_b(xs)),
          flush=True)

    def fetch(out):
        leaf = jax.tree.leaves(out)[0]
        return float(jnp.sum(leaf.astype(jnp.float32)))

    def cycle(tag, calls, n=5):
        for c in calls:
            c()  # warm the set once
        fetch(calls[-1]())
        t0 = time.time()
        out = None
        for _ in range(n):
            for c in calls:
                out = c()
        fetch(out)
        ms = (time.time() - t0) / n * 1000
        print(f"  cycle {tag}: {ms:9.1f} ms/cycle", flush=True)

    enc_call = lambda: enc_fwd(params, batch, key)  # noqa: E731
    a_call = lambda: tiny_a(xs)  # noqa: E731
    b_call = lambda: tiny_b(xs)  # noqa: E731

    cycle("enc_fwd solo       ", [enc_call])
    cycle("tiny_a <-> tiny_b  ", [a_call, b_call])
    cycle("enc, tiny_a        ", [enc_call, a_call])
    cycle("enc, tiny_a, tiny_b", [enc_call, a_call, b_call])


if __name__ == "__main__":
    main()
