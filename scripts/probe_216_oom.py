import os, sys, time
sys.path.insert(0, ".")
os.environ.setdefault("COMA_CACHE_PRUNE_MB", "60")
import jax, jax.numpy as jnp
import numpy as np
from coma_unet_tpu.utils.compile_cache import prune_compile_cache
prune_compile_cache()
import dataclasses as dc
from __graft_entry__ import _make_batch, init_on_cpu
from coma_unet_tpu.config import LossConfig, ModelConfig
from coma_unet_tpu.models import ContraAttnUNet
from coma_unet_tpu.train import create_train_state, make_optimizer
from coma_unet_tpu.train.step import make_split_train_step, aot_precompile_segments
from coma_unet_tpu.utils.param_cache import cached_variables

cfg = dc.replace(ModelConfig(), prompt_shape=(216, 216, 216))
model = ContraAttnUNet(cfg)
batch = _make_batch(np.random.default_rng(0), b=1, s=216)
v = cached_variables(model, batch, lambda: init_on_cpu(model, batch))
state = create_train_state(
    model, make_optimizer(1e-3), jax.random.PRNGKey(0),
    (batch["mri"], batch["covars"], batch["roi_loc"], batch["roi_std"],
     batch["roi_compact"]), {"train": True}, variables=v)
step = make_split_train_step(model, LossConfig(roi_weight=1.0), donate=True,
                             remat_blocks=True, fold_update=False)
rw = jnp.full((36,), 1.0)
t0 = time.time()
aot_precompile_segments(step, state, batch, rw)
print(f"AOT: {time.time()-t0:.1f}s", flush=True)
segs = step.segments
key = jax.random.PRNGKey(1)

def fetch(tag, out):
    t0 = time.time()
    leaf = jax.tree.leaves(out)[0]
    s = float(jnp.sum(leaf.astype(jnp.float32)))
    print(f"{tag}: OK ({time.time()-t0:.1f}s, sum={s:.4g})", flush=True)
    return out

try:
    feats = fetch("enc_fwd", segs["enc_fwd"](state.params, batch, key))
    (l_aux, grads) = segs["dec_grad"](state.params, feats, batch, rw, key,
                                      None)
    fetch("dec_grad", l_aux)
    g_dec, g_feats = grads
    g_enc = fetch("enc_bwd", segs["enc_bwd"](state.params, batch, key,
                                             g_feats))
    new_state, extra = segs["update"](state, g_dec, g_enc)
    fetch("update", extra)
    print("FULL CHAIN OK", flush=True)
except Exception as e:
    print(f"FAILED: {str(e)[:400]}", flush=True)
