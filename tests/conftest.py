"""Test configuration: force an 8-device virtual CPU platform so multi-chip
sharding tests run without TPU hardware (SURVEY §4's 'multi-node simulation'
equivalent)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment may pre-register a TPU platform plugin (and force
# jax_platforms to it) via sitecustomize; tests always run on the virtual
# 8-device CPU mesh, so override back to CPU before any backend initializes.
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

from coma_unet_tpu.config import LossConfig, ModelConfig  # noqa: E402


@pytest.fixture(scope="session")
def tiny_model_config() -> ModelConfig:
    return ModelConfig(
        channels=(4, 8, 16),
        strides=(2, 2, 2),
        latent_spaces=(32, 32, 32),
        prompt_shape=(16, 16, 16),
        num_experts=4,
        compute_dtype="float32",
    )


@pytest.fixture(scope="session")
def tiny_loss_config() -> LossConfig:
    return LossConfig(cds_weights=(0.0, 1.0, 4.0))


@pytest.fixture()
def rng():
    return jax.random.PRNGKey(0)


def make_batch(key, b=2, s=16, r=36, with_triplet=False):
    ks = jax.random.split(key, 12)
    def vol(k):
        return jax.random.uniform(k, (b, 1, s, s, s), minval=0.0, maxval=1.0)
    batch = {
        "mri": vol(ks[0]),
        "tau": vol(ks[1]),
        "roi_compact": jax.random.randint(ks[2], (b, s, s, s), 0, r + 1),
        "covars": jax.random.uniform(ks[3], (b, 6)),
        "abeta": jnp.array([1.0, 0.0][:b] + [1.0] * max(0, b - 2)),
        "roi_loc": jax.random.uniform(ks[4], (b, r)),
        "roi_std": jax.random.uniform(ks[5], (b, r)) * 0.1,
    }
    if with_triplet:
        for i, p in enumerate(("pos_", "neg_")):
            batch[p + "mri"] = vol(ks[6 + i])
            batch[p + "covars"] = jax.random.uniform(ks[8 + i], (b, 6))
            batch[p + "roi_compact"] = batch["roi_compact"]
            batch[p + "roi_loc"] = batch["roi_loc"]
            batch[p + "roi_std"] = batch["roi_std"]
    return batch


@pytest.fixture()
def tiny_batch(rng):
    return make_batch(rng)
