from coma_unet_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicate_sharding,
    shard_batch,
    make_sharded_split_train_step,
    make_sharded_train_step,
)
from coma_unet_tpu.parallel.mesh import make_sharded_eval_step  # noqa: F401
