from coma_unet_tpu.train.optim import make_optimizer, ReduceLROnPlateau  # noqa: F401
from coma_unet_tpu.train.state import TrainState, create_train_state  # noqa: F401
from coma_unet_tpu.train.step import make_train_step, make_eval_step  # noqa: F401
