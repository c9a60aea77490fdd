"""Training runtime (L3): schedule, pjit train step, checkpointing, loop."""

from tinyrecurrentunet_tpu.train.schedule import linear_warmup_cosine_decay  # noqa: F401
from tinyrecurrentunet_tpu.train.state import TrainState, create_train_state  # noqa: F401
from tinyrecurrentunet_tpu.train.step import make_train_step, make_eval_step  # noqa: F401
