"""Train state: params + batch stats + optimizer state in one pytree."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from tinyrecurrentunet_tpu.config import Config
from tinyrecurrentunet_tpu.models import TRUNet
from tinyrecurrentunet_tpu.signal import Featurizer
from tinyrecurrentunet_tpu.train.schedule import linear_warmup_cosine_decay


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """AdamW + grad clip + warmup/cosine schedule (reference
    `train.py:68,102-110,138`)."""
    opt = cfg.train.optimization
    schedule = linear_warmup_cosine_decay(
        opt.learning_rate,
        opt.n_iters,
        divider=opt.lr_divider,
        warmup_proportion=opt.warmup_proportion,
    )
    return optax.chain(
        optax.clip_by_global_norm(opt.grad_clip_norm),
        optax.adamw(schedule, weight_decay=opt.weight_decay),
    )


def create_train_state(
    cfg: Config, rng: jax.Array | None = None, model: TRUNet | None = None
) -> TrainState:
    """Initialize model + optimizer state for the configured input regime."""
    model = model or TRUNet(cfg.network)
    featurizer = Featurizer(cfg.featurizer)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    # A couple of frames is enough to build every param shape.
    dummy = jnp.zeros((2, featurizer.config.num_freqs, cfg.network.input_size))
    variables = model.init(rng, dummy)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        tx=make_optimizer(cfg),
    )
