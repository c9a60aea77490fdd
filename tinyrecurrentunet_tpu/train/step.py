"""The jitted train/eval steps, single-chip or SPMD over a mesh.

One program covers both: pass a mesh and the step jits with the batch
sharded on the `data` axis and state replicated — XLA inserts the gradient
all-reduce over ICI (this file replaces the reference's entire DP machinery:
`distributed.py:42-147` broadcast + bucketed grad hooks, `train.py:132-133`
loss reduce).

The state is donated, so optimizer updates happen in-place in HBM.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from tinyrecurrentunet_tpu.config import Config
from tinyrecurrentunet_tpu.losses import loss_fn
from tinyrecurrentunet_tpu.models import TRUNet
from tinyrecurrentunet_tpu.parallel.mesh import batch_sharding, replicated_sharding
from tinyrecurrentunet_tpu.signal import Featurizer
from tinyrecurrentunet_tpu.train.state import TrainState


def global_norm(tree: Any) -> jax.Array:
    return jnp.sqrt(
        sum(jnp.sum(jnp.square(x)) for x in jax.tree.leaves(tree))
    )


def make_train_step(
    cfg: Config,
    model: TRUNet | None = None,
    mesh: Mesh | None = None,
    with_carry: bool = False,
):
    """Build the jitted train step.

    with_carry=False: (state, clean, noisy) -> (state, metrics).
    with_carry=True:  (state, clean, noisy, tgru_h0) -> (state, metrics,
      tgru_h) — the TBPTT segment step: the TGRU hidden state flows across
      segments while gradients truncate at the boundary (the carry crosses
      jit calls as data, SURVEY.md §5 long-context plan).

    clean/noisy: (B, L) waveforms, B divisible by the mesh's data axis.
    """
    model = model or TRUNet(cfg.network)
    featurizer = Featurizer(cfg.featurizer)
    loss_cfg = cfg.train.loss_config

    def step(state: TrainState, clean, noisy, tgru_h0=None):
        def compute_loss(params):
            loss, loss_dict, new_stats, tgru_h = loss_fn(
                state.apply_fn,
                params,
                state.batch_stats,
                clean,
                noisy,
                featurizer,
                cfg.network,
                loss_cfg,
                train=True,
                tgru_h0=tgru_h0,
            )
            return loss, (loss_dict, new_stats, tgru_h)

        (loss, (loss_dict, new_stats, tgru_h)), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(state.params)
        metrics = dict(loss_dict)
        metrics["grad_norm"] = global_norm(grads)
        new_state = state.apply_gradients(grads=grads, batch_stats=new_stats)
        if with_carry:
            return new_state, metrics, jax.lax.stop_gradient(tgru_h)
        return new_state, metrics

    if not with_carry:
        fn = lambda state, clean, noisy: step(state, clean, noisy)  # noqa: E731
        if mesh is None:
            return jax.jit(fn, donate_argnums=(0,))
        repl = replicated_sharding(mesh)
        data = batch_sharding(mesh)
        return jax.jit(
            fn,
            in_shardings=(repl, data, data),
            out_shardings=(repl, repl),
            donate_argnums=(0,),
        )

    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 3))
    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    return jax.jit(
        step,
        in_shardings=(repl, data, data, data),
        out_shardings=(repl, repl, data),
        donate_argnums=(0, 3),
    )


def make_eval_step(cfg: Config, model: TRUNet | None = None, mesh: Mesh | None = None):
    """Jitted eval step: (state, clean, noisy) -> metrics (no state update)."""
    model = model or TRUNet(cfg.network)
    featurizer = Featurizer(cfg.featurizer)
    loss_cfg = cfg.train.loss_config

    def step(state: TrainState, clean: jax.Array, noisy: jax.Array):
        loss, loss_dict, _, _ = loss_fn(
            state.apply_fn,
            state.params,
            state.batch_stats,
            clean,
            noisy,
            featurizer,
            cfg.network,
            loss_cfg,
            train=False,
        )
        return loss_dict

    if mesh is None:
        return jax.jit(step)
    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    return jax.jit(step, in_shardings=(repl, data, data), out_shardings=repl)


def current_learning_rate(cfg: Config, step_count: int) -> float:
    """The LR the optimizer will use at `step_count` (for logging parity
    with the reference's lr scalar, `train.py:152`)."""
    from tinyrecurrentunet_tpu.train.schedule import linear_warmup_cosine_decay

    opt = cfg.train.optimization
    sched = linear_warmup_cosine_decay(
        opt.learning_rate, opt.n_iters, opt.lr_divider, opt.warmup_proportion
    )
    return float(sched(step_count))
