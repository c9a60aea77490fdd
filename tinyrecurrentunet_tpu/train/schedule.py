"""Linear-warmup / cosine-decay learning-rate schedule.

Reference semantics (reference `util.py:81-156`, `train.py:102-110`):
- phase 1: linear from lr_max/divider to lr_max over warmup_proportion of
  the run (5%, divider 25),
- phase 2: cosine from lr_max down to (lr_max/divider)/1e4,
- resumable by construction (pure function of the step counter — the
  reference re-seeks by rebuilding the stateful object at `iteration`).

The reference's Phase objects also *wrap around* past n_iters
(`util.py:150-154` resets to phase 0) — an artifact, not intent; this
schedule clamps at the terminal value. It also steps the scheduler before
the optimizer (defect D19) so the first update uses lr(1); this pure
schedule matches that indexing: lr(count) for optax count starting at 0
equals the reference's lr after count+1 scheduler.step() calls.
"""

from __future__ import annotations

import jax.numpy as jnp


def linear_warmup_cosine_decay(
    lr_max: float,
    n_iters: int,
    divider: float = 25.0,
    warmup_proportion: float = 0.05,
):
    """Returns an optax-style schedule: count -> learning rate."""
    phase1 = max(int(n_iters * warmup_proportion), 1)
    phase2 = max(n_iters - phase1, 1)
    lr_min = lr_max / divider
    lr_final = lr_min / 1e4

    def schedule(count):
        n = jnp.asarray(count, jnp.float32) + 1.0  # reference steps first
        # phase 1: anneal_linear(lr_min, lr_max, n/phase1)
        warm = lr_min + (n / phase1) * (lr_max - lr_min)
        # phase 2: anneal_cosine(lr_max, lr_final, n2/phase2)
        n2 = jnp.clip(n - phase1, 0.0, phase2)
        cos_val = jnp.cos(jnp.pi * (n2 / phase2)) + 1.0
        decay = lr_final + (lr_max - lr_final) / 2.0 * cos_val
        return jnp.where(n <= phase1, jnp.minimum(warm, lr_max), decay)

    return schedule
