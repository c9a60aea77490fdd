"""Segment-wise cosine-similarity loss.

Intended behavior of the reference `CosSimLoss` (reference `cos_loss.py:4-56`):
1 - cosine_similarity over progressive segments g = [508, 1016, 2032, 4062],
averaged over segments and batch. The reference's version detached gradients
through `torch.FloatTensor(loss)` (defect D18); this one is differentiable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

DEFAULT_SEGMENTS = (508, 1016, 2032, 4062)


def cossim_loss(
    x: jax.Array,
    y: jax.Array,
    segments: tuple = DEFAULT_SEGMENTS,
    eps: float = 1e-5,
) -> jax.Array:
    """x, y: (..., T) waveforms; returns a scalar."""
    if x.ndim == 1:
        x, y = x[None], y[None]

    def cos_sim(a, b):
        dot = jnp.sum(a * b, axis=-1)
        na = jnp.maximum(jnp.linalg.norm(a, axis=-1), eps)
        nb = jnp.maximum(jnp.linalg.norm(b, axis=-1), eps)
        return dot / (na * nb)

    total = 0.0
    prev = 0
    for g in segments:
        seg_x = x[..., prev:g]
        seg_y = y[..., prev:g]
        total += jnp.mean(1.0 - cos_sim(seg_x, seg_y))
        prev = g
    return total / len(segments)
