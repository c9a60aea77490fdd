"""Per-Channel Energy Normalization (PCEN).

The reference implements PCEN as a Python loop over frames with an IIR
smoother M[t] = (1-s) M[t-1] + s x[t] and first state M[0] = s x[0]
(reference `dataset.py:56-76` — dead code there, wired here as the fourth
feature channel per `README.md:50` and SURVEY.md §0.2).

TPU-native design: the IIR smoother is a first-order linear recurrence,
computed with `jax.lax.associative_scan` (log-depth, parallel over the VPU)
instead of a 751-step sequential loop. Note M[0] = s x[0] is exactly the
zero-initialized recurrence, so no special-casing is needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _smoother(x: jax.Array, s: float, axis: int, m0: jax.Array | None = None):
    """M[t] = (1-s) M[t-1] + s x[t] along `axis`, M[-1] = m0 (default 0)."""
    x = jnp.moveaxis(x, axis, 0)
    a = jnp.full_like(x, 1.0 - s)
    b = s * x
    if m0 is not None:
        b = b.at[0].add((1.0 - s) * m0)

    def combine(left, right):
        a_l, b_l = left
        a_r, b_r = right
        return a_l * a_r, a_r * b_l + b_r

    _, m = jax.lax.associative_scan(combine, (a, b), axis=0)
    return jnp.moveaxis(m, 0, axis)


def pcen(
    x: jax.Array,
    eps: float = 1e-6,
    s: float = 0.025,
    alpha: float = 0.98,
    delta: float = 2.0,
    r: float = 0.5,
    axis: int = -2,
    m0: jax.Array | None = None,
) -> jax.Array:
    """PCEN of a magnitude spectrogram.

    Args:
      x: (..., T, F) magnitude; `axis` is the time (smoothing) axis.
      m0: optional smoother carry-in for streaming (shape = x without the
        time axis); None reproduces the offline M[0] = s*x[0].

    Returns:
      (x / (M + eps)^alpha + delta)^r - delta^r   (reference `dataset.py:73`).
    """
    m = _smoother(x, s, axis, m0)
    return (x / jnp.power(m + eps, alpha) + delta) ** r - delta**r


def pcen_step(
    x_t: jax.Array,
    m_prev: jax.Array,
    eps: float = 1e-6,
    s: float = 0.025,
    alpha: float = 0.98,
    delta: float = 2.0,
    r: float = 0.5,
):
    """One streaming PCEN step: returns (pcen_t, m_t).

    Feeding frames one at a time with m_prev initialized to zeros reproduces
    the offline `pcen` exactly (M[0] = s x[0] falls out of the zero init).
    """
    m_t = (1.0 - s) * m_prev + s * x_t
    out = (x_t / jnp.power(m_t + eps, alpha) + delta) ** r - delta**r
    return out, m_t
