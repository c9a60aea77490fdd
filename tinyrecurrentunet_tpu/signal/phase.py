"""Phase demodulation / remodulation.

The reference demodulates the STFT phase by unwrapping along time and taking
sin/cos channels ("real"/"imag" demodulated phase, reference
`dataset.py:162-179`), and remodulates with arctan2 (reference
`dataset.py:182-203`). Its hand-rolled `unwrap` is broken (defect D17,
`dataset.py:37-51`); we implement np.unwrap semantics (shape-preserving,
correct along any axis) — on TPU the cumulative-sum correction compiles to a
log-depth parallel scan, so there is no sequential bottleneck.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def unwrap(p: jax.Array, axis: int = -1) -> jax.Array:
    """np.unwrap parity (period 2*pi), shape-preserving.

    jnp.unwrap implements exactly numpy's semantics; kept as a named wrapper
    so the framework has one documented unwrap (reference defect D17 fixed).
    """
    return jnp.unwrap(p, axis=axis)


def unwrap_step(phase_t: jax.Array, prev_phase: jax.Array, prev_corr: jax.Array):
    """One streaming step of unwrap along time.

    Args:
      phase_t: raw (wrapped) phase of the current frame, shape (F,).
      prev_phase: raw phase of the previous frame, shape (F,).
      prev_corr: accumulated correction so far, shape (F,).

    Returns:
      (unwrapped_t, new_corr): such that feeding frames one at a time
      reproduces unwrap(phases, axis=time) exactly (streaming-vs-offline
      equivalence; see tests).
    """
    pi = jnp.pi
    dd = phase_t - prev_phase
    ddmod = jnp.mod(dd + pi, 2.0 * pi) - pi
    ddmod = jnp.where((ddmod == -pi) & (dd > 0), pi, ddmod)
    ph_correct = jnp.where(jnp.abs(dd) < pi, 0.0, ddmod - dd)
    new_corr = prev_corr + ph_correct
    return phase_t + new_corr, new_corr


def demod_phase(phase: jax.Array, axis: int = -2):
    """Demodulated phase channels: (sin(unwrap), cos(unwrap)).

    Naming preserved from the reference: `real_demod = sin`, `imag_demod =
    cos` (reference `dataset.py:173-179`); remodulation is
    `arctan2(real_demod, imag_demod)` so the pair is self-consistent.

    Args:
      phase: (..., T, F) phase; `axis` is the time axis (default -2 in our
        time-major layout; the reference unwraps along its last/time axis).
    """
    unwrapped = unwrap(phase, axis=axis)
    return jnp.sin(unwrapped), jnp.cos(unwrapped)


def mod_phase(real_demod: jax.Array, imag_demod: jax.Array) -> jax.Array:
    """Recover the wrapped phase angle from demodulated channels
    (reference `dataset.py:194`).

    Gradient-safe at (0, 0): arctan2's partials are NaN there, and network
    outputs (unlike true sin/cos pairs) can be exactly zero — e.g. ReLU-dead
    receptive fields behind a zero-init bias. Those points are remapped to
    (0, 1) -> phase 0 with zero gradient; everywhere else this is exact.
    """
    both_zero = (real_demod == 0.0) & (imag_demod == 0.0)
    safe_real = jnp.where(both_zero, 0.0, real_demod)
    safe_imag = jnp.where(both_zero, 1.0, imag_demod)
    return jnp.arctan2(safe_real, safe_imag)
