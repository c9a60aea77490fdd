"""Multi-resolution STFT loss.

Parity with the reference (reference `stft_loss.py:9-166`): per-resolution
spectral-convergence + log-magnitude terms on hann-windowed magnitudes
(win_length zero-padded to fft_size), averaged over the bank and scaled by
sc_lambda/mag_lambda; optional high-band-only variant.

TPU-native: the three banks are unrolled into one jitted program; each bank
is a framed rFFT (see signal/stft.py) feeding pure reductions, so XLA fuses
the whole loss into the train step.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tinyrecurrentunet_tpu.config import STFTLossConfig
from tinyrecurrentunet_tpu.signal.stft import hann_window, stft_magnitude


def spectral_convergence_loss(x_mag: jax.Array, y_mag: jax.Array) -> jax.Array:
    """||Y - X||_F / ||Y||_F  (reference `stft_loss.py:50`)."""
    return jnp.linalg.norm(y_mag - x_mag) / jnp.linalg.norm(y_mag)


def log_stft_magnitude_loss(x_mag: jax.Array, y_mag: jax.Array) -> jax.Array:
    """L1(log Y, log X)  (reference `stft_loss.py:69`)."""
    return jnp.mean(jnp.abs(jnp.log(y_mag) - jnp.log(x_mag)))


@dataclasses.dataclass(frozen=True)
class MultiResolutionSTFTLoss:
    """Callable (x, y) -> (sc_loss, mag_loss); x, y are (..., T) waveforms.

    Multi-dim inputs are flattened to (B, T) like the reference's
    (B, C, T) -> (B*C, T) (reference `stft_loss.py:151-153`).
    """

    config: STFTLossConfig = dataclasses.field(default_factory=STFTLossConfig)

    def __call__(self, x: jax.Array, y: jax.Array):
        cfg = self.config
        if x.ndim == 1:
            x, y = x[None], y[None]
        elif x.ndim > 2:
            x = x.reshape(-1, x.shape[-1])
            y = y.reshape(-1, y.shape[-1])

        sc_loss = 0.0
        mag_loss = 0.0
        for fft_size, hop, win_length in zip(
            cfg.fft_sizes, cfg.hop_sizes, cfg.win_lengths
        ):
            window = hann_window(win_length)
            x_mag = stft_magnitude(x, fft_size, hop, win_length, window)
            y_mag = stft_magnitude(y, fft_size, hop, win_length, window)
            if cfg.band == "high":
                # the reference indexes freq at axis 1 of (B, T, F).T —
                # i.e. keeps the upper half of the frames axis; the intended
                # behavior is the upper half of the FREQUENCY bins.
                half = x_mag.shape[-1] // 2
                x_mag = x_mag[..., half:]
                y_mag = y_mag[..., half:]
            sc_loss += spectral_convergence_loss(x_mag, y_mag)
            mag_loss += log_stft_magnitude_loss(x_mag, y_mag)

        n = len(cfg.fft_sizes)
        return (
            sc_loss * cfg.sc_lambda / n,
            mag_loss * cfg.mag_lambda / n,
        )
