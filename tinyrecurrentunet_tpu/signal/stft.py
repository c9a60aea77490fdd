"""STFT / iSTFT with torch.stft-compatible semantics, built for XLA.

The reference relies on cuFFT via `torch.stft`/`torch.istft`
(reference `dataset.py:260,293`, `stft_loss.py:21`) with these semantics,
which we reproduce exactly for spectral parity:

- center=True: the signal is padded by n_fft//2 on both sides (reflect).
- The featurizer passes NO window -> rectangular (all-ones) window of
  length n_fft (reference `dataset.py:260-264`).
- The MR-STFT loss passes a hann window of win_length < n_fft which torch
  zero-pads symmetrically to n_fft (reference `stft_loss.py:89,100`).
- istft divides the overlap-add by the summed squared window envelope and
  trims the n_fft//2 center padding, yielding (T-1)*hop samples.

TPU notes: when hop divides n_fft (the hot 512/128 path), framing and
overlap-add are pure reshape/slice/add programs — no gather/scatter — so XLA
fuses them cleanly around the rFFT. The general path (loss banks with
hop=50) uses a strided gather, which is fine off the hot path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, dtype=jnp.float32) -> jax.Array:
    """torch.hann_window(periodic=True) parity: 0.5 - 0.5 cos(2 pi n / N)."""
    n = np.arange(win_length)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    return jnp.asarray(w, dtype=dtype)


def _pad_window(window: jax.Array, n_fft: int) -> jax.Array:
    """Center-pad a window to n_fft (torch.stft behavior for short windows)."""
    win_length = window.shape[0]
    if win_length == n_fft:
        return window
    lpad = (n_fft - win_length) // 2
    return jnp.pad(window, (lpad, n_fft - win_length - lpad))


def _center_pad(x: jax.Array, n_fft: int, pad_mode: str) -> jax.Array:
    pad = n_fft // 2
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode=pad_mode)


def frame_signal(x: jax.Array, n_fft: int, hop_length: int) -> jax.Array:
    """Slice a (..., L) signal into (..., T, n_fft) frames, T = 1 + (L-n_fft)//hop.

    Uses the reshape/stack decomposition when hop divides n_fft (no gather).
    """
    length = x.shape[-1]
    num_frames = 1 + (length - n_fft) // hop_length
    if n_fft % hop_length == 0:
        ratio = n_fft // hop_length
        num_blocks = length // hop_length
        blocks = x[..., : num_blocks * hop_length].reshape(
            x.shape[:-1] + (num_blocks, hop_length)
        )
        # frame t = concat(blocks[t], ..., blocks[t+ratio-1])
        parts = [blocks[..., k : k + num_frames, :] for k in range(ratio)]
        return jnp.concatenate(parts, axis=-1)
    starts = np.arange(num_frames) * hop_length
    idx = starts[:, None] + np.arange(n_fft)[None, :]
    return x[..., idx]


def overlap_add(frames: jax.Array, hop_length: int, length: int) -> jax.Array:
    """Inverse of frame_signal: (..., T, n_fft) -> (..., length) by summation."""
    n_fft = frames.shape[-1]
    num_frames = frames.shape[-2]
    if n_fft % hop_length == 0:
        ratio = n_fft // hop_length
        num_blocks = num_frames + ratio - 1
        chunks = frames.reshape(frames.shape[:-1] + (ratio, hop_length))
        out = jnp.zeros(frames.shape[:-2] + (num_blocks, hop_length), frames.dtype)
        for k in range(ratio):
            out = out.at[..., k : k + num_frames, :].add(chunks[..., k, :])
        out = out.reshape(frames.shape[:-2] + (num_blocks * hop_length,))
    else:
        total = (num_frames - 1) * hop_length + n_fft
        starts = np.arange(num_frames) * hop_length
        idx = (starts[:, None] + np.arange(n_fft)[None, :]).reshape(-1)
        flat = frames.reshape(frames.shape[:-2] + (num_frames * n_fft,))
        out = jnp.zeros(frames.shape[:-2] + (total,), frames.dtype)
        out = out.at[..., idx].add(flat)
    return out[..., :length]


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length", "center", "pad_mode"))
def stft(
    x: jax.Array,
    n_fft: int = 512,
    hop_length: int = 128,
    window: jax.Array | None = None,
    center: bool = True,
    pad_mode: str = "reflect",
) -> jax.Array:
    """Complex STFT of a (..., L) signal -> (..., T, F) with F = n_fft//2+1.

    Layout note: time-major (T, F), the framework's canonical spec layout;
    torch.stft returns (F, T) (reference `dataset.py:260`).
    """
    if center:
        x = _center_pad(x, n_fft, pad_mode)
    frames = frame_signal(x, n_fft, hop_length)
    if window is not None:
        frames = frames * _pad_window(window, n_fft)
    return jnp.fft.rfft(frames, n=n_fft, axis=-1)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length", "center", "length"))
def istft(
    spec: jax.Array,
    n_fft: int = 512,
    hop_length: int = 128,
    window: jax.Array | None = None,
    center: bool = True,
    length: int | None = None,
) -> jax.Array:
    """Inverse STFT of (..., T, F) complex -> (..., L) real.

    torch.istft parity: OLA of windowed irfft frames divided by the summed
    squared-window envelope, center padding trimmed; default output length
    (T-1)*hop (reference `dataset.py:293-296`).
    """
    num_frames = spec.shape[-2]
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1)
    win = jnp.ones((n_fft,), frames.dtype) if window is None else _pad_window(
        window, n_fft
    ).astype(frames.dtype)
    frames = frames * win

    full = (num_frames - 1) * hop_length + n_fft
    signal = overlap_add(frames, hop_length, full)
    env = overlap_add(
        jnp.broadcast_to(win * win, (num_frames, n_fft)), hop_length, full
    )
    signal = signal / jnp.where(env > 1e-11, env, 1.0)

    if center:
        pad = n_fft // 2
        out_len = full - 2 * pad if length is None else length
        signal = jax.lax.dynamic_slice_in_dim(signal, pad, out_len, axis=-1)
    elif length is not None:
        signal = signal[..., :length]
    return signal


def stft_magnitude(
    x: jax.Array,
    fft_size: int,
    hop_size: int,
    win_length: int,
    window: jax.Array | None = None,
    clamp_min: float = 1e-7,
) -> jax.Array:
    """Magnitude spectrogram sqrt(clamp(re^2+im^2, min)) of shape (..., T, F).

    Matches the reference loss helper (`stft_loss.py:9-30`), which clamps
    before sqrt to avoid NaN gradients at silence.
    """
    if window is None:
        window = hann_window(win_length, jnp.float32)
    spec = stft(x, n_fft=fft_size, hop_length=hop_size, window=window)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    return jnp.sqrt(jnp.maximum(power, clamp_min))
