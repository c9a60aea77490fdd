"""Speech-quality metrics: SI-SDR, SNR, native STOI, gated PESQ.

The reference evaluates PESQ-WB/NB + STOI via the `pesq`/`pystoi` C
extensions (reference `eval.py:12-13,32-34`). Those are host-side metric
deps, not model-path code; here:
- SI-SDR and SNR are first-party (numpy),
- STOI is a first-party implementation of Taal et al. 2011 (the algorithm
  behind pystoi): 10 kHz, 15 one-third-octave bands, 384 ms segments,
  clipped correlation,
- PESQ (ITU-T P.862) stays an optional import — when the wheel is present
  it is resampled to 16 kHz as the standard requires (fixes reference D20,
  which fed 48 kHz audio to a 16 kHz-only call).
"""

from __future__ import annotations

import numpy as np
from scipy.signal import resample_poly


def si_sdr(estimate: np.ndarray, reference: np.ndarray, eps: float = 1e-8) -> float:
    """Scale-invariant SDR in dB (Le Roux et al. 2019)."""
    estimate = np.asarray(estimate, np.float64)
    reference = np.asarray(reference, np.float64)
    n = min(len(estimate), len(reference))
    estimate, reference = estimate[:n], reference[:n]
    alpha = np.dot(estimate, reference) / (np.dot(reference, reference) + eps)
    target = alpha * reference
    noise = estimate - target
    return float(
        10.0 * np.log10((np.sum(target**2) + eps) / (np.sum(noise**2) + eps))
    )


def snr(estimate: np.ndarray, reference: np.ndarray, eps: float = 1e-8) -> float:
    n = min(len(estimate), len(reference))
    err = estimate[:n] - reference[:n]
    return float(
        10.0 * np.log10((np.sum(reference[:n] ** 2) + eps) / (np.sum(err**2) + eps))
    )


# ---------------------------------------------------------------- STOI ----

_STOI_SR = 10000
_STOI_FRAME = 256
_STOI_HOP = 128
_STOI_NFFT = 512
_STOI_NBANDS = 15
_STOI_MINFREQ = 150.0
_STOI_SEG = 30  # frames per short-time segment (384 ms)
_STOI_BETA = -15.0  # lower SDR bound, dB
_STOI_DYN_RANGE = 40.0  # silent-frame threshold, dB


def _thirdoct_bands(sr=_STOI_SR, nfft=_STOI_NFFT, num=_STOI_NBANDS, min_freq=_STOI_MINFREQ):
    """One-third-octave band matrix (num, nfft//2+1)."""
    f = np.linspace(0, sr, nfft + 1)[: nfft // 2 + 1]
    k = np.arange(num)
    cf = 2.0 ** (k / 3.0) * min_freq
    lo = 2.0 ** ((2 * k - 1) / 6.0) * min_freq
    hi = 2.0 ** ((2 * k + 1) / 6.0) * min_freq
    obm = np.zeros((num, len(f)))
    for i in range(num):
        lo_i = np.argmin((f - lo[i]) ** 2)
        hi_i = np.argmin((f - hi[i]) ** 2)
        obm[i, lo_i:hi_i] = 1.0
    del cf
    return obm


def _stft_frames(x: np.ndarray):
    win = np.hanning(_STOI_FRAME + 2)[1:-1]
    n = 1 + (len(x) - _STOI_FRAME) // _STOI_HOP
    idx = np.arange(n)[:, None] * _STOI_HOP + np.arange(_STOI_FRAME)[None, :]
    return np.fft.rfft(x[idx] * win, n=_STOI_NFFT, axis=-1)


def _remove_silent_frames(x, y):
    win = np.hanning(_STOI_FRAME + 2)[1:-1]
    n = 1 + (len(x) - _STOI_FRAME) // _STOI_HOP
    idx = np.arange(n)[:, None] * _STOI_HOP + np.arange(_STOI_FRAME)[None, :]
    energies = 20 * np.log10(np.linalg.norm(x[idx] * win, axis=1) + 1e-12)
    mask = energies > (np.max(energies) - _STOI_DYN_RANGE)
    x_out = np.zeros_like(x)
    y_out = np.zeros_like(y)
    count = 0
    for i in range(n):
        if mask[i]:
            s = count * _STOI_HOP
            x_out[s : s + _STOI_FRAME] += x[idx[i]] * win
            y_out[s : s + _STOI_FRAME] += y[idx[i]] * win
            count += 1
    length = count * _STOI_HOP + _STOI_FRAME - _STOI_HOP if count else 0
    return x_out[:length], y_out[:length]


def stoi(reference: np.ndarray, estimate: np.ndarray, sample_rate: int) -> float:
    """Short-Time Objective Intelligibility (Taal et al. 2011), in [0, 1]."""
    reference = np.asarray(reference, np.float64)
    estimate = np.asarray(estimate, np.float64)
    n = min(len(reference), len(estimate))
    reference, estimate = reference[:n], estimate[:n]
    if sample_rate != _STOI_SR:
        g = np.gcd(sample_rate, _STOI_SR)
        reference = resample_poly(reference, _STOI_SR // g, sample_rate // g)
        estimate = resample_poly(estimate, _STOI_SR // g, sample_rate // g)

    reference, estimate = _remove_silent_frames(reference, estimate)
    if len(reference) < _STOI_FRAME + _STOI_HOP * (_STOI_SEG - 1):
        raise ValueError("signal too short for STOI after silence removal")

    obm = _thirdoct_bands()
    x_spec = np.abs(_stft_frames(reference))
    y_spec = np.abs(_stft_frames(estimate))
    # (num_bands, num_frames) band magnitudes
    x_b = np.sqrt(obm @ (x_spec.T**2))
    y_b = np.sqrt(obm @ (y_spec.T**2))

    num_frames = x_b.shape[1]
    clip = 10.0 ** (-_STOI_BETA / 20.0)
    scores = []
    for m in range(_STOI_SEG, num_frames + 1):
        x_seg = x_b[:, m - _STOI_SEG : m]
        y_seg = y_b[:, m - _STOI_SEG : m]
        alpha = np.sqrt(
            np.sum(x_seg**2, axis=1, keepdims=True)
            / (np.sum(y_seg**2, axis=1, keepdims=True) + 1e-12)
        )
        y_prime = np.minimum(alpha * y_seg, x_seg * (1 + clip))
        xm = x_seg - x_seg.mean(axis=1, keepdims=True)
        ym = y_prime - y_prime.mean(axis=1, keepdims=True)
        denom = np.linalg.norm(xm, axis=1) * np.linalg.norm(ym, axis=1) + 1e-12
        scores.append(np.sum(xm * ym, axis=1) / denom)
    return float(np.mean(scores))


# ---------------------------------------------------------------- PESQ ----


def pesq_score(
    reference: np.ndarray, estimate: np.ndarray, sample_rate: int, mode: str = "wb"
):
    """PESQ via the optional `pesq` wheel; resamples to 16 kHz as ITU P.862
    requires (fixes reference D20). Raises ImportError when unavailable."""
    from pesq import pesq as _pesq  # optional dependency

    target_sr = 16000
    if sample_rate != target_sr:
        g = np.gcd(sample_rate, target_sr)
        reference = resample_poly(reference, target_sr // g, sample_rate // g)
        estimate = resample_poly(estimate, target_sr // g, sample_rate // g)
    return float(_pesq(target_sr, reference, estimate, mode))
