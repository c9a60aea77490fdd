"""First-party perceptual speech-quality measures: fwSegSNR, LLR, WSS.

BASELINE.md's quality axis names PESQ (reference `eval.py:32-34`), but the
`pesq` wheel is absent in this environment (VERDICT r2 missing #2). These
are the three classic intrusive objective measures from the speech
enhancement literature (Hu & Loizou, "Evaluation of Objective Quality
Measures for Speech Enhancement", IEEE TASLP 2008) that are implementable
first-party and correlate strongly with subjective MOS on enhancement
tasks:

- **fwSegSNR** — frequency-weighted segmental SNR over 25 Gaussian
  critical-band filters, band-weighted by the clean spectrum^0.2 and
  clipped to [-10, 35] dB per frame. Higher is better. (Correlation with
  overall quality ~0.84 in Hu & Loizou's study — the best of the
  non-PESQ measures.)
- **LLR** — log-likelihood ratio between LPC models of clean and
  processed frames (Itakura distance family). Lower is better.
- **WSS** — Klatt's weighted spectral slope distance, emphasizing
  formant-peak locations. Lower is better.

All three follow the frame/band protocol of Loizou's reference MATLAB
implementations (30 ms Hann frames, 75% overlap, 25 critical bands,
best-95%-of-frames averaging for LLR/WSS); they are re-derived from the
published descriptions, not ports. When the `pesq` wheel IS present,
`infer.metrics.pesq_score` remains the preferred perceptual number and
these run alongside it.
"""

from __future__ import annotations

import numpy as np
from scipy.signal import resample_poly

# 25 critical-band center frequencies / bandwidths (Hz) — the standard
# table used by the Hu & Loizou measures (Bark-scale critical bands).
_CENT = np.array(
    [
        50.0, 120.0, 190.0, 260.0, 330.0, 400.0, 470.0, 540.0,
        617.372, 703.378, 798.717, 904.128, 1020.38, 1148.30,
        1288.72, 1442.54, 1610.70, 1794.16, 1993.93, 2211.08,
        2446.71, 2701.97, 2978.04, 3276.17, 3597.63,
    ]
)
_BW = np.array(
    [
        70.0, 70.0, 70.0, 70.0, 70.0, 70.0, 70.0, 77.3724,
        86.0056, 95.3398, 105.411, 116.256, 127.914, 140.423,
        153.823, 168.154, 183.457, 199.776, 217.153, 235.631,
        255.255, 276.072, 298.126, 321.465, 346.136,
    ]
)

_METRIC_SR = 16000  # all measures run at 16 kHz (bands end < 4 kHz)
_FRAME_SEC = 0.030
_HOP_DIV = 4  # 75% overlap


def _to_metric_rate(x: np.ndarray, sr: int) -> np.ndarray:
    x = np.asarray(x, np.float64)
    if sr == _METRIC_SR:
        return x
    g = np.gcd(int(sr), _METRIC_SR)
    return resample_poly(x, _METRIC_SR // g, sr // g)


def _frames(x: np.ndarray, frame: int, hop: int) -> np.ndarray:
    n = 1 + (len(x) - frame) // hop
    if n < 1:
        raise ValueError("signal too short for perceptual metrics")
    idx = np.arange(n)[:, None] * hop + np.arange(frame)[None, :]
    return x[idx]


def _critical_band_filters(frame: int, sr: int) -> np.ndarray:
    """(25, frame//2+1) Gaussian critical-band filterbank, unit peak."""
    f = np.fft.rfftfreq(frame, 1.0 / sr)
    # Gaussian response ~ -48 dB at the nominal band edge (|f-cf| = bw/2):
    # exp(-11.13 * (2(f-cf)/bw)^2) = 10^(-48.3/10) at the edge.
    z = (f[None, :] - _CENT[:, None]) / (_BW[:, None] / 2.0)
    return np.exp(-11.13 * 0.25 * z**2)


def _band_spectra(x: np.ndarray, frame: int, hop: int, sr: int) -> np.ndarray:
    """(num_frames, 25) critical-band magnitude spectra of Hann frames."""
    win = np.hanning(frame)
    spec = np.abs(np.fft.rfft(_frames(x, frame, hop) * win, axis=-1))
    filters = _critical_band_filters(frame, sr)
    return spec**2 @ filters.T  # band power


def fwsegsnr(
    reference: np.ndarray,
    estimate: np.ndarray,
    sample_rate: int,
    gamma: float = 0.2,
) -> float:
    """Frequency-weighted segmental SNR (dB); higher is better.

    Per-frame, per-critical-band SNR between clean and processed band
    powers, weighted by the clean band magnitude^gamma, clipped to
    [-10, 35] dB before averaging (Hu & Loizou 2008, eq. 4).
    """
    ref = _to_metric_rate(reference, sample_rate)
    est = _to_metric_rate(estimate, sample_rate)
    n = min(len(ref), len(est))
    ref, est = ref[:n], est[:n]
    frame = int(_FRAME_SEC * _METRIC_SR)
    hop = frame // _HOP_DIV
    xb = _band_spectra(ref, frame, hop, _METRIC_SR)
    yb = _band_spectra(est, frame, hop, _METRIC_SR)
    xm = np.sqrt(xb)  # band magnitude
    ym = np.sqrt(yb)
    w = xm**gamma
    snr_band = 10.0 * np.log10(xm**2 / ((xm - ym) ** 2 + 1e-12) + 1e-12)
    snr_band = np.clip(snr_band, -10.0, 35.0)
    per_frame = np.sum(w * snr_band, axis=1) / (np.sum(w, axis=1) + 1e-12)
    return float(np.mean(per_frame))


def _levinson(r: np.ndarray, order: int) -> np.ndarray:
    """Levinson-Durbin: autocorrelation -> LPC coefficients [1, a1..ap]."""
    a = np.zeros(order + 1)
    a[0] = 1.0
    err = r[0]
    if err <= 0:
        return a
    for i in range(1, order + 1):
        acc = r[i] + np.dot(a[1:i], r[1:i][::-1])
        k = -acc / err
        a[1 : i + 1] += k * a[:i][::-1]
        err *= 1.0 - k * k
        if err <= 0:
            break
    return a


def llr(
    reference: np.ndarray,
    estimate: np.ndarray,
    sample_rate: int,
    order: int = 16,
) -> float:
    """Log-likelihood ratio (Itakura distance); lower is better.

    Per frame: llr = ln(a_p R_c a_p^T / a_c R_c a_c^T) where a are LPC
    coefficient vectors and R_c is the clean frame's autocorrelation
    (Toeplitz) matrix; frames averaged over the best 95% (Hu & Loizou's
    protocol). LPC order 16 at 16 kHz.
    """
    ref = _to_metric_rate(reference, sample_rate)
    est = _to_metric_rate(estimate, sample_rate)
    n = min(len(ref), len(est))
    ref, est = ref[:n], est[:n]
    frame = int(_FRAME_SEC * _METRIC_SR)
    hop = frame // _HOP_DIV
    win = np.hanning(frame)
    xf = _frames(ref, frame, hop) * win
    yf = _frames(est, frame, hop) * win

    scores = []
    for x, y in zip(xf, yf):
        rx = np.correlate(x, x, "full")[frame - 1 : frame + order]
        ry = np.correlate(y, y, "full")[frame - 1 : frame + order]
        if rx[0] < 1e-10 or ry[0] < 1e-10:  # silent frame
            continue
        ax = _levinson(rx, order)
        ay = _levinson(ry, order)
        # quadratic forms via the autocorrelation identity:
        # a R a^T = sum_k a_k a_j r_|k-j|
        lags = np.abs(np.subtract.outer(np.arange(order + 1), np.arange(order + 1)))
        rmat = rx[lags]
        num = ay @ rmat @ ay
        den = ax @ rmat @ ax
        if num <= 0 or den <= 0:
            continue
        scores.append(np.log(num / den))
    if not scores:
        return 0.0
    scores = np.sort(np.asarray(scores))
    keep = max(int(len(scores) * 0.95), 1)
    return float(np.mean(scores[:keep]))


def wss(reference: np.ndarray, estimate: np.ndarray, sample_rate: int) -> float:
    """Weighted spectral slope distance (Klatt 1982); lower is better.

    Critical-band log-spectra -> adjacent-band slopes; slope differences
    weighted by proximity to the global and nearest local spectral peaks,
    averaged over the best 95% of frames.
    """
    ref = _to_metric_rate(reference, sample_rate)
    est = _to_metric_rate(estimate, sample_rate)
    n = min(len(ref), len(est))
    ref, est = ref[:n], est[:n]
    frame = int(_FRAME_SEC * _METRIC_SR)
    hop = frame // _HOP_DIV
    xdb = 10.0 * np.log10(_band_spectra(ref, frame, hop, _METRIC_SR) + 1e-10)
    ydb = 10.0 * np.log10(_band_spectra(est, frame, hop, _METRIC_SR) + 1e-10)

    kmax, klocmax = 20.0, 1.0
    scores = []
    for cx, cy in zip(xdb, ydb):
        sx = np.diff(cx)
        sy = np.diff(cy)
        # nearest upward/downward peak per band (Klatt's local weighting)
        def loc_peak(c, s):
            peaks = np.zeros(len(s))
            for k in range(len(s)):
                j = k
                if s[k] > 0:  # rising: search up for the local max
                    while j < len(s) and s[j] > 0:
                        j += 1
                    peaks[k] = c[j]
                else:  # falling: search down
                    while j >= 0 and s[j] <= 0:
                        j -= 1
                    peaks[k] = c[j + 1]
            return peaks

        px = loc_peak(cx, sx)
        py = loc_peak(cy, sy)
        wx = (kmax / (kmax + cx.max() - cx[:-1])) * (
            klocmax / (klocmax + px - cx[:-1])
        )
        wy = (kmax / (kmax + cy.max() - cy[:-1])) * (
            klocmax / (klocmax + py - cy[:-1])
        )
        w = (wx + wy) / 2.0
        scores.append(float(np.sum(w * (sx - sy) ** 2) / np.sum(w)))
    scores = np.sort(np.asarray(scores))
    keep = max(int(len(scores) * 0.95), 1)
    return float(np.mean(scores[:keep]))


def perceptual_scores(
    reference: np.ndarray, estimate: np.ndarray, sample_rate: int
) -> dict:
    """All three measures in one pass-friendly dict."""
    return {
        "fwsegsnr": fwsegsnr(reference, estimate, sample_rate),
        "llr": llr(reference, estimate, sample_rate),
        "wss": wss(reference, estimate, sample_rate),
    }
