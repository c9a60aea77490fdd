"""Perceptual measures (infer/perceptual.py): fwSegSNR, LLR, WSS.

These carry the perceptual-quality axis that BASELINE.md assigns to PESQ
(reference `eval.py:32-34`) in environments without the pesq wheel
(VERDICT r2 missing #2). The tests pin the properties the quality
artifacts rely on: ideal scores at identity, monotonicity in degradation
level, sample-rate invariance, and presence in evaluate_dns output.
"""

import numpy as np
import pytest

from tinyrecurrentunet_tpu.data.procgen import mix_at_snr, synth_noise, synth_speech
from tinyrecurrentunet_tpu.infer.perceptual import (
    fwsegsnr,
    llr,
    perceptual_scores,
    wss,
)

SR = 16000


@pytest.fixture(scope="module")
def speech():
    return synth_speech(np.random.default_rng(0), 3 * SR, SR)


@pytest.fixture(scope="module")
def noise():
    return synth_noise(np.random.default_rng(1), 3 * SR, SR, "pink")


class TestIdentity:
    def test_identity_is_ideal(self, speech):
        assert fwsegsnr(speech, speech, SR) > 25.0  # near the 35 dB clip
        assert llr(speech, speech, SR) == pytest.approx(0.0, abs=1e-9)
        assert wss(speech, speech, SR) == pytest.approx(0.0, abs=1e-9)


class TestMonotonicity:
    def test_monotone_in_snr(self, speech, noise):
        """More noise must score strictly worse on every measure."""
        prev = None
        for snr in (20.0, 10.0, 0.0):
            noisy = mix_at_snr(speech, noise, snr)
            cur = (
                fwsegsnr(speech, noisy, SR),
                llr(speech, noisy, SR),
                wss(speech, noisy, SR),
            )
            if prev is not None:
                assert cur[0] < prev[0]  # fwSegSNR: higher is better
                assert cur[1] > prev[1]  # LLR: lower is better
                assert cur[2] > prev[2]  # WSS: lower is better
            prev = cur

    def test_reverb_is_degradation(self, speech):
        """The dereverberation axis: a wet signal scores worse than dry."""
        from tinyrecurrentunet_tpu.data.procgen import reverberate, synth_rir

        rir = synth_rir(np.random.default_rng(2), SR, rt60=0.6, drr_db=0.0)
        wet = reverberate(speech, rir)
        assert fwsegsnr(speech, wet, SR) < 15.0
        assert llr(speech, wet, SR) > 0.1
        assert wss(speech, wet, SR) > 5.0


class TestProtocol:
    def test_sample_rate_invariance(self, speech, noise):
        """48 kHz inputs resample internally to the 16 kHz metric rate."""
        from scipy.signal import resample_poly

        noisy = mix_at_snr(speech, noise, 10.0)
        a = perceptual_scores(speech, noisy, SR)
        b = perceptual_scores(
            resample_poly(speech, 3, 1), resample_poly(noisy, 3, 1), 3 * SR
        )
        for k in a:
            assert a[k] == pytest.approx(b[k], rel=0.05, abs=0.5)

    def test_length_mismatch_truncates(self, speech, noise):
        noisy = mix_at_snr(speech, noise, 10.0)
        a = fwsegsnr(speech, noisy[: len(noisy) - 777], SR)
        assert np.isfinite(a)

    def test_in_evaluate_dns(self, tmp_path):
        """evaluate_dns reports the three measures for a materialized
        testset (noisy baseline path, no model needed)."""
        from tinyrecurrentunet_tpu.data.procgen import materialize_dns_testset
        from tinyrecurrentunet_tpu.infer.evaluate import evaluate_dns

        root = materialize_dns_testset(
            str(tmp_path / "ts"), num_files=2, length_sec=1.0, sample_rate=SR
        )
        result = evaluate_dns(root, target="noisy", sample_rate=SR)
        for key in ("fwsegsnr", "llr", "wss"):
            assert key in result and np.isfinite(result[key])


class TestPesqEstimator:
    """First-party PESQ-family estimator (infer/pesq_est.py).

    The estimator is NOT ITU-conformant (no reference implementation or
    conformance vectors exist in this environment — see the module's
    honesty contract); these tests pin the properties that make its
    *relative* readings trustworthy: perfect-signal ceiling, strict
    monotonicity in SNR, gain invariance (level alignment), bulk-delay
    robustness (time alignment), bounded range, and presence in
    evaluate_dns output as `pesq_wb_est`.
    """

    def test_identity_ceiling(self, speech):
        from tinyrecurrentunet_tpu.infer.pesq_est import pesq_estimate

        assert pesq_estimate(speech, speech, SR) == pytest.approx(4.64, abs=0.02)

    def test_monotone_in_snr(self, speech, noise):
        from tinyrecurrentunet_tpu.infer.pesq_est import pesq_estimate

        scores = [
            pesq_estimate(speech, mix_at_snr(speech, noise, snr), SR)
            for snr in (0.0, 10.0, 20.0, 30.0)
        ]
        assert all(b > a + 0.1 for a, b in zip(scores, scores[1:])), scores
        # the familiar PESQ range, and heavy noise scores low
        assert all(1.0 <= s <= 4.65 for s in scores)
        assert scores[0] < 2.0

    def test_gain_invariance(self, speech, noise):
        from tinyrecurrentunet_tpu.infer.pesq_est import pesq_estimate

        noisy = mix_at_snr(speech, noise, 15.0)
        base = pesq_estimate(speech, noisy, SR)
        assert pesq_estimate(speech, 0.25 * noisy, SR) == pytest.approx(
            base, abs=0.05
        )
        assert pesq_estimate(speech, 3.0 * noisy, SR) == pytest.approx(
            base, abs=0.05
        )

    def test_delay_robustness(self, speech, noise):
        from tinyrecurrentunet_tpu.infer.pesq_est import pesq_estimate

        noisy = mix_at_snr(speech, noise, 15.0)
        base = pesq_estimate(speech, noisy, SR)
        delayed = np.concatenate([np.zeros(480), noisy])[: len(noisy)]
        assert pesq_estimate(speech, delayed, SR) == pytest.approx(
            base, abs=0.1
        )

    def test_rank_agrees_with_fwsegsnr(self, speech, noise):
        """On an enhancement-shaped pair (less noisy vs more noisy), the
        estimator must rank the same way as fwSegSNR — the relative
        reading QUALITY.json relies on."""
        from tinyrecurrentunet_tpu.infer.pesq_est import pesq_estimate

        worse = mix_at_snr(speech, noise, 5.0)
        better = mix_at_snr(speech, noise, 18.0)
        assert pesq_estimate(speech, better, SR) > pesq_estimate(
            speech, worse, SR
        )
        assert fwsegsnr(speech, better, SR) > fwsegsnr(speech, worse, SR)

    def test_sample_rate_resamples(self, speech, noise):
        """48 kHz inputs are resampled to the 16 kHz WB regime; scores at
        both rates agree for band-limited content."""
        from scipy.signal import resample_poly

        from tinyrecurrentunet_tpu.infer.pesq_est import pesq_estimate

        noisy = mix_at_snr(speech, noise, 12.0)
        s16 = pesq_estimate(speech, noisy, SR)
        up_c = resample_poly(speech, 3, 1)
        up_n = resample_poly(noisy, 3, 1)
        assert pesq_estimate(up_c, up_n, 48000) == pytest.approx(s16, abs=0.15)

    def test_nb_mode_raises(self, speech):
        from tinyrecurrentunet_tpu.infer.pesq_est import pesq_estimate

        with pytest.raises(ValueError):
            pesq_estimate(speech, speech, SR, mode="nb")

    def test_in_evaluate_dns(self, tmp_path):
        from tinyrecurrentunet_tpu.data.procgen import materialize_dns_testset
        from tinyrecurrentunet_tpu.infer.evaluate import evaluate_dns

        root = materialize_dns_testset(
            str(tmp_path / "ts"), num_files=2, length_sec=1.0, sample_rate=SR
        )
        result = evaluate_dns(root, target="noisy", sample_rate=SR)
        assert "pesq_wb_est" in result
        assert 1.0 <= result["pesq_wb_est"] <= 4.65
