"""Ideal-mask oracle bounds (infer/oracle.py).

Pins the ordering and sanity of the T-F masking ceilings used to scope
QUALITY.json's per-kind gains (the reverb rows especially — round 4
measured a ~+3.4 dB magnitude-mask oracle there, so small absolute gains
can be large fractions of the attainable)."""

import json
import os

import numpy as np
import pytest

from tinyrecurrentunet_tpu.data.procgen import (
    early_reverb_target,
    mix_at_snr,
    reverberate,
    synth_noise,
    synth_rir,
    synth_speech,
)
from tinyrecurrentunet_tpu.infer.metrics import si_sdr
from tinyrecurrentunet_tpu.infer.oracle import ideal_mask_bounds, oracle_report

SR = 16000


@pytest.fixture
def speech():
    return synth_speech(np.random.default_rng(0), 2 * SR, SR)


class TestIdealMaskBounds:
    def test_ceilings_ordered_on_additive_noise(self, speech):
        noise = synth_noise(np.random.default_rng(1), 2 * SR, SR, "white")
        noisy = mix_at_snr(speech, noise, 5.0)
        b = ideal_mask_bounds(speech, noisy, SR)
        # complex oracle >= magnitude oracle >= baseline, with real headroom
        assert b["cplx_mask"] >= b["mag_mask"] >= b["baseline"]
        assert b["mag_mask_gain"] > 3.0  # additive noise is maskable
        assert b["cplx_mask_gain"] >= b["mag_mask_gain"]
        assert abs(b["baseline"] - si_sdr(noisy, speech)) < 1e-6

    def test_clean_input_near_perfect(self, speech):
        b = ideal_mask_bounds(speech, speech.copy(), SR)
        # nothing to remove: baseline is already huge, oracles can't hurt
        assert b["baseline"] > 40.0
        assert b["mag_mask"] > 30.0

    def test_reverb_headroom_is_limited(self, speech):
        """The round-4 motivating fact: on reverb-vs-early-target items the
        magnitude-mask oracle gains only a few dB (the tail overlaps the
        speech in T-F), so the quality claim must be scoped by this bound."""
        rng = np.random.default_rng(2)
        rir = synth_rir(rng, SR, rt60=0.6)
        wet = reverberate(speech, rir)
        target = early_reverb_target(speech, rir, SR)
        b = ideal_mask_bounds(target, wet, SR)
        assert b["baseline"] > 5.0  # wet is already close to the target
        assert 0.0 < b["mag_mask_gain"] < 12.0
        assert b["cplx_mask_gain"] > b["mag_mask_gain"]


class TestOracleReport:
    def test_report_over_materialized_testset(self, tmp_path):
        from tinyrecurrentunet_tpu.data.procgen import materialize_dns_testset

        root = materialize_dns_testset(
            str(tmp_path / "ts"), num_files=4, length_sec=1.0, sample_rate=SR
        )
        report = oracle_report(root)
        assert "all" in report and report["all"]["n"] == 4
        for row in report.values():
            assert row["cplx_mask_gain_db"] >= row["mag_mask_gain_db"] - 1e-9
            assert np.isfinite(row["baseline_si_sdr"])

    def test_cli_writes_json(self, tmp_path, monkeypatch, capsys):
        from tinyrecurrentunet_tpu.data.procgen import materialize_dns_testset
        from tinyrecurrentunet_tpu.infer import oracle

        root = materialize_dns_testset(
            str(tmp_path / "ts"), num_files=2, length_sec=1.0, sample_rate=SR
        )
        out = str(tmp_path / "ORACLE.json")
        monkeypatch.setattr(
            "sys.argv", ["oracle", "--testset", root, "--out", out]
        )
        oracle.main()
        assert os.path.exists(out)
        with open(out) as f:
            data = json.load(f)
        assert "all" in data
