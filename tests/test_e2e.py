"""End-to-end integration over a real DNS-style file tree: dataset modes,
directory denoising, evaluation (the reference's denoise.py -> eval.py
pipeline, SURVEY.md §3.4)."""

import dataclasses
import json
import os

import numpy as np
import pytest

from tinyrecurrentunet_tpu.config import Config, load_config
from tinyrecurrentunet_tpu.data import CleanNoisyPairDataset
from tinyrecurrentunet_tpu.data.audio_io import write_wav


@pytest.fixture(scope="module")
def dns_tree(tmp_path_factory):
    """A miniature DNS-2020 layout: training clean/ + noise/, test_set
    no_reverb clean/noisy pairs."""
    root = tmp_path_factory.mktemp("dns")
    rng = np.random.default_rng(0)
    sr = 16000

    os.makedirs(root / "clean")
    os.makedirs(root / "noise")
    for i in range(4):
        t = np.arange(int(1.0 * sr)) / sr
        clean = (0.2 * np.sin(2 * np.pi * (150 + 40 * i) * t)).astype(np.float32)
        write_wav(str(root / "clean" / f"fileid_{i}.wav"), clean, sr)
    for i in range(2):
        noise = (0.05 * rng.standard_normal(sr)).astype(np.float32)
        write_wav(str(root / "noise" / f"noise_{i}.wav"), noise, sr)

    test = root / "datasets/test_set/synthetic/no_reverb"
    os.makedirs(test / "clean")
    os.makedirs(test / "noisy")
    for i in range(3):
        t = np.arange(sr) / sr
        clean = (0.2 * np.sin(2 * np.pi * (200 + 50 * i) * t)).astype(np.float32)
        noisy = clean + (0.05 * rng.standard_normal(sr)).astype(np.float32)
        write_wav(str(test / "clean" / f"clean_fileid_{i}.wav"), clean, sr)
        write_wav(str(test / "noisy" / f"noisy_snr5_fileid_{i}.wav"), noisy, sr)
    return str(root)


def _config(dns_root, tmp_path) -> Config:
    cfg = load_config("config/tiny16k.json")
    return dataclasses.replace(
        cfg,
        trainset=dataclasses.replace(
            cfg.trainset, root=dns_root, crop_length_sec=0.5
        ),
        gen=dataclasses.replace(cfg.gen, output_directory=str(tmp_path / "exp")),
        train=dataclasses.replace(
            cfg.train,
            log=dataclasses.replace(cfg.train.log, directory=str(tmp_path / "ckpt")),
        ),
    )


class TestDatasets:
    def test_training_mix_mode(self, dns_tree):
        cfg = _config(dns_tree, __import__("pathlib").Path("/tmp"))
        ds = CleanNoisyPairDataset(cfg.trainset, subset="training")
        assert len(ds) == 4
        rng = np.random.default_rng(0)
        clean, noisy, fileid = ds.get(0, rng)
        assert clean.shape == noisy.shape == (8000,)
        assert fileid == "fileid_0.wav"
        # the mix actually added noise
        assert not np.allclose(clean, noisy)

    def test_testing_pairs_sorted(self, dns_tree):
        cfg = _config(dns_tree, __import__("pathlib").Path("/tmp"))
        ds = CleanNoisyPairDataset(cfg.trainset, subset="testing")
        assert len(ds) == 3
        rng = np.random.default_rng(0)
        clean, noisy, fileid = ds.get(1, rng)
        assert len(clean) == len(noisy) == 16000
        assert fileid.endswith("fileid_1.wav")


class TestDenoiseEvalPipeline:
    def test_train_denoise_eval(self, dns_tree, tmp_path):
        """The full reference workflow: (short) train -> checkpoint ->
        denoise the test set -> evaluate (reference README.md usage)."""
        from tinyrecurrentunet_tpu.infer.denoise import denoise_directory
        from tinyrecurrentunet_tpu.infer.evaluate import evaluate_dns
        from tinyrecurrentunet_tpu.train.loop import train

        cfg = _config(dns_tree, tmp_path)
        cfg = dataclasses.replace(
            cfg,
            train=dataclasses.replace(
                cfg.train,
                log=dataclasses.replace(
                    cfg.train.log,
                    directory=str(tmp_path / "ckpt"),
                    iters_per_ckpt=2,
                    iters_per_valid=1,
                ),
                loss_config=dataclasses.replace(
                    cfg.train.loss_config,
                    stft_config=dataclasses.replace(
                        cfg.train.loss_config.stft_config,
                        fft_sizes=(512,), hop_sizes=(120,), win_lengths=(240,),
                    ),
                ),
            ),
        )
        train(cfg, max_iters=2, log_dir=str(tmp_path / "logs"))

        results = denoise_directory(cfg, ckpt_iter="max", dump=True)
        assert len(results) == 3
        step_dirs = os.listdir(
            os.path.join(cfg.gen.output_directory, cfg.train.exp_path, "speech")
        )
        assert len(step_dirs) == 1
        enhanced_dir = os.path.join(
            cfg.gen.output_directory, cfg.train.exp_path, "speech", step_dirs[0]
        )
        assert len(os.listdir(enhanced_dir)) == 3

        metrics = evaluate_dns(dns_tree, enhanced_dir, sample_rate=16000)
        assert metrics["num_files"] == 3
        assert np.isfinite(metrics["si_sdr"]) and 0 < metrics["stoi"] <= 1

        baseline = evaluate_dns(dns_tree, None, target="noisy", sample_rate=16000)
        assert np.isfinite(baseline["si_sdr"])
