"""Config schema tests: reference tiny.json compatibility, aliases,
validation (fixes D5/D11 verified at the schema level)."""

import dataclasses
import json
import os

import pytest

from tinyrecurrentunet_tpu.config import (
    Config,
    NetworkConfig,
    config_from_dict,
    load_config,
)

REFERENCE_TINY = "/root/reference/config/tiny.json"


class TestReferenceCompat:
    @pytest.mark.skipif(not os.path.exists(REFERENCE_TINY), reason="no reference")
    def test_loads_reference_tiny_json(self):
        cfg = load_config(REFERENCE_TINY)
        # 3-channel variant selected by input_size: 3 (SURVEY.md §0.2)
        assert cfg.network.input_size == 3
        assert cfg.network.output_size == 6
        assert cfg.featurizer.channels == ("logmag", "real_demod", "imag_demod")
        assert cfg.featurizer.sample_rate == 48000
        assert cfg.train.optimization.n_iters == 25_000_000
        assert cfg.train.optimization.learning_rate == 4e-4
        assert cfg.train.optimization.batch_size_per_device == 1
        assert cfg.train.loss_config.stft_config.fft_sizes == (512, 1024, 2048)
        assert cfg.train.log.iters_per_ckpt == 5000
        assert cfg.onnx_config.time_step == 751

    def test_alias_sections(self):
        cfg = config_from_dict(
            {
                "network_config": {"input_size": 4},
                "gen_config": {"output_directory": "/tmp/x"},
            }
        )
        assert cfg.network.input_size == 4
        assert cfg.gen.output_directory == "/tmp/x"

    def test_framework_configs_load(self):
        # Every shipped config must load and validate (incl. the flagship
        # proc16k/proc48k and the 4.4M-param large16k Pallas-GRU shape).
        import glob

        paths = sorted(glob.glob("config/*.json"))
        assert len(paths) >= 6
        for path in paths:
            cfg = load_config(path)
            assert cfg.network.input_size == cfg.featurizer.num_channels


class TestValidation:
    def test_output_must_be_twice_input(self):
        with pytest.raises(ValueError):
            NetworkConfig(input_size=4, output_size=6)

    def test_channel_mismatch_rejected(self):
        with pytest.raises(ValueError):
            config_from_dict(
                {
                    "network": {"input_size": 4, "output_size": 8},
                    "featurizer": {
                        "channels": ["logmag", "real_demod", "imag_demod"]
                    },
                }
            )

    def test_bad_band_rejected(self):
        from tinyrecurrentunet_tpu.config import STFTLossConfig

        with pytest.raises(ValueError):
            STFTLossConfig(band="mid")

    def test_roundtrip_dict(self):
        from tinyrecurrentunet_tpu.config import config_to_dict

        cfg = Config()
        d = config_to_dict(cfg)
        cfg2 = config_from_dict(json.loads(json.dumps(d)))
        assert cfg2 == dataclasses.replace(cfg)
