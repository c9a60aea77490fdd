"""Export tests: int8 pack size/parity, StableHLO round-trip, TFLite
conversion + numerical match (SURVEY.md §2.2 export parity layer)."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinyrecurrentunet_tpu.config import Config, FeaturizerConfig
from tinyrecurrentunet_tpu.export.quantize import (
    dequantize_params,
    load_quantized,
    quantize_params,
    restore_batch_stats,
    save_quantized,
)
from tinyrecurrentunet_tpu.models import TRUNet
from tinyrecurrentunet_tpu.signal import Featurizer


@pytest.fixture(scope="module")
def setup():
    cfg = dataclasses.replace(
        Config(),
        featurizer=FeaturizerConfig(sample_rate=16000),
        onnx_config=dataclasses.replace(Config().onnx_config, time_step=16),
    )
    model = TRUNet(cfg.network)
    fz = Featurizer(cfg.featurizer)
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), fz(jnp.asarray(audio))[:2])
    return cfg, model, variables


class TestQuantize:
    def test_roundtrip_parity(self, setup):
        cfg, model, variables = setup
        q = quantize_params(variables["params"])
        deq = dequantize_params(q, variables["params"])
        for a, b in zip(jax.tree.leaves(deq), jax.tree.leaves(variables["params"])):
            a, b = np.asarray(a), np.asarray(b)
            # int8 symmetric: error bounded by scale/2 = max|w|/254
            assert np.abs(a - b).max() <= np.abs(b).max() / 127.0 + 1e-9

    def test_pack_size_hits_target(self, setup, tmp_path):
        """381,472 params as int8 + scales must land near the reference's
        362 KB claim (reference README.md:6)."""
        cfg, model, variables = setup
        path = str(tmp_path / "model.trq")
        size = save_quantized(path, variables["params"], variables["batch_stats"])
        assert size < 450 * 1024, f"pack is {size/1024:.0f} KB"

    def test_load_and_run(self, setup, tmp_path):
        cfg, model, variables = setup
        path = str(tmp_path / "model.trq")
        save_quantized(path, variables["params"], variables["batch_stats"])
        q, stats = load_quantized(path)
        params = dequantize_params(q, variables["params"])
        bstats = restore_batch_stats(stats, variables["batch_stats"])
        x = jnp.asarray(np.random.default_rng(1).standard_normal((4, 257, 4)), jnp.float32)
        y_q, _ = model.apply({"params": params, "batch_stats": bstats}, x)
        y_f, _ = model.apply(variables, x)
        # int8 weights shift outputs but must stay close in scale
        rel = float(jnp.abs(y_q - y_f).max() / (jnp.abs(y_f).max() + 1e-9))
        assert rel < 0.1, rel


class TestRTBench:
    def test_engines_run_and_report(self, setup):
        from tinyrecurrentunet_tpu.export.rt_bench import run_bench

        cfg, model, variables = setup
        results = run_bench(cfg, variables)
        for key in (
            "jit_full_clip_rtf",
            "jit_streaming_rtf",
            "int8_full_clip_rtf",
            "clip_seconds",
        ):
            assert key in results and np.isfinite(results[key]), key
        assert results["frames"] == 16


class TestDenoiserBuckets:
    def test_bucket_ladder(self):
        from tinyrecurrentunet_tpu.infer.denoise import Denoiser

        hop = 128
        assert Denoiser._bucket(100, hop) == 8 * hop
        for length in (5000, 16000, 16001, 100000):
            b = Denoiser._bucket(length, hop)
            assert b >= length and b % hop == 0
        # geometric ladder: bounded bucket count over a wide length range
        buckets = {Denoiser._bucket(n, hop) for n in range(1000, 200000, 777)}
        assert len(buckets) < 50  # 1/8-step ladder: ~12.5% growth per bucket


class TestStableHLO:
    def test_forward_and_step_roundtrip(self, setup, tmp_path):
        from tinyrecurrentunet_tpu.export.export import export_stablehlo, load_stablehlo

        cfg, model, variables = setup
        paths = export_stablehlo(cfg, variables, str(tmp_path))
        rng = np.random.default_rng(0)
        feats = rng.standard_normal((16, 257, 4)).astype(np.float32)
        fwd = load_stablehlo(paths["forward"])
        got = np.asarray(fwd(jnp.asarray(feats)))
        ref, _ = model.apply(variables, jnp.asarray(feats))
        np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-5, atol=1e-6)

        step = load_stablehlo(paths["streaming_step"])
        h0 = model.init_tgru_state(1, 257)
        y, h = step(jnp.asarray(feats[:1]), h0)
        ref_y, ref_h = model.apply(variables, jnp.asarray(feats[:1]), h0)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref_y), rtol=1e-5, atol=1e-6)


class TestTFLite:
    def test_float_parity(self, setup, tmp_path):
        tf = pytest.importorskip("tensorflow")
        del tf
        from tinyrecurrentunet_tpu.export.export import export_tflite, parity_report

        cfg, model, variables = setup
        path = export_tflite(cfg, variables, str(tmp_path))
        rng = np.random.default_rng(0)
        feats = rng.standard_normal((16, 257, 4)).astype(np.float32) * 0.3
        report = parity_report(cfg, variables, path, feats)
        assert report["max_rel_err"] < 1e-4, report

    def test_streaming_step_export(self, setup, tmp_path):
        """Per-frame step export: the edge artifact; small and state-true."""
        tf = pytest.importorskip("tensorflow")
        from tinyrecurrentunet_tpu.export.export import export_tflite_streaming

        cfg, model, variables = setup
        path = export_tflite_streaming(cfg, variables, str(tmp_path), int8=True)
        assert os.path.getsize(path) < 600 * 1024  # ~460 KB measured

        interp = tf.lite.Interpreter(model_path=path)
        interp.allocate_tensors()
        rng = np.random.default_rng(0)
        frame = rng.standard_normal((1, 257, 4)).astype(np.float32) * 0.3
        h = np.zeros((1, 16, 128), np.float32)
        for d in interp.get_input_details():
            interp.set_tensor(d["index"], frame if d["shape"][-1] == 4 else h)
        interp.invoke()
        outs = [
            interp.get_tensor(d["index"]) for d in interp.get_output_details()
        ]
        y = [o for o in outs if o.shape[-1] == 8][0]
        h_new = [o for o in outs if o.shape[-1] == 128][0]
        ref_y, ref_h = model.apply(variables, jnp.asarray(frame), jnp.asarray(h))
        rel = np.abs(y - np.asarray(ref_y)).max() / (np.abs(np.asarray(ref_y)).max() + 1e-9)
        assert rel < 0.05, rel
        assert np.any(h_new != 0)

    def test_int8_runs(self, setup, tmp_path):
        tf = pytest.importorskip("tensorflow")
        del tf
        from tinyrecurrentunet_tpu.export.export import export_tflite, parity_report

        cfg, model, variables = setup
        rng = np.random.default_rng(0)
        feats = rng.standard_normal((16, 257, 4)).astype(np.float32) * 0.3
        path = export_tflite(cfg, variables, str(tmp_path), int8=True)
        report = parity_report(cfg, variables, path, feats)
        assert report["max_rel_err"] < 0.1, report  # int8 weights are coarse
        assert os.path.getsize(path) < 1024 * 1024
