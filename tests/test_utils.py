"""Utility tests: metrics writer, step timer, param accounting."""

import json
import os

import numpy as np


class TestMetricsWriter:
    def test_jsonl_stream(self, tmp_path):
        from tinyrecurrentunet_tpu.utils.metrics import MetricsWriter

        w = MetricsWriter(str(tmp_path), use_tensorboard=False)
        w.scalars(5, {"Train/Train-Loss": 1.5, "Train/learning-rate": 1e-4})
        w.scalars(10, {"Train/Train-Loss": 1.2})
        w.close()
        lines = [
            json.loads(line)
            for line in open(tmp_path / "metrics.jsonl")
        ]
        assert lines[0]["step"] == 5 and lines[0]["Train/Train-Loss"] == 1.5
        assert lines[1]["step"] == 10

    def test_tensorboard_events_written(self, tmp_path):
        from tinyrecurrentunet_tpu.utils.metrics import MetricsWriter

        w = MetricsWriter(str(tmp_path), use_tensorboard=True)
        w.scalars(1, {"x": 1.0})
        w.close()
        tb_dir = tmp_path / "tensorboard"
        if tb_dir.exists():  # torch present in this image
            assert any(f.startswith("events") for f in os.listdir(tb_dir))


class TestStepTimer:
    def test_stats(self):
        import time

        from tinyrecurrentunet_tpu.utils.profiling import StepTimer

        t = StepTimer()
        for _ in range(5):
            with t.measure():
                time.sleep(0.001)
        s = t.stats()
        assert s["steps"] == 5
        assert s["p50_ms"] >= 1.0
        assert s["max_ms"] >= s["p50_ms"]


class TestParams:
    def test_count_and_print(self, capsys):
        import jax.numpy as jnp

        from tinyrecurrentunet_tpu.utils.params import count_params, print_size

        params = {"a": {"kernel": jnp.zeros((3, 4)), "bias": jnp.zeros(4)}}
        assert count_params(params) == 16
        n = print_size(params, "Tiny", keyword="kernel")
        out = capsys.readouterr().out
        assert n == 16 and "Tiny Parameters" in out and "kernel Parameters" in out

    def test_rescale_flatten(self):
        import jax.numpy as jnp

        from tinyrecurrentunet_tpu.utils.params import flatten, rescale

        r = np.asarray(rescale(jnp.asarray([1.0, 3.0, 5.0])))
        np.testing.assert_allclose(r, [0, 0.5, 1.0])
        assert flatten([[1, 2], [3]]) == [1, 2, 3]
