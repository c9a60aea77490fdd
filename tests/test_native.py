"""Native host runtime tests: build, ring buffer semantics + threading,
WAV IO parity with the Python path, stream host xrun accounting."""

import os
import threading

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("TRUNET_SKIP_NATIVE") == "1", reason="native disabled"
)


@pytest.fixture(scope="module")
def native():
    from tinyrecurrentunet_tpu.runtime import native_available

    if not native_available():
        pytest.skip("native toolchain unavailable")
    from tinyrecurrentunet_tpu.runtime import NativeLib

    return NativeLib()


class TestRingBuffer:
    def test_push_pop_order(self, native):
        from tinyrecurrentunet_tpu.runtime import RingBuffer

        rb = RingBuffer(1024)
        data = np.arange(100, dtype=np.float32)
        assert rb.push(data) == 100
        assert rb.available == 100
        out = rb.pop(100)
        np.testing.assert_array_equal(out, data)
        assert rb.available == 0

    def test_capacity_limit(self, native):
        from tinyrecurrentunet_tpu.runtime import RingBuffer

        rb = RingBuffer(128)
        data = np.ones(200, np.float32)
        assert rb.push(data) == 128
        assert rb.space == 0
        assert rb.pop(300).shape == (128,)

    def test_wraparound(self, native):
        from tinyrecurrentunet_tpu.runtime import RingBuffer

        rb = RingBuffer(100)
        for round_i in range(10):
            data = np.arange(64, dtype=np.float32) + round_i * 64
            assert rb.push(data) == 64
            np.testing.assert_array_equal(rb.pop(64), data)

    def test_threaded_producer_consumer(self, native):
        from tinyrecurrentunet_tpu.runtime import RingBuffer

        rb = RingBuffer(256)
        total = 50_000
        src = np.arange(total, dtype=np.float32)
        received = []

        def producer():
            sent = 0
            while sent < total:
                sent += rb.push(src[sent : sent + 128])

        t = threading.Thread(target=producer)
        t.start()
        got = 0
        while got < total:
            chunk = rb.pop(128)
            if len(chunk):
                received.append(chunk)
                got += len(chunk)
        t.join()
        np.testing.assert_array_equal(np.concatenate(received), src)


class TestNativeWav:
    def test_roundtrip_and_python_parity(self, native, tmp_path, rng):
        from tinyrecurrentunet_tpu.data.audio_io import read_wav, write_wav

        x = (rng.standard_normal(5000) * 0.2).astype(np.float32)
        p1 = str(tmp_path / "py.wav")
        write_wav(p1, x, 16000)

        data, sr = native.wav_read(p1)
        assert sr == 16000
        ref, _ = read_wav(p1)
        np.testing.assert_allclose(data, ref, atol=1e-6)

        p2 = str(tmp_path / "native.wav")
        native.wav_write(p2, x, 16000)
        back, sr2 = read_wav(p2)
        assert sr2 == 16000
        np.testing.assert_allclose(back, x, atol=1e-4)


class TestStreamHost:
    def test_block_flow_and_stats(self, native):
        from tinyrecurrentunet_tpu.runtime import StreamHost

        host = StreamHost(block_size=128, capacity_blocks=8)
        assert host.pull_block(starved=True) is None  # underrun recorded
        host.feed(np.arange(128, dtype=np.float32))
        block = host.pull_block()
        np.testing.assert_array_equal(block, np.arange(128, dtype=np.float32))
        assert host.push_block(block * 2)
        out = host.collect(128)
        np.testing.assert_array_equal(out, block * 2)
        host.add_busy(0.01)
        stats = host.stats()
        assert stats["blocks_processed"] == 1
        assert stats["input_underruns"] == 1
        assert stats["output_overruns"] == 0
        assert stats["busy_seconds"] == pytest.approx(0.01)


class TestStreamCLI:
    def test_file_streaming_end_to_end(self, tmp_path, rng):
        """The full native-host streaming path on a real file."""
        import dataclasses

        import jax
        import jax.numpy as jnp

        from tinyrecurrentunet_tpu.config import Config, FeaturizerConfig
        from tinyrecurrentunet_tpu.data.audio_io import read_wav, write_wav
        from tinyrecurrentunet_tpu.infer.stream import stream_file
        from tinyrecurrentunet_tpu.models import TRUNet
        from tinyrecurrentunet_tpu.runtime import native_available
        from tinyrecurrentunet_tpu.signal import Featurizer

        if not native_available():
            pytest.skip("native toolchain unavailable")

        cfg = dataclasses.replace(
            Config(), featurizer=FeaturizerConfig(sample_rate=16000)
        )
        model = TRUNet(cfg.network)
        fz = Featurizer(cfg.featurizer)
        audio = (rng.standard_normal(8000) * 0.1).astype(np.float32)
        variables = model.init(jax.random.PRNGKey(0), fz(jnp.asarray(audio))[:2])

        inp = str(tmp_path / "in.wav")
        outp = str(tmp_path / "out.wav")
        write_wav(inp, audio, 16000)
        stats = stream_file(cfg, variables, inp, outp)
        assert stats["blocks_processed"] == 8000 // 128 + (1 if 8000 % 128 else 0)
        enhanced, sr = read_wav(outp)
        assert sr == 16000 and len(enhanced) == 8000
        assert np.all(np.isfinite(enhanced))
