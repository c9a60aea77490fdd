"""Inference tests: streaming-vs-offline alignment, offline denoiser CLI
path, metrics sanity, graft entry hooks."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinyrecurrentunet_tpu.config import Config, FeaturizerConfig
from tinyrecurrentunet_tpu.infer.denoise import Denoiser
from tinyrecurrentunet_tpu.infer.metrics import si_sdr, snr, stoi
from tinyrecurrentunet_tpu.infer.streaming import StreamingDenoiser
from tinyrecurrentunet_tpu.models import TRUNet
from tinyrecurrentunet_tpu.models.phm import denoise_output_to_audio
from tinyrecurrentunet_tpu.signal import Featurizer


@pytest.fixture(scope="module")
def setup16k():
    cfg = dataclasses.replace(
        Config(), featurizer=FeaturizerConfig(sample_rate=16000)
    )
    model = TRUNet(cfg.network)
    fz = Featurizer(cfg.featurizer)
    rng = np.random.default_rng(0)
    t = np.arange(16000) / 16000
    audio = (
        0.2 * np.sin(2 * np.pi * 220 * t) + 0.05 * rng.standard_normal(16000)
    ).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), fz(jnp.asarray(audio))[:2])
    return cfg, model, fz, variables, audio


class TestStreaming:
    def test_spec_frame_streaming_is_exact(self, setup16k):
        """Feeding the OFFLINE STFT frames through the per-frame streaming
        pipeline (featurizer state + TGRU carry + PHM + OLA) reproduces the
        offline output exactly in the interior — the streaming graph is the
        same function, with no startup approximation."""
        cfg, model, fz, variables, audio = setup16k
        hop = cfg.featurizer.hop_length

        spec_full = fz.spectrogram(jnp.asarray(audio))
        output, _ = model.apply(variables, fz.features_from_spec(spec_full))
        offline = np.asarray(
            denoise_output_to_audio(
                output, fz, cfg.network, length=len(audio), mixture_spec=spec_full
            )
        )

        spec = fz.spectrogram(jnp.asarray(audio))  # (T, F) offline frames
        sd = StreamingDenoiser(cfg, variables)
        state = sd.init_state()
        blocks = []
        for u in range(spec.shape[0]):
            out, state = sd.process_spec_frame(state, spec[u])
            blocks.append(np.asarray(out))
        streamed = np.concatenate(blocks)
        # frame u emission covers padded samples [u*h, (u+1)*h) = offline
        # output [(u-2)*h, (u-1)*h); interior (full OLA coverage): u >= 3,
        # and skip the final partially-covered frames.
        u0, u1 = 4, spec.shape[0] - 4
        stream_seg = streamed[u0 * hop : u1 * hop]
        offline_seg = offline[(u0 - 2) * hop : (u1 - 2) * hop]
        np.testing.assert_allclose(stream_seg, offline_seg, rtol=1e-4, atol=1e-6)

    def test_block_alignment_with_offline(self, setup16k):
        """Block-by-block streaming (zero-fill startup) converges to the
        offline output at the documented 3-block shift; the residual decays
        with the PCEN smoother's (1-s)^t and the GRU forget gates."""
        cfg, model, fz, variables, audio = setup16k
        hop = cfg.featurizer.hop_length

        spec_full = fz.spectrogram(jnp.asarray(audio))
        output, _ = model.apply(variables, fz.features_from_spec(spec_full))
        offline = np.asarray(
            denoise_output_to_audio(
                output, fz, cfg.network, length=len(audio), mixture_spec=spec_full
            )
        )

        sd = StreamingDenoiser(cfg, variables)
        streamed, _ = sd.process(audio)

        k0, k1 = 60, 120  # blocks, ~0.5 s of warm-in
        stream_seg = streamed[k0 * hop : k1 * hop]
        offline_seg = offline[(k0 - 3) * hop : (k1 - 3) * hop]
        err = np.abs(stream_seg - offline_seg)
        scale = np.abs(offline_seg).max() + 1e-9
        assert err.max() / scale < 5e-2, (err.max(), scale)
        # wrong alignments are an order of magnitude worse
        wrong = np.abs(
            streamed[(k0 + 1) * hop : (k1 + 1) * hop] - offline_seg
        ).max()
        assert wrong / scale > 0.2

    def test_chunked_equals_single_steps(self, setup16k):
        """chunk_frames=4 must reproduce 4x chunk_frames=1 exactly."""
        cfg, model, fz, variables, audio = setup16k
        single = StreamingDenoiser(cfg, variables, chunk_frames=1)
        chunked = StreamingDenoiser(cfg, variables, chunk_frames=4)
        out_s, _ = single.process(audio[:8192])
        out_c, _ = chunked.process(audio[:8192])
        np.testing.assert_allclose(out_c, out_s, rtol=1e-4, atol=1e-6)

    def test_stateful_progress(self, setup16k):
        cfg, model, fz, variables, audio = setup16k
        sd = StreamingDenoiser(cfg, variables)
        state = sd.init_state()
        out1, state = sd.process_block(state, audio[:128])
        assert out1.shape == (128,)
        assert int(state.feat_state.frame_count) == 1
        out2, state = sd.process_block(state, audio[128:256])
        assert int(state.feat_state.frame_count) == 2

    def test_process_returns_full_length(self, setup16k):
        cfg, model, fz, variables, audio = setup16k
        sd = StreamingDenoiser(cfg, variables)
        streamed, _ = sd.process(audio[:1000])  # non-multiple of hop
        assert streamed.shape == (1000,)

    def test_step_embeds_no_weight_constants(self, setup16k):
        """The jitted block step must take the weight tree as an explicit
        argument, never a closure capture: tracing a closure over concrete
        arrays bakes them into the HLO as dense literals, which reads the
        whole device tree back to host at trace time — and on the TPU
        tunnel one such pull flips every later block_until_ready into a
        ~26 ms round-trip for the rest of the process (round 4: a 67x
        poisoned bench headline, CLAUDE.md). Guard: the lowered step text
        carries no large dense constant."""
        import re

        from tinyrecurrentunet_tpu.infer.multistream import MultiStreamDenoiser

        cfg, model, fz, variables, audio = setup16k
        sd = StreamingDenoiser(cfg, variables)
        msd = MultiStreamDenoiser(cfg, variables, num_streams=2)
        block = jnp.zeros((sd.hop,), jnp.float32)
        blocks = jnp.zeros((2, msd.hop), jnp.float32)
        for text in (
            sd._step.lower(sd.variables, sd.init_state(), block).as_text(),
            msd._step.lower(
                msd.variables, msd.init_state(), blocks
            ).as_text(),
        ):
            # dense<...> literals above ~64 elements would be captured
            # weights (biases/kernels are hundreds+); small shape/window
            # constants are fine.
            for m in re.finditer(r"dense<\[([^>]{0,100000})\]>", text):
                n_elems = m.group(1).count(",") + 1
                assert n_elems <= 64, (
                    f"large dense constant ({n_elems} elems) baked into the "
                    "streaming step HLO — a closure captured the weights"
                )
            # large literals print as hex blobs with no commas
            for m in re.finditer(r'dense<"0x([0-9a-fA-F]*)"', text):
                assert len(m.group(1)) <= 512, (
                    f"large hex constant ({len(m.group(1)) // 2} bytes) "
                    "baked into the streaming step HLO — a closure "
                    "captured the weights"
                )


class TestMultiStream:
    def test_matches_independent_streams(self, setup16k, rng):
        """N batched streams == N independent single-stream runs."""
        from tinyrecurrentunet_tpu.infer.multistream import MultiStreamDenoiser

        cfg, model, fz, variables, audio = setup16k
        streams = np.stack(
            [
                audio[:4096],
                (0.1 * rng.standard_normal(4096)).astype(np.float32),
                np.zeros(4096, np.float32),
            ]
        )
        ms = MultiStreamDenoiser(cfg, variables, num_streams=3, chunk_frames=2)
        batched, _ = ms.process(streams)
        single = StreamingDenoiser(cfg, variables, chunk_frames=2)
        for i in range(3):
            ref, _ = single.process(streams[i])
            np.testing.assert_allclose(batched[i], ref, rtol=1e-4, atol=1e-6)


class TestDenoiser:
    def test_full_clip(self, setup16k):
        cfg, model, fz, variables, audio = setup16k
        d = Denoiser(cfg, variables)
        out = d(audio)
        assert out.shape == audio.shape
        assert np.all(np.isfinite(out))

    def test_non_hop_multiple_length(self, setup16k):
        cfg, model, fz, variables, audio = setup16k
        d = Denoiser(cfg, variables)
        out = d(audio[:12345])
        assert out.shape == (12345,)


class TestMetrics:
    def test_si_sdr_perfect(self, rng):
        x = rng.standard_normal(16000)
        assert si_sdr(x, x) > 70
        assert si_sdr(0.5 * x, x) > 70  # scale-invariant

    def test_si_sdr_noise_ordering(self, rng):
        x = rng.standard_normal(16000)
        a = si_sdr(x + 0.01 * rng.standard_normal(16000), x)
        b = si_sdr(x + 0.3 * rng.standard_normal(16000), x)
        assert a > b

    def test_snr(self, rng):
        x = rng.standard_normal(16000)
        assert snr(x, x) > 70

    def test_stoi_sanity(self, rng):
        """Identical speech-like signal ~ 1.0; heavy noise strictly lower."""
        sr = 16000
        t = np.arange(3 * sr) / sr
        mod = 0.5 * (1 + np.sin(2 * np.pi * 4 * t))
        x = (mod * np.sin(2 * np.pi * 300 * t) + 0.1 * np.sin(2 * np.pi * 1200 * t))
        clean_score = stoi(x, x, sr)
        noisy_score = stoi(x, x + 2.0 * rng.standard_normal(len(x)), sr)
        assert clean_score > 0.95
        assert noisy_score < clean_score - 0.1


class TestEvalPairing:
    """evaluate_dns file pairing (reference `eval.py:22-26` exact names).

    Round-1 regression (VERDICT weak #3): suffix matching paired fileid
    "1.wav" with "...11.wav" in arbitrary os.listdir order."""

    @staticmethod
    def _write(path, value, n=16000, sr=16000):
        from tinyrecurrentunet_tpu.data import write_wav

        x = np.full(n, value, dtype=np.float32)
        write_wav(path, x, sr)

    def test_fileid_1_and_11_coexist(self, tmp_path):
        from tinyrecurrentunet_tpu.infer.evaluate import build_fileid_index

        d = tmp_path / "enhanced"
        d.mkdir()
        self._write(str(d / "enhanced_fileid_1.wav"), 0.1)
        self._write(str(d / "enhanced_fileid_11.wav"), 0.2)
        self._write(str(d / "enhanced_fileid_21.wav"), 0.3)
        index = build_fileid_index(str(d))
        assert index["1"].endswith("enhanced_fileid_1.wav")
        assert index["11"].endswith("enhanced_fileid_11.wav")
        assert index["21"].endswith("enhanced_fileid_21.wav")

    def test_ambiguous_fileid_raises(self, tmp_path):
        from tinyrecurrentunet_tpu.infer.evaluate import build_fileid_index

        d = tmp_path / "enhanced"
        d.mkdir()
        self._write(str(d / "a_fileid_7.wav"), 0.1)
        self._write(str(d / "b_fileid_7.wav"), 0.2)
        with pytest.raises(ValueError, match="ambiguous"):
            build_fileid_index(str(d))

    def test_missing_estimate_raises(self, tmp_path):
        from tinyrecurrentunet_tpu.infer.evaluate import evaluate_dns

        base = tmp_path
        (base / "clean").mkdir()
        (base / "noisy").mkdir()
        self._write(str(base / "clean" / "clean_fileid_1.wav"), 0.1)
        self._write(str(base / "clean" / "clean_fileid_2.wav"), 0.1)
        self._write(str(base / "noisy" / "noisy_fileid_1.wav"), 0.2)
        with pytest.raises(FileNotFoundError, match="_2"):
            evaluate_dns(str(base), None, target="noisy", sample_rate=16000)

    def test_fileids_filter_restricts_scoring(self, tmp_path):
        """ADVICE r2: an oversized (reused) testset dir must not silently
        widen the evaluation — the fileids= allowlist pins the set."""
        from tinyrecurrentunet_tpu.infer.evaluate import evaluate_dns

        base = tmp_path
        (base / "clean").mkdir()
        (base / "noisy").mkdir()
        for i in range(5):
            self._write(str(base / "clean" / f"clean_fileid_{i}.wav"), 0.1)
            self._write(str(base / "noisy" / f"noisy_fileid_{i}.wav"), 0.1)
        m = evaluate_dns(
            str(base), None, target="noisy", sample_rate=16000,
            fileids={"0", "1", "2"},
        )
        assert m["num_files"] == 3

    def test_list_devices_without_sounddevice(self):
        """--list-devices parity (reference stream.py:28-46): without the
        PortAudio wheel the native endpoints are listed."""
        from tinyrecurrentunet_tpu.infer.stream import list_devices

        lines = list_devices()
        assert lines and any(
            "PortAudio" in line or "ring:input" in line for line in lines
        )

    def test_pairs_by_exact_id(self, tmp_path):
        """End-to-end: clean files pair with the SAME-id noisy file even
        when suffix-colliding ids coexist (1 vs 11)."""
        from tinyrecurrentunet_tpu.infer.evaluate import evaluate_dns

        rng = np.random.default_rng(0)
        base = tmp_path
        (base / "clean").mkdir()
        (base / "noisy").mkdir()
        from tinyrecurrentunet_tpu.data import write_wav

        x1 = (0.1 * rng.standard_normal(16000)).astype(np.float32)
        x11 = (0.1 * rng.standard_normal(16000)).astype(np.float32)
        write_wav(str(base / "clean" / "clean_fileid_1.wav"), x1, 16000)
        write_wav(str(base / "clean" / "clean_fileid_11.wav"), x11, 16000)
        # noisy_1 == clean_1 (perfect), noisy_11 == clean_11 (perfect):
        # correct pairing gives huge SI-SDR; crossed pairing gives ~0 dB.
        write_wav(str(base / "noisy" / "noisy_fileid_1.wav"), x1, 16000)
        write_wav(str(base / "noisy" / "noisy_fileid_11.wav"), x11, 16000)
        m = evaluate_dns(str(base), None, target="noisy", sample_rate=16000)
        assert m["si_sdr"] > 40.0
