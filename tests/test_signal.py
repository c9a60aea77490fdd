"""Signal-core golden tests: STFT/iSTFT vs torch, unwrap vs numpy, PCEN vs a
literal loop, dB/norm round-trips, featurizer round-trip and streaming
equivalence (SURVEY.md §4 test plan)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tinyrecurrentunet_tpu.config import FeaturizerConfig
from tinyrecurrentunet_tpu.signal import (
    Featurizer,
    istft,
    pcen,
    stft,
    stft_magnitude,
    unwrap,
)
from tinyrecurrentunet_tpu.signal.features import (
    amp_to_db,
    db_to_amp,
    denorm_db,
    norm_db,
)
from tinyrecurrentunet_tpu.signal.stft import frame_signal, hann_window, overlap_add

torch = pytest.importorskip("torch")


def _rand_audio(rng, n=16000):
    return rng.standard_normal(n).astype(np.float32) * 0.1


class TestSTFT:
    def test_matches_torch_stft_rectangular(self, rng):
        """Featurizer path: torch.stft with no window (reference dataset.py:260)."""
        x = _rand_audio(rng)
        ours = np.asarray(stft(jnp.asarray(x), n_fft=512, hop_length=128))
        theirs = torch.stft(
            torch.from_numpy(x), n_fft=512, hop_length=128, return_complex=True
        ).numpy().T  # torch is (F, T); ours is (T, F)
        assert ours.shape == theirs.shape
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)

    def test_matches_torch_stft_hann_short_window(self, rng):
        """Loss-bank path: hann win_length < n_fft (reference stft_loss.py:21)."""
        x = _rand_audio(rng, 8000)
        win = hann_window(240)
        ours = np.asarray(
            stft(jnp.asarray(x), n_fft=512, hop_length=50, window=win)
        )
        theirs = torch.stft(
            torch.from_numpy(x),
            n_fft=512,
            hop_length=50,
            win_length=240,
            window=torch.hann_window(240),
            return_complex=True,
        ).numpy().T
        np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)

    def test_istft_matches_torch(self, rng):
        x = _rand_audio(rng)
        spec = torch.stft(
            torch.from_numpy(x), n_fft=512, hop_length=128, return_complex=True
        )
        theirs = torch.istft(spec, n_fft=512, hop_length=128).numpy()
        ours = np.asarray(
            istft(jnp.asarray(spec.numpy().T), n_fft=512, hop_length=128)
        )
        assert ours.shape == theirs.shape
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)

    def test_roundtrip_identity(self, rng):
        x = _rand_audio(rng, 96000 + 512)
        spec = stft(jnp.asarray(x), n_fft=512, hop_length=128)
        y = np.asarray(istft(spec, n_fft=512, hop_length=128))
        np.testing.assert_allclose(y, x[: len(y)], rtol=1e-4, atol=1e-5)

    def test_frame_count_2s_48k(self):
        """2 s at 48 kHz -> 751 frames (reference config/tiny.json:57-61)."""
        x = jnp.zeros(96000)
        assert stft(x, 512, 128).shape == (751, 257)

    def test_frame_overlap_add_inverse(self, rng):
        """overlap_add(frame_signal(x)) == x * coverage-count, on both the
        reshape fast path (hop | n_fft) and the general path."""
        x = rng.standard_normal(4096).astype(np.float32)
        for n_fft, hop in [(512, 128), (512, 50)]:
            frames = frame_signal(jnp.asarray(x), n_fft, hop)
            t = frames.shape[0]
            total = (t - 1) * hop + n_fft
            ola = np.asarray(overlap_add(frames, hop, total))
            cover = np.asarray(overlap_add(jnp.ones((t, n_fft)), hop, total))
            np.testing.assert_allclose(
                ola, x[:total] * cover, rtol=1e-5, atol=1e-5
            )
            if n_fft % hop == 0:
                # steady-state coverage equals the overlap factor
                assert cover[n_fft : total - n_fft].max() == n_fft // hop
                assert cover[n_fft : total - n_fft].min() == n_fft // hop

    def test_batched_stft(self, rng):
        x = rng.standard_normal((3, 8000)).astype(np.float32)
        batched = np.asarray(stft(jnp.asarray(x), 512, 128))
        single = np.stack([np.asarray(stft(jnp.asarray(xi), 512, 128)) for xi in x])
        np.testing.assert_allclose(batched, single, rtol=1e-6, atol=1e-6)


class TestPhase:
    def test_unwrap_matches_numpy(self, rng):
        p = rng.uniform(-np.pi, np.pi, size=(257, 100)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(unwrap(jnp.asarray(p), axis=-1)),
            np.unwrap(p, axis=-1),
            rtol=1e-4,
            atol=1e-4,
        )

    def test_unwrap_streaming_equivalence(self, rng):
        from tinyrecurrentunet_tpu.signal.phase import unwrap_step

        p = rng.uniform(-np.pi, np.pi, size=(50, 257)).astype(np.float32)
        offline = np.unwrap(p, axis=0)
        corr = jnp.zeros((257,))
        prev = jnp.asarray(p[0])
        outs = [p[0]]
        for t in range(1, 50):
            out, corr = unwrap_step(jnp.asarray(p[t]), prev, corr)
            prev = jnp.asarray(p[t])
            outs.append(np.asarray(out))
        np.testing.assert_allclose(np.stack(outs), offline, rtol=1e-4, atol=1e-4)


class TestPCEN:
    @staticmethod
    def _pcen_loop(x, eps=1e-6, s=0.025, alpha=0.98, delta=2.0, r=0.5):
        """Literal reference semantics (dataset.py:56-76): IIR over time with
        M[0] = s*x[0], then (x/(M+eps)^alpha + delta)^r - delta^r."""
        m = np.zeros_like(x)
        last = None
        for t in range(x.shape[0]):
            last = s * x[t] if last is None else (1 - s) * last + s * x[t]
            m[t] = last
        return (x / (m + eps) ** alpha + delta) ** r - delta**r

    def test_matches_reference_loop(self, rng):
        x = np.abs(rng.standard_normal((100, 257))).astype(np.float32)
        ours = np.asarray(pcen(jnp.asarray(x), axis=0))
        np.testing.assert_allclose(ours, self._pcen_loop(x), rtol=1e-4, atol=1e-5)

    def test_streaming_equivalence(self, rng):
        from tinyrecurrentunet_tpu.signal.pcen import pcen_step

        x = np.abs(rng.standard_normal((40, 257))).astype(np.float32)
        offline = np.asarray(pcen(jnp.asarray(x), axis=0))
        m = jnp.zeros((257,))
        outs = []
        for t in range(40):
            out, m = pcen_step(jnp.asarray(x[t]), m)
            outs.append(np.asarray(out))
        np.testing.assert_allclose(np.stack(outs), offline, rtol=1e-4, atol=1e-5)


class TestDbNorm:
    def test_db_roundtrip(self, rng):
        mag = np.abs(rng.standard_normal((100,))).astype(np.float32) + 1e-3
        db = amp_to_db(jnp.asarray(mag))
        np.testing.assert_allclose(
            np.asarray(db_to_amp(db + 25.0)), mag, rtol=1e-4
        )

    def test_norm_denorm_roundtrip(self, rng):
        mag = np.abs(rng.standard_normal((1000,))).astype(np.float32) * 0.5 + 1e-4
        db = amp_to_db(jnp.asarray(mag), 25.0)
        normed = norm_db(db, -100.0)
        # denorm adds ref back: denorm(norm(db)) == db + 25 for in-range values
        back = denorm_db(normed, -100.0, 25.0)
        mask = (np.asarray(db) > -100.0) & (np.asarray(db) < 0.0)
        np.testing.assert_allclose(
            np.asarray(back)[mask], np.asarray(db)[mask] + 25.0, rtol=1e-3, atol=1e-3
        )


class TestFeaturizer:
    def test_shapes_4ch(self, rng):
        fz = Featurizer(FeaturizerConfig(sample_rate=16000))
        audio = jnp.asarray(_rand_audio(rng, 32000))  # 2 s at 16 kHz
        feats = fz(audio)
        assert feats.shape == (251, 257, 4)

    def test_shapes_3ch(self, rng):
        cfg = FeaturizerConfig(channels=("logmag", "real_demod", "imag_demod"))
        fz = Featurizer(cfg)
        feats = fz(jnp.asarray(_rand_audio(rng, 96000)))
        assert feats.shape == (751, 257, 3)

    def test_roundtrip_reconstruction(self, rng):
        """feat -> inverse ~ identity for the mag/phase channels (the PCEN
        channel carries no reconstruction burden)."""
        fz = Featurizer(FeaturizerConfig())
        x = _rand_audio(rng, 48000) * 0.3
        feats = fz(jnp.asarray(x))
        y = np.asarray(fz.inverse(feats))
        assert y.shape[0] == (feats.shape[0] - 1) * 128
        # torch.istft trims edges; compare the interior
        np.testing.assert_allclose(y[512:-512], x[512 : len(y) - 512], atol=5e-3)

    def test_streaming_equivalence(self, rng):
        fz = Featurizer(FeaturizerConfig())
        x = _rand_audio(rng, 16000)
        spec = fz.spectrogram(jnp.asarray(x))
        offline = np.asarray(fz.features_from_spec(spec))
        state = fz.init_state()
        outs = []
        for t in range(spec.shape[0]):
            out, state = fz.step_from_spec_frame(spec[t], state)
            outs.append(np.asarray(out))
        np.testing.assert_allclose(np.stack(outs), offline, rtol=1e-3, atol=1e-4)

    def test_jit_differentiable(self, rng):
        """The whole feat->inverse path must be differentiable (loss fusion)."""
        import jax

        fz = Featurizer(FeaturizerConfig())

        def loss(x):
            return jnp.mean(jnp.abs(fz.inverse(fz(x))))

        g = jax.jit(jax.grad(loss))(jnp.asarray(_rand_audio(rng, 12800)))
        assert np.all(np.isfinite(np.asarray(g)))


class TestSTFTMagnitude:
    def test_matches_torch_loss_stft(self, rng):
        """Parity with the reference loss stft helper (stft_loss.py:9-30)."""
        x = _rand_audio(rng, 8000)
        ours = np.asarray(stft_magnitude(jnp.asarray(x), 512, 50, 240))
        xs = torch.stft(
            torch.from_numpy(x),
            512,
            50,
            240,
            torch.hann_window(240),
            return_complex=False,
        )
        theirs = torch.sqrt(
            torch.clamp(xs[..., 0] ** 2 + xs[..., 1] ** 2, min=1e-7)
        ).transpose(1, 0).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)
