"""Loss tests: MR-STFT parity vs a torch recreation of the reference math,
cosine-sim golden values, composite loss jit/grad (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinyrecurrentunet_tpu.config import (
    FeaturizerConfig,
    LossConfig,
    NetworkConfig,
    STFTLossConfig,
)
from tinyrecurrentunet_tpu.losses import MultiResolutionSTFTLoss, cossim_loss, loss_fn
from tinyrecurrentunet_tpu.models import TRUNet
from tinyrecurrentunet_tpu.signal import Featurizer


class TestMRSTFT:
    def test_matches_reference_math(self, rng):
        """Recreate the reference's torch pipeline (stft_loss.py:116-166)
        value-for-value."""
        torch = pytest.importorskip("torch")
        x = rng.standard_normal((2, 8000)).astype(np.float32) * 0.1
        y = (x + 0.01 * rng.standard_normal((2, 8000))).astype(np.float32)

        cfg = STFTLossConfig()
        ours_sc, ours_mag = MultiResolutionSTFTLoss(cfg)(jnp.asarray(x), jnp.asarray(y))

        def t_stft(sig, fs, hs, wl):
            st = torch.stft(
                torch.from_numpy(sig), fs, hs, wl, torch.hann_window(wl),
                return_complex=False,
            )
            return torch.sqrt(
                torch.clamp(st[..., 0] ** 2 + st[..., 1] ** 2, min=1e-7)
            ).transpose(2, 1)

        sc, mag = 0.0, 0.0
        for fs, hs, wl in zip(cfg.fft_sizes, cfg.hop_sizes, cfg.win_lengths):
            xm, ym = t_stft(x, fs, hs, wl), t_stft(y, fs, hs, wl)
            sc += (torch.norm(ym - xm, p="fro") / torch.norm(ym, p="fro")).item()
            mag += torch.nn.functional.l1_loss(torch.log(ym), torch.log(xm)).item()
        n = len(cfg.fft_sizes)
        np.testing.assert_allclose(float(ours_sc), sc * cfg.sc_lambda / n, rtol=1e-3)
        np.testing.assert_allclose(float(ours_mag), mag * cfg.mag_lambda / n, rtol=1e-3)

    def test_zero_for_identical(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 4000)).astype(np.float32))
        sc, mag = MultiResolutionSTFTLoss()(x, x)
        assert float(sc) == pytest.approx(0.0, abs=1e-6)
        assert float(mag) == pytest.approx(0.0, abs=1e-6)

    def test_high_band(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 4000)).astype(np.float32))
        y = x + 0.1
        cfg = STFTLossConfig(band="high")
        sc, mag = MultiResolutionSTFTLoss(cfg)(x, y)
        assert np.isfinite(float(sc)) and np.isfinite(float(mag))

    def test_gradients_finite_at_silence(self):
        """The 1e-7 clamp must keep gradients finite for silent inputs
        (the NaN guard the reference inherited, stft_loss.py:29-30)."""
        x = jnp.zeros((1, 4000))
        y = jnp.ones((1, 4000)) * 0.01

        def f(a):
            sc, mag = MultiResolutionSTFTLoss()(a, y)
            return sc + mag

        g = jax.grad(f)(x)
        assert np.all(np.isfinite(np.asarray(g)))


class TestCosSim:
    def test_identical_is_zero(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 4096)).astype(np.float32))
        assert float(cossim_loss(x, x)) == pytest.approx(0.0, abs=1e-5)

    def test_opposite_is_two(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 4096)).astype(np.float32))
        assert float(cossim_loss(x, -x)) == pytest.approx(2.0, abs=1e-4)

    def test_differentiable(self, rng):
        x = jnp.asarray(rng.standard_normal((4096,)).astype(np.float32))
        g = jax.grad(lambda a: cossim_loss(a, x * 0.5))(x)
        assert np.all(np.isfinite(np.asarray(g)))


class TestCompositeLoss:
    def _setup(self, rng, batch=None, length=12800):
        fz = Featurizer(FeaturizerConfig())
        ncfg = NetworkConfig()
        model = TRUNet(ncfg)
        shape = (length,) if batch is None else (batch, length)
        clean = jnp.asarray(rng.standard_normal(shape).astype(np.float32) * 0.1)
        noisy = clean + jnp.asarray(
            rng.standard_normal(shape).astype(np.float32) * 0.02
        )
        variables = model.init(jax.random.PRNGKey(0), fz(noisy))
        return fz, ncfg, model, variables, clean, noisy

    def test_jit_and_grad_single_program(self, rng):
        """loss_fn must jit (featurize+net+mask+istft+losses in ONE program)
        and yield finite grads."""
        fz, ncfg, model, variables, clean, noisy = self._setup(rng)
        lcfg = LossConfig(cossim_lambda=0.1)

        @jax.jit
        def step(params, batch_stats, clean, noisy):
            def inner(p):
                loss, d, bs, _ = loss_fn(
                    model.apply, p, batch_stats, clean, noisy, fz, ncfg, lcfg
                )
                return loss, (d, bs)

            (loss, (d, bs)), grads = jax.value_and_grad(inner, has_aux=True)(params)
            return loss, d, grads

        loss, d, grads = step(
            variables["params"], variables["batch_stats"], clean, noisy
        )
        assert np.isfinite(float(loss)) and float(loss) > 0
        assert set(d) >= {"ell_p", "stft_sc", "stft_mag", "cossim", "loss"}
        flat = jax.tree.leaves(grads)
        assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
        assert any(np.any(np.asarray(g) != 0) for g in flat)

    def test_batched(self, rng):
        fz, ncfg, model, variables, clean, noisy = self._setup(rng, batch=2)
        loss, d, bs, _ = loss_fn(
            model.apply,
            variables["params"],
            variables["batch_stats"],
            clean,
            noisy,
            fz,
            ncfg,
            LossConfig(),
        )
        assert np.isfinite(float(loss))

    def test_noise_stft_loss(self, rng):
        """The noise-side MR-STFT term (config.py `noise_stft_lambda`) adds
        a finite, grad-carrying term and is zero when the implied noise
        estimate equals the true noise (denoised == clean)."""
        fz, ncfg, model, variables, clean, noisy = self._setup(rng)
        lcfg = LossConfig(noise_stft_lambda=0.5)

        def inner(p):
            loss, d, _, _ = loss_fn(
                model.apply, p, variables["batch_stats"], clean, noisy, fz, ncfg, lcfg
            )
            return loss, d

        (loss, d), grads = jax.value_and_grad(inner, has_aux=True)(
            variables["params"]
        )
        assert "noise_stft" in d and np.isfinite(float(d["noise_stft"]))
        assert float(d["noise_stft"]) > 0
        flat = jax.tree.leaves(grads)
        assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)

    def test_aux_feature_loss(self, rng):
        """Aux feature matching adds a term and gives the logmag/pcen output
        channels (unused by the mixture-source mask) a gradient."""
        fz, ncfg, model, variables, clean, noisy = self._setup(rng)
        lcfg = LossConfig(stft_lambda=0, aux_feature_lambda=1.0)

        def inner(p):
            loss, d, _, _ = loss_fn(
                model.apply, p, variables["batch_stats"], clean, noisy, fz, ncfg, lcfg
            )
            return loss, d

        (loss, d), grads = jax.value_and_grad(inner, has_aux=True)(
            variables["params"]
        )
        assert "aux_feature" in d and np.isfinite(float(d["aux_feature"]))
        # last layer (emits all 8 channels) must receive nonzero grads
        last = grads["TrCNNBlock_5"]
        assert any(np.any(np.asarray(v) != 0) for v in jax.tree.leaves(last))

    def test_eval_mode_does_not_mutate_stats(self, rng):
        fz, ncfg, model, variables, clean, noisy = self._setup(rng)
        _, _, bs, _ = loss_fn(
            model.apply,
            variables["params"],
            variables["batch_stats"],
            clean,
            noisy,
            fz,
            ncfg,
            LossConfig(),
            train=False,
        )
        for a, b in zip(jax.tree.leaves(bs), jax.tree.leaves(variables["batch_stats"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestPerItemNorm:
    """LossConfig.per_item_norm (VERDICT r4 next #1): per-item noise-RMS
    loss normalization so -5 dB additive items stop dominating the
    gradient over small-residual reverb items."""

    def test_weights_equal_rms_are_ones(self, rng):
        from tinyrecurrentunet_tpu.losses import per_item_weights

        clean = jnp.asarray(rng.standard_normal((3, 4000)).astype(np.float32) * 0.1)
        noise = rng.standard_normal((3, 4000)).astype(np.float32)
        # scale every row to exactly the same noise RMS
        noise /= np.sqrt(np.mean(noise**2, axis=-1, keepdims=True))
        w = np.asarray(per_item_weights(clean, clean + jnp.asarray(noise)))
        assert w.shape == (3, 1)
        np.testing.assert_allclose(w, 1.0, rtol=1e-4)

    def test_weights_equalize_and_clip(self, rng):
        from tinyrecurrentunet_tpu.losses import per_item_weights

        clean = jnp.asarray(rng.standard_normal((2, 4000)).astype(np.float32) * 0.1)
        noise = rng.standard_normal((2, 4000)).astype(np.float32)
        noise /= np.sqrt(np.mean(noise**2, axis=-1, keepdims=True))
        noise[1] *= 30.0  # a -5 dB item next to a 25 dB item
        w = np.asarray(per_item_weights(clean, clean + jnp.asarray(noise)))
        # the loud-noise item is down-weighted, the quiet one up-weighted,
        # and the spread is capped at the [1/4, 4] clip
        assert w[0, 0] > w[1, 0]
        assert w[0, 0] == pytest.approx(4.0, rel=1e-3)  # 15.5/1 clipped
        assert w[1, 0] == pytest.approx(15.5 / 30.0, rel=1e-2)

    def test_loss_matches_unnormalized_for_uniform_batch(self, rng):
        """With equal per-item noise RMS all weights are 1, so the
        normalized loss must equal the unnormalized one exactly."""
        fz = Featurizer(FeaturizerConfig())
        ncfg = NetworkConfig()
        model = TRUNet(ncfg)
        clean = jnp.asarray(rng.standard_normal((2, 12800)).astype(np.float32) * 0.1)
        noise = rng.standard_normal((2, 12800)).astype(np.float32)
        noise /= np.sqrt(np.mean(noise**2, axis=-1, keepdims=True))
        noisy = clean + 0.02 * jnp.asarray(noise)
        variables = model.init(jax.random.PRNGKey(0), fz(noisy))
        args = (model.apply, variables["params"], variables["batch_stats"],
                clean, noisy, fz, ncfg)
        base, _, _, _ = loss_fn(*args, LossConfig(noise_stft_lambda=0.5))
        normed, _, _, _ = loss_fn(
            *args, LossConfig(noise_stft_lambda=0.5, per_item_norm=True)
        )
        assert float(normed) == pytest.approx(float(base), rel=1e-4)

    def test_jit_grad_finite_with_norm(self, rng):
        fz = Featurizer(FeaturizerConfig())
        ncfg = NetworkConfig()
        model = TRUNet(ncfg)
        clean = jnp.asarray(rng.standard_normal((2, 12800)).astype(np.float32) * 0.1)
        noise = rng.standard_normal((2, 12800)).astype(np.float32)
        noise[1] *= 25.0
        noisy = clean + 0.02 * jnp.asarray(noise)
        variables = model.init(jax.random.PRNGKey(0), fz(noisy))
        lcfg = LossConfig(noise_stft_lambda=0.5, per_item_norm=True)

        @jax.jit
        def step(p):
            def inner(p):
                loss, d, _, _ = loss_fn(
                    model.apply, p, variables["batch_stats"], clean, noisy,
                    fz, ncfg, lcfg,
                )
                return loss
            return jax.value_and_grad(inner)(p)

        loss, grads = step(variables["params"])
        assert np.isfinite(float(loss))
        flat = jax.tree.leaves(grads)
        assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
        assert any(np.any(np.asarray(g) != 0) for g in flat)
