"""Training runtime tests: schedule parity with the reference math,
checkpoint save/restore with max-selector, loss decrease over steps, and
single-device vs 8-device-mesh DP equivalence (SURVEY.md §4)."""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinyrecurrentunet_tpu.config import (
    Config,
    LogConfig,
    LossConfig,
    OptimizationConfig,
    STFTLossConfig,
    TrainConfig,
    TrainsetConfig,
)
from tinyrecurrentunet_tpu.data import DataLoader, SyntheticPairDataset
from tinyrecurrentunet_tpu.parallel.mesh import make_mesh, shard_batch
from tinyrecurrentunet_tpu.train.checkpoint import CheckpointManager
from tinyrecurrentunet_tpu.train.schedule import linear_warmup_cosine_decay
from tinyrecurrentunet_tpu.train.state import create_train_state
from tinyrecurrentunet_tpu.train.step import make_eval_step, make_train_step


def small_config(**opt_kwargs) -> Config:
    """A fast config: 16 kHz, short clips, light loss bank."""
    return Config(
        featurizer=dataclasses.replace(
            Config().featurizer, sample_rate=16000
        ),
        train=TrainConfig(
            log=LogConfig(iters_per_ckpt=5, iters_per_valid=2),
            optimization=OptimizationConfig(
                n_iters=100, learning_rate=4e-4, **opt_kwargs
            ),
            loss_config=LossConfig(
                stft_config=STFTLossConfig(
                    fft_sizes=(512,), hop_sizes=(120,), win_lengths=(240,)
                )
            ),
        ),
        trainset=TrainsetConfig(sample_rate=16000, crop_length_sec=0.5),
    )


class TestSchedule:
    @staticmethod
    def _reference_lr(k, lr_max, n_iter, divider=25, warmup=0.05):
        """Literal reference math (util.py:81-156): k scheduler.step() calls."""
        phase1 = int(n_iter * warmup)
        phase2 = n_iter - phase1
        lr_min = lr_max / divider
        if k <= phase1:
            return lr_min + (k / phase1) * (lr_max - lr_min)
        n2 = k - phase1
        cos_val = math.cos(math.pi * (n2 / phase2)) + 1
        return (lr_min / 1e4) + (lr_max - lr_min / 1e4) / 2 * cos_val

    def test_matches_reference_math(self):
        lr_max, n_iter = 4e-4, 10000
        sched = linear_warmup_cosine_decay(lr_max, n_iter)
        for count in [0, 1, 100, 499, 500, 1000, 5000, 9999]:
            ours = float(sched(count))
            ref = self._reference_lr(count + 1, lr_max, n_iter)
            np.testing.assert_allclose(ours, ref, rtol=1e-5, err_msg=f"count={count}")

    def test_clamps_past_end(self):
        sched = linear_warmup_cosine_decay(4e-4, 1000)
        # the reference wraps around past n_iters (util.py:150-154 artifact);
        # ours clamps at the terminal value
        assert float(sched(2000)) == pytest.approx(float(sched(999)), rel=1e-4)

    def test_resume_is_pure(self):
        sched = linear_warmup_cosine_decay(4e-4, 1000)
        assert float(sched(123)) == float(sched(123))


class TestDataPipeline:
    def test_synthetic_loader_shapes(self):
        ds = SyntheticPairDataset(num_items=8, length_sec=0.5, sample_rate=16000)
        loader = DataLoader(ds, batch_size=4, drop_last=True)
        batches = list(loader)
        assert len(batches) == 2
        clean, noisy, ids = batches[0]
        assert clean.shape == (4, 8000) and noisy.shape == (4, 8000)
        assert len(ids) == 4

    def test_sharding_partitions(self):
        ds = SyntheticPairDataset(num_items=16, length_sec=0.1)
        seen = []
        for shard in range(4):
            loader = DataLoader(
                ds, batch_size=2, shuffle=False, num_shards=4, shard_index=shard
            )
            for _, _, ids in loader:
                seen.extend(ids)
        assert sorted(seen) == sorted(f"synthetic_{i}" for i in range(16))

    def test_shuffle_same_permutation_across_shards(self):
        ds = SyntheticPairDataset(num_items=12, length_sec=0.1)
        all_ids = set()
        for shard in range(3):
            loader = DataLoader(
                ds, batch_size=2, shuffle=True, seed=7, num_shards=3, shard_index=shard
            )
            for _, _, ids in loader:
                all_ids.update(ids)
        assert len(all_ids) == 12

    def test_augment_bounds(self, rng):
        from tinyrecurrentunet_tpu.data.augment import DataAugment

        aug = DataAugment(sample_rate=16000)
        x = rng.standard_normal(8000).astype(np.float32)
        y = aug(x, rng)
        assert y.shape == x.shape and np.all(np.isfinite(y))
        # gain is negative: output energy below input energy
        assert np.mean(y**2) < np.mean(x**2)

    def test_biquad_frequency_response(self):
        """Low-pass attenuates above cutoff; high-pass attenuates below."""
        from tinyrecurrentunet_tpu.data.augment import highpass_biquad, lowpass_biquad

        sr = 16000
        t = np.arange(sr) / sr
        low_tone = np.sin(2 * np.pi * 100 * t).astype(np.float32)
        high_tone = np.sin(2 * np.pi * 6000 * t).astype(np.float32)
        lp_high = lowpass_biquad(high_tone, sr, 1000.0)
        lp_low = lowpass_biquad(low_tone, sr, 1000.0)
        assert np.mean(lp_high**2) < 0.05 * np.mean(lp_low**2)
        hp_low = highpass_biquad(low_tone, sr, 2000.0)
        hp_high = highpass_biquad(high_tone, sr, 2000.0)
        assert np.mean(hp_low**2) < 0.05 * np.mean(hp_high**2)

    def test_wav_roundtrip(self, rng, tmp_path):
        from tinyrecurrentunet_tpu.data import read_wav, write_wav

        x = (rng.standard_normal(1000) * 0.1).astype(np.float32)
        p = str(tmp_path / "x.wav")
        write_wav(p, x, 16000)
        y, sr = read_wav(p)
        assert sr == 16000
        np.testing.assert_allclose(y, x, atol=1e-4)


class TestTrainStep:
    def test_loss_decreases(self):
        """Loss trend over 30 steps is robustly downward.

        Round-1 regression: the old version asserted a strict decrease
        after exactly 12 steps, which lands inside the LR-warmup transient
        (measured trajectory: rises to ~2.684 by step 10, then decreases
        steadily to ~2.643 by step 39) — knife-edge by construction, not a
        dynamics bug (VERDICT weak #2). Compare trailing vs leading means
        past the transient instead."""
        cfg = small_config()
        ds = SyntheticPairDataset(num_items=4, length_sec=0.5, sample_rate=16000)
        state = create_train_state(cfg)
        step = make_train_step(cfg)
        rng = np.random.default_rng(0)
        clean, noisy, _ = ds.get(0, rng), ds.get(1, rng), None
        clean_b = jnp.asarray(np.stack([clean[0], noisy[0]]))
        noisy_b = jnp.asarray(np.stack([clean[1], noisy[1]]))
        losses = []
        for _ in range(30):
            state, metrics = step(state, clean_b, noisy_b)
            losses.append(float(metrics["loss"]))
        assert all(np.isfinite(losses))
        head = float(np.mean(losses[:5]))
        tail = float(np.mean(losses[-5:]))
        assert tail < head - 1e-3, (head, tail, losses)

    def test_eval_step(self):
        cfg = small_config()
        state = create_train_state(cfg)
        estep = make_eval_step(cfg)
        rng = np.random.default_rng(0)
        ds = SyntheticPairDataset(num_items=2, length_sec=0.5, sample_rate=16000)
        c, n, _ = ds.get(0, rng)
        d = estep(state, jnp.asarray(c[None]), jnp.asarray(n[None]))
        assert np.isfinite(float(d["loss"]))

    def test_data_parallel_matches_single_device(self):
        """The 8-device mesh step must compute the same loss and (globally)
        the same gradients as the single-device step on the same global
        batch — the correctness property the reference's gradient all-reduce
        provided. Compared in global L2: per-leaf comparison is meaningless
        for params whose exact gradient is zero (biases feeding BatchNorm),
        where both backends produce reduction-order noise."""
        from tinyrecurrentunet_tpu.losses import loss_fn
        from tinyrecurrentunet_tpu.models import TRUNet
        from tinyrecurrentunet_tpu.parallel.mesh import (
            batch_sharding,
            replicated_sharding,
        )
        from tinyrecurrentunet_tpu.signal import Featurizer

        cfg = small_config(batch_size_per_device=1)
        ds = SyntheticPairDataset(num_items=8, length_sec=0.5, sample_rate=16000)
        rng = np.random.default_rng(0)
        items = [ds.get(i, rng) for i in range(8)]
        clean = np.stack([c for c, _, _ in items])
        noisy = np.stack([n for _, n, _ in items])

        state = create_train_state(cfg)
        model = TRUNet(cfg.network)
        fz = Featurizer(cfg.featurizer)

        def gradf(params, batch_stats, c, n):
            def inner(p):
                loss, _, _, _ = loss_fn(
                    model.apply, p, batch_stats, c, n, fz, cfg.network,
                    cfg.train.loss_config, train=True,
                )
                return loss

            return jax.value_and_grad(inner)(params)

        loss_a, g_a = jax.jit(gradf)(
            state.params, state.batch_stats, jnp.asarray(clean), jnp.asarray(noisy)
        )

        mesh = make_mesh(8)
        repl, data = replicated_sharding(mesh), batch_sharding(mesh)
        cs, ns = shard_batch(mesh, (clean, noisy))
        loss_b, g_b = jax.jit(
            gradf, in_shardings=(repl, repl, data, data), out_shardings=repl
        )(state.params, state.batch_stats, cs, ns)

        np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-5)
        va = np.concatenate([np.asarray(x).ravel() for x in jax.tree.leaves(g_a)])
        vb = np.concatenate([np.asarray(x).ravel() for x in jax.tree.leaves(g_b)])
        rel = np.linalg.norm(va - vb) / np.linalg.norm(va)
        # Tolerance: sharded reductions change fp32 summation order; BN
        # train-mode stats amplify that through rsqrt(var+eps) on
        # near-zero-variance channels (~1.4e-3 observed). Identical
        # single-device runs are bit-equal (checked separately), so this
        # bound is about reduction order, not nondeterminism.
        assert rel < 5e-3, f"global grad relative L2 diff {rel}"


class TestTBPTT:
    def test_carry_step_runs_and_carry_flows(self):
        from tinyrecurrentunet_tpu.models import TRUNet

        cfg = small_config()
        model = TRUNet(cfg.network)
        ds = SyntheticPairDataset(num_items=2, length_sec=0.5, sample_rate=16000)
        rng = np.random.default_rng(0)
        c, n, _ = ds.get(0, rng)
        state = create_train_state(cfg)
        step = make_train_step(cfg, with_carry=True)
        h = model.init_tgru_state(1, cfg.featurizer.num_freqs)
        seg = 4096
        losses = []
        carries = []
        for s in range(2):
            sl = slice(s * seg, (s + 1) * seg)
            state, metrics, h = step(
                state, jnp.asarray(c[None, sl]), jnp.asarray(n[None, sl]), h
            )
            losses.append(float(metrics["loss"]))
            carries.append(np.asarray(h))
        assert all(np.isfinite(losses))
        assert not np.allclose(carries[0], carries[1])
        assert np.any(carries[0] != 0)  # the first segment produced a carry

    def test_carry_step_data_parallel_matches_single_device(self):
        """The TBPTT segment step over the 8-device mesh must match the
        single-device segment step: same loss and same carried TGRU state
        on the same global batch, across two chained segments (VERDICT r3
        #7: train/step.py shards the carry on the data axis but no SPMD
        test drove it)."""
        from tinyrecurrentunet_tpu.models import TRUNet

        cfg = small_config(batch_size_per_device=1)
        model = TRUNet(cfg.network)
        ds = SyntheticPairDataset(num_items=8, length_sec=0.5, sample_rate=16000)
        rng = np.random.default_rng(0)
        items = [ds.get(i, rng) for i in range(8)]
        clean = np.stack([c for c, _, _ in items])
        noisy = np.stack([n for _, n, _ in items])
        seg = clean.shape[-1] // 2

        def run(mesh):
            state = create_train_state(cfg)
            step = make_train_step(cfg, model, mesh=mesh, with_carry=True)
            c, n = (
                shard_batch(mesh, (clean, noisy))
                if mesh is not None
                else (jnp.asarray(clean), jnp.asarray(noisy))
            )
            # fresh per run: the step donates the carry (and the state)
            h = model.init_tgru_state(8, cfg.featurizer.num_freqs)
            for s in range(2):
                sl = slice(s * seg, (s + 1) * seg)
                state, metrics, h = step(state, c[:, sl], n[:, sl], h)
            return float(metrics["loss"]), np.asarray(h), state

        loss_1, h_1, state_1 = run(None)
        loss_8, h_8, state_8 = run(make_mesh(8))
        np.testing.assert_allclose(loss_1, loss_8, rtol=1e-5)
        # Global relative L2 for the carry: the second segment runs on
        # params already updated once, so the sharded-reduction-order
        # noise of that update (see tolerance note below) propagates into
        # the hidden state; elementwise rtol is meaningless on its
        # near-zero entries.
        h_rel = np.linalg.norm(h_1 - h_8) / np.linalg.norm(h_1)
        assert h_rel < 5e-3, f"carried TGRU state diverged: {h_rel}"
        va = np.concatenate(
            [np.asarray(x).ravel() for x in jax.tree.leaves(state_1.params)]
        )
        vb = np.concatenate(
            [np.asarray(x).ravel() for x in jax.tree.leaves(state_8.params)]
        )
        rel = np.linalg.norm(va - vb) / np.linalg.norm(va)
        # Same reduction-order tolerance rationale as
        # test_data_parallel_matches_single_device.
        assert rel < 5e-3, f"params diverged after 2 carried segments: {rel}"

    def test_loop_with_tbptt(self, tmp_path):
        import dataclasses as dc

        from tinyrecurrentunet_tpu.train.loop import train

        cfg = small_config(tbptt_segment_sec=0.25)
        cfg = dc.replace(
            cfg,
            train=dc.replace(
                cfg.train,
                log=LogConfig(
                    directory=str(tmp_path), iters_per_ckpt=100, iters_per_valid=1
                ),
            ),
        )
        ds = SyntheticPairDataset(num_items=2, length_sec=0.5, sample_rate=16000)
        state, metrics = train(cfg, dataset=ds, max_iters=2, log_dir=str(tmp_path / "l"))
        assert np.isfinite(float(metrics["loss"]))
        # 2 loader batches * 2 segments each = 4 optimizer updates... the
        # loop counts batches; each batch ran 2 segment updates.
        assert int(state.step) >= 2


class TestDeterminism:
    def test_same_seed_same_params(self):
        """Two runs with the same PRNG seeds produce bit-identical params —
        the SPMD-world replacement for the reference's by-convention
        ordering of gradient hooks (SURVEY.md §5 race-detection note)."""
        cfg = small_config()
        ds = SyntheticPairDataset(num_items=4, length_sec=0.5, sample_rate=16000)
        results = []
        for _ in range(2):
            state = create_train_state(cfg)
            step = make_train_step(cfg)
            rng = np.random.default_rng(7)
            for i in range(3):
                c, n, _ = ds.get(i % 4, rng)
                state, _ = step(state, jnp.asarray(c[None]), jnp.asarray(n[None]))
            results.append(jax.device_get(state.params))
        for a, b in zip(jax.tree.leaves(results[0]), jax.tree.leaves(results[1])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_train_loop_device_corpus_path_deterministic(self, tmp_path):
        """VERDICT r2 weak #1: two runs of train() itself through the
        flagship on-device corpus-cache path (seeded epoch shuffle) must
        produce bit-identical params — the round-2 suite only tested the
        step function, bypassing the loop's (then-unseeded) shuffle."""
        import dataclasses as dc

        from tinyrecurrentunet_tpu.train.loop import train

        results = []
        for run in range(2):
            cfg = small_config(batch_size_per_device=2, seed=11)
            cfg = dc.replace(
                cfg,
                train=dc.replace(
                    cfg.train,
                    log=LogConfig(
                        directory=str(tmp_path / f"run{run}"),
                        iters_per_ckpt=100,
                        iters_per_valid=100,
                    ),
                ),
            )
            ds = SyntheticPairDataset(num_items=8, length_sec=0.5, sample_rate=16000)
            assert ds.device_cacheable  # must exercise the corpus path
            state, _ = train(
                cfg, dataset=ds, max_iters=4, log_dir=str(tmp_path / f"logs{run}")
            )
            results.append(jax.device_get(state.params))
        for a, b in zip(jax.tree.leaves(results[0]), jax.tree.leaves(results[1])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        cfg = small_config()
        state = create_train_state(cfg)
        mgr = CheckpointManager(str(tmp_path), "TRUNet")
        mgr.save(5, jax.device_get(state), training_time_seconds=42)
        mgr.save(10, jax.device_get(state), training_time_seconds=99)

        fresh = create_train_state(cfg)
        restored, step, seconds = mgr.restore(fresh, "max")
        assert step == 10 and seconds == 99
        for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        _, step5, s5 = mgr.restore(fresh, 5)
        assert step5 == 5 and s5 == 42
        mgr.close()

    def test_restore_missing_is_fresh_start(self, tmp_path):
        cfg = small_config()
        state = create_train_state(cfg)
        mgr = CheckpointManager(str(tmp_path), "TRUNet")
        restored, step, seconds = mgr.restore(state, "max")
        assert step == -1 and seconds == 0
        mgr.close()

    def test_pretrained_npz(self, tmp_path):
        from tinyrecurrentunet_tpu.train.checkpoint import (
            load_pretrained_params,
            save_pretrained_params,
        )

        cfg = small_config()
        state = create_train_state(cfg)
        save_pretrained_params(str(tmp_path), jax.device_get(state.params))
        loaded = load_pretrained_params(str(tmp_path), state.params)
        for a, b in zip(jax.tree.leaves(loaded), jax.tree.leaves(state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestTrainLoop:
    def test_end_to_end_short_run(self, tmp_path):
        """3-iteration training run through the real loop: metrics written,
        checkpoint saved, resume works."""
        import dataclasses as dc

        from tinyrecurrentunet_tpu.train.loop import train

        cfg = small_config()
        cfg = dc.replace(
            cfg,
            train=dc.replace(
                cfg.train,
                log=LogConfig(
                    directory=str(tmp_path), iters_per_ckpt=2, iters_per_valid=1
                ),
            ),
        )
        ds = SyntheticPairDataset(num_items=4, length_sec=0.5, sample_rate=16000)
        vds = SyntheticPairDataset(num_items=2, length_sec=0.5, sample_rate=16000, seed=9)
        state, metrics = train(
            cfg, dataset=ds, max_iters=3, log_dir=str(tmp_path / "logs"),
            valid_dataset=vds,
        )
        assert np.isfinite(float(metrics["loss"]))
        assert "valid_loss" in metrics and np.isfinite(metrics["valid_loss"])
        assert int(state.step) == 3
        # resume continues from the saved step
        state2, _ = train(cfg, dataset=ds, max_iters=5, log_dir=str(tmp_path / "logs"))
        assert int(state2.step) == 5


class TestTrainComputeDtype:
    """OptimizationConfig.train_compute_dtype: bf16 forward pass during
    training only (the SCALING.json measured-best regime), f32 master
    weights, f32 export/eval untouched."""

    def test_bf16_train_keeps_f32_params_and_finite_loss(self, tmp_path):
        from tinyrecurrentunet_tpu.train.loop import train

        cfg = small_config(
            batch_size_per_device=2, train_compute_dtype="bfloat16"
        )
        cfg = dataclasses.replace(
            cfg,
            train=dataclasses.replace(
                cfg.train,
                log=LogConfig(
                    directory=str(tmp_path), iters_per_ckpt=100, iters_per_valid=1
                ),
            ),
        )
        ds = SyntheticPairDataset(num_items=4, length_sec=0.5, sample_rate=16000)
        state, metrics = train(
            cfg, dataset=ds, max_iters=2, log_dir=str(tmp_path / "l")
        )
        assert np.isfinite(float(metrics["loss"]))
        for leaf in jax.tree.leaves(state.params):
            assert leaf.dtype == jnp.float32
