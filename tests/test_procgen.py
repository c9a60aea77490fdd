"""Procedural corpus (data/procgen.py): generators, SNR math, DNS layout.

The procedural corpus is the quality-parity stand-in for DNS-2020
(reference `dataset.py:301-390`, `eval.py:16-37`); these tests pin down the
properties the training/eval pipelines rely on: determinism, fixed shapes,
calibrated SNR, and a testset tree the unmodified DNS pipeline can walk.
"""

import numpy as np
import pytest

from tinyrecurrentunet_tpu.data.procgen import (
    ADDITIVE_KINDS,
    NOISE_KINDS,
    TRAIN_KIND_SCHEDULE,
    ProceduralSpeechDataset,
    degrade,
    materialize_dns_testset,
    mix_at_snr,
    reverberate,
    synth_noise,
    synth_rir,
    synth_speech,
)

SR = 16000


class TestGenerators:
    def test_speech_shape_and_level(self):
        rng = np.random.default_rng(0)
        s = synth_speech(rng, 2 * SR, SR)
        assert s.shape == (2 * SR,) and s.dtype == np.float32
        rms = float(np.sqrt(np.mean(s**2)))
        assert 0.01 < rms < 0.3
        assert float(np.abs(s).max()) < 4.0

    def test_speech_is_speech_shaped(self):
        """Energy concentrates below 4 kHz (formants), and the envelope is
        modulated (syllables) — the two properties PCEN/masking exploit."""
        rng = np.random.default_rng(1)
        s = synth_speech(rng, 4 * SR, SR).astype(np.float64)
        spec = np.abs(np.fft.rfft(s))
        f = np.fft.rfftfreq(len(s), 1 / SR)
        low = np.sum(spec[f < 4000] ** 2)
        assert low / np.sum(spec**2) > 0.75
        # envelope modulation: frame energies vary by > 10x
        frames = s[: len(s) // 1600 * 1600].reshape(-1, 1600)
        e = np.sqrt(np.mean(frames**2, axis=1))
        assert e.max() > 10 * max(np.median(e), 1e-6) or e.min() < 0.1 * e.max()

    @pytest.mark.parametrize("kind", ADDITIVE_KINDS)
    def test_noise_kinds(self, kind):
        rng = np.random.default_rng(2)
        n = synth_noise(rng, SR, SR, kind)
        assert n.shape == (SR,) and n.dtype == np.float32
        assert abs(float(np.sqrt(np.mean(n**2))) - 1.0) < 1e-3

    def test_reverb_is_not_additive(self):
        """'reverb' lives in NOISE_KINDS (corpus round-robin) but not in
        ADDITIVE_KINDS — synth_noise must refuse it."""
        assert "reverb" in NOISE_KINDS and "reverb" not in ADDITIVE_KINDS
        with pytest.raises(ValueError):
            synth_noise(np.random.default_rng(0), SR, SR, "reverb")

    def test_rir_shape_and_decay(self):
        """Direct path is unit, the tail decays ~-60 dB by RT60, and the
        DRR calibration holds."""
        rng = np.random.default_rng(5)
        rt60, drr = 0.4, 3.0
        rir = synth_rir(rng, SR, rt60=rt60, drr_db=drr)
        assert rir.dtype == np.float32 and rir[0] == 1.0
        assert len(rir) == int(rt60 * SR)
        got_drr = 10 * np.log10(1.0 / (np.sum(rir[1:].astype(np.float64) ** 2)))
        assert abs(got_drr - drr) < 0.2
        # envelope at the end is ~60 dB below the envelope near the start
        head = np.max(np.abs(rir[SR // 100 : SR // 25]))
        tail = np.max(np.abs(rir[-len(rir) // 20 :]))
        assert tail < head * 10 ** (-30 / 20)  # at least -30 dB down

    def test_reverberate_and_degrade(self):
        rng = np.random.default_rng(6)
        clean = synth_speech(rng, 2 * SR, SR)
        rir = synth_rir(rng, SR, rt60=0.3, drr_db=0.0)
        wet = reverberate(clean, rir)
        assert wet.shape == clean.shape and wet.dtype == np.float32
        assert not np.allclose(wet, clean)
        # degrade() dispatches reverb -> convolution, additive -> mixing
        noisy_r, rt = degrade(clean, np.random.default_rng(7), SR, "reverb", (0, 20))
        assert 0.2 <= rt <= 0.9
        noisy_a, snr = degrade(clean, np.random.default_rng(7), SR, "white", (0, 20))
        assert 0.0 <= snr <= 20.0
        # the reverberant mixture is correlated with clean but degraded
        from tinyrecurrentunet_tpu.infer.metrics import si_sdr

        assert si_sdr(noisy_r, clean) < 15.0

    def test_make_item_pair_reverb_targets_early_reflections(self):
        """Reverberant items target direct+early (50 ms) reverb, not the
        dry clean (VERDICT r3 weak #3: the dry target punished unfixable
        smearing), and noisy_reverb adds calibrated noise ON TOP of the
        wet speech."""
        from tinyrecurrentunet_tpu.data.procgen import (
            EARLY_RIR_SEC,
            make_item_pair,
        )

        rng = np.random.default_rng(8)
        clean = synth_speech(rng, 2 * SR, SR)
        target, wet, info = make_item_pair(
            clean, np.random.default_rng(9), SR, "reverb", (-5, 25)
        )
        assert info["kind"] == "reverb" and 0.2 <= info["rt60"] <= 0.9
        assert "snr_db" not in info
        # target is reverberant (≠ dry clean) but FAR closer to clean than
        # the full-tail wet signal
        from tinyrecurrentunet_tpu.infer.metrics import si_sdr

        assert not np.array_equal(target, clean)
        assert si_sdr(target, clean) > si_sdr(wet, clean) + 1.5
        # the early-reflection window really is 50 ms: an impulse through
        # make_item_pair's target path has no energy beyond EARLY_RIR_SEC
        # + the direct sample (checked via the library function)
        from tinyrecurrentunet_tpu.data.procgen import (
            early_reverb_target,
            synth_rir,
        )

        rir = synth_rir(np.random.default_rng(10), SR, rt60=0.6)
        imp = np.zeros(SR, np.float32)
        imp[0] = 1.0
        et = early_reverb_target(imp, rir, SR)
        head = int(EARLY_RIR_SEC * SR)
        assert np.allclose(et[head:], 0.0)

        t2, nw, info2 = make_item_pair(
            clean, np.random.default_rng(11), SR, "noisy_reverb", (5.0, 5.0)
        )
        assert info2["kind"] == "noisy_reverb"
        assert "rt60" in info2 and info2["snr_db"] == 5.0
        # the additive part is calibrated against the WET power: noise
        # residual = nw - wet2, and 10log10(P_wet/P_noise) == 5 dB. We
        # can't reconstruct wet2 here (private rng draws), but nw must
        # differ from a pure reverb item and from clean.
        assert not np.array_equal(nw, t2)

    def test_kind_schedule_reverberant_fraction(self):
        """~4/11 of corpus items are reverberant (VERDICT r3: 1/8 was too
        thin for the paper's co-equal dereverberation task)."""
        from tinyrecurrentunet_tpu.data.procgen import KIND_SCHEDULE, REVERB_KINDS

        frac = sum(k in REVERB_KINDS for k in KIND_SCHEDULE) / len(KIND_SCHEDULE)
        assert 0.25 <= frac <= 0.5
        # every kind still appears
        assert set(KIND_SCHEDULE) == set(NOISE_KINDS)

    def test_train_kind_schedule_oversamples_pure_reverb(self):
        """Training oversamples pure 'reverb' (round 4: at 4/11 the model
        passed reverb through, -0.06 dB vs a +3.4 dB ideal-mask oracle);
        the eval schedule stays KIND_SCHEDULE so testsets are unchanged."""
        from tinyrecurrentunet_tpu.data.procgen import (
            TRAIN_KIND_SCHEDULE,
            REVERB_KINDS,
        )

        pure = TRAIN_KIND_SCHEDULE.count("reverb") / len(TRAIN_KIND_SCHEDULE)
        total = sum(
            k in REVERB_KINDS for k in TRAIN_KIND_SCHEDULE
        ) / len(TRAIN_KIND_SCHEDULE)
        assert pure >= 0.2 and 0.3 <= total <= 0.5
        assert set(TRAIN_KIND_SCHEDULE) == set(NOISE_KINDS)

    def test_train_drr_range_wetter_than_eval(self):
        """The training DRR draw reaches below synth_rir's eval default
        floor (-2 dB) so strong late tails are represented, and the
        dataset's reverb items actually differ from the eval draw."""
        from tinyrecurrentunet_tpu.data.procgen import (
            TRAIN_DRR_RANGE,
            TRAIN_KIND_SCHEDULE,
            make_item_pair,
        )

        assert TRAIN_DRR_RANGE[0] < -2.0 <= TRAIN_DRR_RANGE[1]
        rng1 = np.random.default_rng(42)
        rng2 = np.random.default_rng(42)
        clean = synth_speech(np.random.default_rng(1), SR // 2, SR)
        idx = TRAIN_KIND_SCHEDULE.index("reverb")
        assert TRAIN_KIND_SCHEDULE[idx] == "reverb"
        t1, w1, _ = make_item_pair(
            clean, rng1, SR, "reverb", (-5.0, 25.0), drr_range=(-6.0, -5.9)
        )
        t2, w2, _ = make_item_pair(clean, rng2, SR, "reverb", (-5.0, 25.0))
        # a -6 dB DRR tail carries visibly more energy than the default draw
        assert not np.allclose(w1, w2)

    def test_unknown_noise_kind_raises(self):
        with pytest.raises(ValueError):
            synth_noise(np.random.default_rng(0), SR, SR, "nope")

    def test_mix_at_snr_is_calibrated(self):
        rng = np.random.default_rng(3)
        clean = synth_speech(rng, 2 * SR, SR)
        noise = synth_noise(rng, 2 * SR, SR, "white")
        for target in (0.0, 10.0, 20.0):
            noisy = mix_at_snr(clean, noise, target)
            resid = noisy.astype(np.float64) - clean
            got = 10 * np.log10(np.mean(clean.astype(np.float64) ** 2) / np.mean(resid**2))
            assert abs(got - target) < 0.1


class TestProceduralDataset:
    def test_interface_and_determinism(self):
        ds = ProceduralSpeechDataset(num_items=4, length_sec=1.0, sample_rate=SR)
        assert len(ds) == 4
        c1, n1, fid = ds.get(2, np.random.default_rng(9))
        c2, n2, _ = ds.get(2, np.random.default_rng(11))  # rng must not matter
        assert fid == "proc_2"
        assert np.array_equal(c1, c2) and np.array_equal(n1, n2)
        assert c1.shape == (SR,) and n1.shape == (SR,)

    def test_cache_matches_uncached(self):
        a = ProceduralSpeechDataset(num_items=2, length_sec=0.5, cache=True)
        b = ProceduralSpeechDataset(num_items=2, length_sec=0.5, cache=False)
        ca, na, _ = a.get(1)
        ca2, na2, _ = a.get(1)  # cached second read
        cb, nb, _ = b.get(1)
        assert np.array_equal(ca, cb) and np.array_equal(na, nb)
        assert np.array_equal(ca, ca2) and np.array_equal(na, na2)

    def test_seeds_disjoint(self):
        a = ProceduralSpeechDataset(num_items=1, length_sec=0.5, seed=0)
        b = ProceduralSpeechDataset(num_items=1, length_sec=0.5, seed=6_000_000)
        assert not np.array_equal(a.get(0)[0], b.get(0)[0])

    def test_kind_schedule_override(self):
        """Round-5b lever isolation: kind_schedule=('reverb',) must make
        EVERY item a reverb item, bit-identical to the default-schedule
        dataset at indices whose default kind is already 'reverb' (kind
        only steers the degradation branch; the clean draw is untouched)."""
        n = len(TRAIN_KIND_SCHEDULE)
        base = ProceduralSpeechDataset(num_items=n, length_sec=0.5, cache=False)
        diag = ProceduralSpeechDataset(
            num_items=n, length_sec=0.5, cache=False, kind_schedule=("reverb",)
        )
        explicit = ProceduralSpeechDataset(
            num_items=n, length_sec=0.5, cache=False,
            kind_schedule=TRAIN_KIND_SCHEDULE,
        )
        rev = TRAIN_KIND_SCHEDULE.index("reverb")
        other = TRAIN_KIND_SCHEDULE.index("white")
        # identical where the default schedule already lands on reverb
        assert np.array_equal(base.get(rev)[1], diag.get(rev)[1])
        # different where it doesn't
        assert not np.array_equal(base.get(other)[1], diag.get(other)[1])
        # explicit default schedule reproduces the default exactly
        for i in range(n):
            assert np.array_equal(base.get(i)[1], explicit.get(i)[1])

    def test_babble_style_knob(self):
        """babble_style='eval' must change babble items only; non-babble
        items are bit-identical to the diverse-crowd default."""
        n = len(TRAIN_KIND_SCHEDULE)
        dv = ProceduralSpeechDataset(num_items=n, length_sec=0.5, cache=False)
        ev = ProceduralSpeechDataset(
            num_items=n, length_sec=0.5, cache=False, babble_style="eval"
        )
        bab = TRAIN_KIND_SCHEDULE.index("babble")
        other = TRAIN_KIND_SCHEDULE.index("white")
        assert not np.array_equal(dv.get(bab)[1], ev.get(bab)[1])
        assert np.array_equal(dv.get(other)[1], ev.get(other)[1])

    def test_noise_kind_coverage(self):
        """Across consecutive indices every noise kind appears (round-robin)."""
        ds = ProceduralSpeechDataset(num_items=len(NOISE_KINDS), length_sec=0.5)
        diffs = []
        for i in range(len(ds)):
            c, n, _ = ds.get(i)
            diffs.append(n - c)
        # all residuals distinct (different generators)
        for i in range(len(diffs)):
            for j in range(i + 1, len(diffs)):
                assert not np.allclose(diffs[i], diffs[j])


class TestMaterializedTestset:
    def test_dns_layout_walks_through_pipeline(self, tmp_path):
        """The generated tree satisfies the DNS loader, the eval pairing,
        and the noisy-baseline scoring — end to end, no model."""
        root = materialize_dns_testset(
            str(tmp_path / "ts"), num_files=3, length_sec=1.0, sample_rate=SR
        )
        import os

        from tinyrecurrentunet_tpu.config import TrainsetConfig
        from tinyrecurrentunet_tpu.data.dataset import CleanNoisyPairDataset
        from tinyrecurrentunet_tpu.infer.evaluate import evaluate_dns

        clean_names = sorted(os.listdir(os.path.join(root, "clean")))
        assert clean_names == [f"clean_fileid_{i}.wav" for i in range(3)]

        cfg = TrainsetConfig(root=root, sample_rate=SR, crop_length_sec=0)
        ds = CleanNoisyPairDataset(cfg, subset="testing")
        assert len(ds) == 3
        clean, noisy, fid = ds.get(0, np.random.default_rng(0))
        assert clean.shape == noisy.shape == (SR,)
        assert fid.endswith("_0.wav")

        result = evaluate_dns(root, target="noisy", sample_rate=SR)
        assert result["num_files"] == 3
        # noisy baseline: SI-SDR equals the mixing SNR ballpark (0..20 dB)
        assert -5.0 < result["si_sdr"] < 25.0
        assert 0.0 < result["stoi"] <= 1.0

    def test_materialize_deterministic(self, tmp_path):
        from tinyrecurrentunet_tpu.data.audio_io import read_wav

        a = materialize_dns_testset(
            str(tmp_path / "a"), num_files=1, length_sec=0.5, sample_rate=SR
        )
        b = materialize_dns_testset(
            str(tmp_path / "b"), num_files=1, length_sec=0.5, sample_rate=SR
        )
        import os

        for sub in ("clean", "noisy"):
            fa = sorted(os.listdir(os.path.join(a, sub)))[0]
            fb = sorted(os.listdir(os.path.join(b, sub)))[0]
            assert fa == fb
            wa, _ = read_wav(os.path.join(a, sub, fa))
            wb, _ = read_wav(os.path.join(b, sub, fb))
            assert np.array_equal(wa, wb)


class TestDiverseBabble:
    """Training-only babble diversification (VERDICT r4 next #2): the
    training crowd draws from a wider synthesizer distribution than the
    target speaker; eval/testset babble recipes are untouched."""

    def test_deterministic_and_normalized(self):
        from tinyrecurrentunet_tpu.data.procgen import synth_noise

        a = synth_noise(
            np.random.default_rng(5), 16000, 16000, "babble",
            babble_style="diverse",
        )
        b = synth_noise(
            np.random.default_rng(5), 16000, 16000, "babble",
            babble_style="diverse",
        )
        np.testing.assert_array_equal(a, b)
        assert np.sqrt(np.mean(a**2)) == pytest.approx(1.0, rel=1e-3)

    def test_differs_from_eval_babble(self):
        from tinyrecurrentunet_tpu.data.procgen import synth_noise

        ev = synth_noise(np.random.default_rng(5), 16000, 16000, "babble")
        dv = synth_noise(
            np.random.default_rng(5), 16000, 16000, "babble",
            babble_style="diverse",
        )
        assert not np.allclose(ev, dv)

    def test_eval_recipe_unchanged_by_flag_default(self):
        """make_item_pair without babble_style reproduces the committed
        testset recipe bit-for-bit (testsets must not shift under the
        training-only diversification)."""
        from tinyrecurrentunet_tpu.data.procgen import make_item_pair, synth_speech

        rng1 = np.random.default_rng((7_000_000, 4))
        clean1 = synth_speech(rng1, 16000, 16000)
        t1, n1, i1 = make_item_pair(clean1, rng1, 16000, "babble", (-5.0, 25.0))
        rng2 = np.random.default_rng((7_000_000, 4))
        clean2 = synth_speech(rng2, 16000, 16000)
        t2, n2, i2 = make_item_pair(clean2, rng2, 16000, "babble", (-5.0, 25.0))
        np.testing.assert_array_equal(n1, n2)
        assert i1 == i2

    def test_training_dataset_uses_diverse_babble(self):
        """A ProceduralSpeechDataset babble item must differ from the same
        (seed, index) item built with the eval babble recipe."""
        from tinyrecurrentunet_tpu.data.procgen import (
            TRAIN_DRR_RANGE,
            TRAIN_KIND_SCHEDULE,
            ProceduralSpeechDataset,
            make_item_pair,
            synth_speech,
        )

        idx = TRAIN_KIND_SCHEDULE.index("babble")
        ds = ProceduralSpeechDataset(num_items=idx + 1, length_sec=1.0,
                                     sample_rate=16000, seed=3)
        _, noisy_train, _ = ds.get(idx)
        rng = np.random.default_rng((3, idx))
        clean = synth_speech(rng, 16000, 16000)
        _, noisy_eval, _ = make_item_pair(
            clean, rng, 16000, "babble", ds.snr_range, drr_range=TRAIN_DRR_RANGE
        )
        assert not np.allclose(noisy_train, noisy_eval)
