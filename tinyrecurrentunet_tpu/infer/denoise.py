"""Offline denoising (reference `denoise.py:27-129`, defects D10/D11 fixed).

`Denoiser` wraps a trained state into one jitted full-clip program
(featurize -> TRUNet -> PHM -> iSTFT); the CLI walks the testing subset and
writes `enhanced_<fileid>.wav` files with the reference's directory layout.

Usage:
    python -m tinyrecurrentunet_tpu.infer.denoise -c config/tiny16k.json \
        [--ckpt_iter max|N] [--subset testing] [--input file.wav -o out.wav]
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from tinyrecurrentunet_tpu.config import Config, load_config
from tinyrecurrentunet_tpu.data import CleanNoisyPairDataset
from tinyrecurrentunet_tpu.data.audio_io import read_wav, write_wav
from tinyrecurrentunet_tpu.models import TRUNet
from tinyrecurrentunet_tpu.models.phm import denoise_output_to_audio
from tinyrecurrentunet_tpu.signal import Featurizer
from tinyrecurrentunet_tpu.train.checkpoint import CheckpointManager
from tinyrecurrentunet_tpu.train.state import create_train_state


class Denoiser:
    """Full-clip denoiser with a compile cache per input length."""

    def __init__(self, cfg: Config, variables: dict):
        self.cfg = cfg
        self.model = TRUNet(cfg.network)
        self.featurizer = Featurizer(cfg.featurizer)
        # Pin the weights on device ONCE. Loaders hand numpy trees
        # (pretrained.npz, dequantized .trq), and jit re-transfers numpy
        # arguments on EVERY call: measured 15 ms/call host->device upload
        # for the 17 MB large16k tree — 60x the whole per-block budget —
        # and each upload is leaked by the tunnel plugin (CLAUDE.md).
        self.variables = jax.device_put(variables)

        def run(variables, audio):
            spec = self.featurizer.spectrogram(audio)
            feats = self.featurizer.features_from_spec(spec)
            output, _ = self.model.apply(variables, feats)
            return denoise_output_to_audio(
                output,
                self.featurizer,
                cfg.network,
                length=audio.shape[-1],
                mixture_spec=spec,
            )

        self._run = jax.jit(run)

    @classmethod
    def from_checkpoint(cls, cfg: Config, ckpt_iter: str | int | None = None):
        """Restore from cfg.train.log directory with max/int/'pretrained'
        selector semantics (reference `denoise.py:58-66`)."""
        state = create_train_state(cfg)
        selector = ckpt_iter if ckpt_iter is not None else cfg.train.log.ckpt_iter
        if selector == "pretrained":
            from tinyrecurrentunet_tpu.train.checkpoint import (
                load_pretrained_variables,
            )

            directory = os.path.join(cfg.train.log.directory, cfg.train.exp_path)
            params, batch_stats = load_pretrained_variables(
                directory, state.params, state.batch_stats, cfg=cfg
            )
            state = state.replace(params=params, batch_stats=batch_stats)
            step = "pretrained"
        else:
            mgr = CheckpointManager(cfg.train.log.directory, cfg.train.exp_path)
            state, step, _ = mgr.restore(state, selector)
            mgr.close()
            if step < 0:
                raise FileNotFoundError(
                    f"no checkpoint for selector {selector!r} under "
                    f"{cfg.train.log.directory}/{cfg.train.exp_path}"
                )
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        denoiser = cls(cfg, variables)
        denoiser.ckpt_step = step
        return denoiser

    def __call__(self, audio: np.ndarray) -> np.ndarray:
        """Denoise one waveform (L,) -> (L,).

        Lengths are padded up to a bucket (hop-aligned powers-of-two-ish
        ladder) so a directory of varied-length files triggers a bounded
        number of compiles instead of one per length.
        """
        hop = self.cfg.featurizer.hop_length
        length = len(audio)
        bucket = self._bucket(length, hop)
        audio = np.pad(audio, (0, bucket - length))
        out = self._run(self.variables, jnp.asarray(audio))
        return np.asarray(out)[:length]

    @staticmethod
    def _bucket(length: int, hop: int) -> int:
        """Smallest hop-multiple >= length on a 1/8-step geometric ladder."""
        min_len = 8 * hop
        if length <= min_len:
            return min_len
        size = min_len
        while size < length:
            size += max(size // 8, hop)
        return ((size + hop - 1) // hop) * hop


def denoise_directory(
    cfg: Config, ckpt_iter=None, subset: str = "testing", dump: bool = True
):
    """Denoise the testing subset; returns list of (fileid, enhanced) and
    optionally writes exp/<exp_path>/speech/<step>/enhanced_<id>.wav
    (reference `denoise.py:82-95` layout)."""
    denoiser = Denoiser.from_checkpoint(cfg, ckpt_iter)
    dataset = CleanNoisyPairDataset(cfg.trainset, subset=subset)
    out_dir = os.path.join(
        cfg.gen.output_directory,
        cfg.train.exp_path,
        "speech",
        str(denoiser.ckpt_step),
    )
    if dump:
        os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    results = []
    for i in range(len(dataset)):
        _, noisy, fileid = dataset.get(i, rng)
        enhanced = denoiser(noisy)
        if dump:
            write_wav(
                os.path.join(out_dir, f"enhanced_{fileid}"),
                enhanced,
                cfg.trainset.sample_rate,
            )
        results.append((fileid, enhanced))
    return results


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", required=True)
    parser.add_argument("--ckpt_iter", default=None, help="max | iteration | pretrained")
    parser.add_argument("--subset", default="testing")
    parser.add_argument("--input", default=None, help="denoise a single WAV instead")
    parser.add_argument("-o", "--output", default=None)
    parser.add_argument(
        "--random_init",
        action="store_true",
        help="skip checkpoint restore (smoke tests)",
    )
    args = parser.parse_args()
    cfg = load_config(args.config)

    if args.input:
        if args.random_init:
            state = create_train_state(cfg)
            denoiser = Denoiser(
                cfg, {"params": state.params, "batch_stats": state.batch_stats}
            )
        else:
            denoiser = Denoiser.from_checkpoint(cfg, args.ckpt_iter)
        audio, sr = read_wav(args.input)
        if audio.ndim > 1:
            audio = audio[0]
        if sr != cfg.trainset.sample_rate:
            raise ValueError(
                f"input is {sr} Hz but config expects {cfg.trainset.sample_rate} Hz"
            )
        out = denoiser(audio)
        out_path = args.output or args.input.replace(".wav", "_enhanced.wav")
        write_wav(out_path, out, sr)
        print(f"wrote {out_path} ({len(out)} samples)")
    else:
        results = denoise_directory(cfg, args.ckpt_iter, args.subset)
        print(f"denoised {len(results)} files")


if __name__ == "__main__":
    main()
