"""Worker for the preemption-recovery test (run via subprocess).

Runs a tiny training job whose dataset sleeps per item so the parent can
SIGKILL it mid-run after the first checkpoint lands (phase 1), then runs
again to completion (phase 2) resuming from that checkpoint.

Usage: python _preempt_worker.py <workdir> <step_delay_sec>
"""

import sys
import time

import numpy as np  # noqa: F401


def main():
    workdir, delay = sys.argv[1], float(sys.argv[2])

    from tinyrecurrentunet_tpu.config import (
        Config,
        FeaturizerConfig,
        LogConfig,
        LossConfig,
        OptimizationConfig,
        STFTLossConfig,
        TrainConfig,
        TrainsetConfig,
    )
    from tinyrecurrentunet_tpu.data import SyntheticPairDataset
    from tinyrecurrentunet_tpu.train.loop import train

    cfg = Config(
        featurizer=FeaturizerConfig(sample_rate=16000),
        train=TrainConfig(
            exp_path="preempt",
            log=LogConfig(
                directory=workdir, iters_per_ckpt=10, iters_per_valid=5
            ),
            optimization=OptimizationConfig(
                n_iters=30, batch_size_per_device=2
            ),
            loss_config=LossConfig(
                stft_config=STFTLossConfig(
                    fft_sizes=(512,), hop_sizes=(120,), win_lengths=(240,)
                )
            ),
        ),
        trainset=TrainsetConfig(sample_rate=16000, crop_length_sec=0.5),
    )

    class SlowDataset(SyntheticPairDataset):
        # The on-device corpus cache would hoist all get() calls into the
        # one-time corpus build, defeating the per-step pacing this test
        # relies on (ADVICE r2) — force the per-step loader path.
        device_cacheable = False

        def get(self, index, rng=None):
            time.sleep(delay)
            return super().get(index, rng)

    ds = SlowDataset(num_items=8, length_sec=0.5, sample_rate=16000)
    train(cfg, dataset=ds, log_dir=f"{workdir}/logs")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
