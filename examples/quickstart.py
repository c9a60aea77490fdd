"""Quickstart: train -> denoise -> stream -> export, end to end, no corpus.

Runs on one TPU chip (or CPU) using the procedural synthetic dataset.

    python examples/quickstart.py [--iters 2000]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=500)
    args = parser.parse_args()

    from tinyrecurrentunet_tpu.config import LogConfig, load_config
    from tinyrecurrentunet_tpu.data import SyntheticPairDataset
    from tinyrecurrentunet_tpu.infer.denoise import Denoiser
    from tinyrecurrentunet_tpu.infer.metrics import si_sdr
    from tinyrecurrentunet_tpu.infer.streaming import StreamingDenoiser
    from tinyrecurrentunet_tpu.train.loop import train

    workdir = tempfile.mkdtemp(prefix="trunet_quickstart_")
    cfg = load_config("config/synthetic16k.json")
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(
            cfg.train,
            log=LogConfig(
                directory=f"{workdir}/ckpt",
                iters_per_ckpt=max(args.iters // 2, 1),
                iters_per_valid=max(args.iters // 10, 1),
            ),
        ),
    )

    # 1. train on synthetic clean/noisy pairs, with held-out validation
    train_ds = SyntheticPairDataset(1024, 2.0, 16000, seed=0)
    valid_ds = SyntheticPairDataset(16, 2.0, 16000, seed=999)
    print(f"training {args.iters} iterations (ckpts under {workdir})...")
    train(cfg, dataset=train_ds, valid_dataset=valid_ds, max_iters=args.iters,
          log_dir=f"{workdir}/logs")

    # 2. offline denoise a held-out clip
    test_ds = SyntheticPairDataset(4, 2.0, 16000, seed=555)
    clean, noisy, _ = test_ds.get(0, np.random.default_rng(0))
    denoiser = Denoiser.from_checkpoint(cfg, "max")
    enhanced = denoiser(noisy)
    print(f"offline:   SI-SDR {si_sdr(noisy, clean):.2f} dB -> "
          f"{si_sdr(enhanced, clean):.2f} dB")

    # 3. stream the same clip block-by-block with carried state
    sd = StreamingDenoiser(cfg, denoiser.variables)
    streamed, _ = sd.process(noisy)
    print(f"streaming: SI-SDR {si_sdr(streamed[384:], clean[:len(streamed)-384]):.2f} dB "
          f"(3-hop latency compensated)")

    # 4. export: int8 param pack + StableHLO graphs
    from tinyrecurrentunet_tpu.export.export import export_stablehlo
    from tinyrecurrentunet_tpu.export.quantize import save_quantized

    paths = export_stablehlo(cfg, denoiser.variables, f"{workdir}/export")
    size = save_quantized(
        f"{workdir}/export/model_int8.trq",
        denoiser.variables["params"],
        denoiser.variables["batch_stats"],
    )
    print(f"exported: {list(paths)} + int8 pack ({size/1024:.0f} KB) under {workdir}/export")


if __name__ == "__main__":
    main()
