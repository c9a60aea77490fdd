"""Snapshot a training checkpoint as a standalone pretrained.npz artifact.

The reference ships (aspirationally) a 'pretrained' checkpoint selectable at
inference (reference `denoise.py:59-65`, `config/tiny.json:16`); this CLI
produces that artifact from an Orbax checkpoint: params + BN running stats,
one small npz, loadable without the optimizer state or the checkpoint tree
(`infer.quality.denoiser_from_pretrained`, bench.py quality fields).

Usage:
    python -m tinyrecurrentunet_tpu.train.export_pretrained \
        -c config/proc16k.json [--ckpt_iter max] --out artifacts/TRUNet-proc
"""

from __future__ import annotations

import argparse
import os

import jax

from tinyrecurrentunet_tpu.config import load_config
from tinyrecurrentunet_tpu.train.checkpoint import (
    CheckpointManager,
    artifact_meta,
    save_pretrained_params,
)
from tinyrecurrentunet_tpu.train.state import create_train_state


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", required=True)
    parser.add_argument("--ckpt_iter", default="max", help="max | iteration")
    parser.add_argument("--out", required=True, help="output directory")
    args = parser.parse_args()
    cfg = load_config(args.config)

    state = create_train_state(cfg)
    mgr = CheckpointManager(cfg.train.log.directory, cfg.train.exp_path)
    state, step, _ = mgr.restore(state, args.ckpt_iter)
    mgr.close()
    if step < 0:
        raise FileNotFoundError(
            f"no checkpoint for selector {args.ckpt_iter!r} under "
            f"{cfg.train.log.directory}/{cfg.train.exp_path}"
        )
    save_pretrained_params(
        args.out,
        jax.device_get(state.params),
        jax.device_get(state.batch_stats),
        meta=artifact_meta(cfg),
    )
    path = os.path.join(args.out, "pretrained.npz")
    print(f"wrote {path} ({os.path.getsize(path) / 1024:.1f} KB) from step {step}")


if __name__ == "__main__":
    main()
