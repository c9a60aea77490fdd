"""Checkpoint save/restore via Orbax.

Reference contract (reference `train.py:155-161`, `util.py:30-49`,
`denoise.py:58-66`): checkpoints live under <directory>/<exp_path>/checkpoint,
saved every iters_per_ckpt with {iter, model state, optimizer state,
training_time_seconds}; consumers select 'max' (latest), an explicit
iteration, or 'pretrained'. Restore rebuilds the LR schedule implicitly —
our schedule is a pure function of the step counter stored in the state.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from tinyrecurrentunet_tpu.train.state import TrainState


def checkpoint_dir(log_directory: str, exp_path: str) -> str:
    return os.path.join(os.path.abspath(log_directory), exp_path, "checkpoint")


def find_max_iter(directory: str) -> int:
    """Latest checkpoint step in `directory`, -1 if none
    (reference `util.py:30-49` semantics)."""
    if not os.path.isdir(directory):
        return -1
    best = -1
    for name in os.listdir(directory):
        try:
            best = max(best, int(name))
        except ValueError:
            continue
    return best


class CheckpointManager:
    """Thin Orbax wrapper with the reference's selector semantics."""

    def __init__(self, log_directory: str, exp_path: str, max_to_keep: int | None = None):
        self.directory = checkpoint_dir(log_directory, exp_path)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: TrainState, training_time_seconds: int = 0):
        payload = {
            "state": state,
            "meta": {"iter": step, "training_time_seconds": training_time_seconds},
        }
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        self._mgr.wait_until_finished()

    def resolve_step(self, selector: str | int) -> int:
        """'max' -> latest step (-1 if none); int/int-string -> that step."""
        if selector == "max":
            latest = self._mgr.latest_step()
            return -1 if latest is None else latest
        return int(selector)

    def restore(self, target_state: TrainState, selector: str | int = "max"):
        """Restore into the structure of `target_state`.

        Returns (state, step, training_time_seconds) or (target_state, -1, 0)
        when there is nothing to restore (fresh start, reference
        `train.py:77-95` fallback).
        """
        step = self.resolve_step(selector)
        if step < 0 or step not in self._mgr.all_steps():
            return target_state, -1, 0
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target_state)
        payload = self._mgr.restore(
            step,
            args=ocp.args.StandardRestore(
                {"state": abstract, "meta": {"iter": 0, "training_time_seconds": 0}}
            ),
        )
        meta = payload["meta"]
        return payload["state"], int(meta["iter"]), int(meta["training_time_seconds"])

    def all_steps(self):
        return sorted(self._mgr.all_steps())

    def close(self):
        self._mgr.close()


def artifact_meta(cfg) -> dict:
    """The settings a weights artifact must agree on with its loader.

    phm_source is the load-bearing one (ADVICE r2 medium: weights trained
    with one PHM head decode as garbage under another with no error); the
    rest make mismatches diagnosable.
    """
    return {
        "phm_source": cfg.network.phm_source,
        "channels": ",".join(cfg.featurizer.channels),
        "sample_rate": cfg.featurizer.sample_rate,
    }


def check_artifact_meta(meta: dict, cfg, artifact: str):
    """Raise when a recorded artifact setting contradicts the config."""
    if not meta:
        return  # pre-round-3 artifact: nothing recorded, nothing to check
    expected = artifact_meta(cfg)
    # sample_rate included (ADVICE r3: the 48 kHz artifact loaded under a
    # 16 kHz config passed silently — identical shapes, wrong featurizer).
    for key in ("phm_source", "channels", "sample_rate"):
        recorded = str(meta.get(key, "")) or None
        if recorded and recorded != str(expected[key]):
            raise ValueError(
                f"{artifact} was trained with {key}={recorded!r} but the "
                f"config says {expected[key]!r} — loading it would silently "
                f"decode with an incompatible head. Pin {key} in the config "
                "to the recorded value (or re-export the artifact)."
            )


def save_pretrained_params(
    directory: str, params: Any, batch_stats: Any = None, meta: dict | None = None
):
    """Standalone weights export (the reference's 'pretrained' selector,
    `denoise.py:63-65`) as an npz of flattened leaves.

    When `batch_stats` is given, the BN running statistics are stored too
    (under a `batch_stats/` prefix) — inference-time BN uses running stats,
    so a params-only artifact would silently denoise with init-time
    (zero-mean/unit-var) normalizers. `meta` (see `artifact_meta`) records
    the decode-critical settings under a `meta/` prefix so loads validate.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    arrays = {
        "params/" + "/".join(str(k) for k in path): np.asarray(v)
        for path, v in flat
    }
    if batch_stats is not None:
        flat_bs = jax.tree_util.tree_flatten_with_path(batch_stats)[0]
        arrays.update(
            {
                "batch_stats/" + "/".join(str(k) for k in path): np.asarray(v)
                for path, v in flat_bs
            }
        )
    for key, value in (meta or {}).items():
        arrays[f"meta/{key}"] = np.asarray(value)
    os.makedirs(directory, exist_ok=True)
    np.savez(os.path.join(directory, "pretrained.npz"), **arrays)


def _load_section(data, prefix: str, target: Any):
    flat, treedef = jax.tree_util.tree_flatten_with_path(target)
    leaves = []
    for path, v in flat:
        key = prefix + "/".join(str(k) for k in path)
        if key not in data and prefix == "params/":
            # legacy (round-1) artifacts stored params unprefixed
            key = "/".join(str(k) for k in path)
        arr = data[key]
        if arr.shape != v.shape:
            raise ValueError(f"shape mismatch for {key}: {arr.shape} vs {v.shape}")
        leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def load_pretrained_params(directory: str, target_params: Any):
    """Load the params section back into `target_params`' structure."""
    data = np.load(os.path.join(directory, "pretrained.npz"))
    return _load_section(data, "params/", target_params)


def load_pretrained_meta(directory: str) -> dict:
    """The artifact's recorded `meta/` entries ({} for older artifacts)."""
    data = np.load(os.path.join(directory, "pretrained.npz"))
    return {
        k[len("meta/") :]: data[k][()]
        for k in data.files
        if k.startswith("meta/")
    }


def load_pretrained_variables(
    directory: str, target_params: Any, target_batch_stats: Any, cfg=None
):
    """Load (params, batch_stats); batch_stats falls back to the target's
    values when the artifact predates batch-stats storage. When `cfg` is
    given, the artifact's recorded meta is validated against it
    (`check_artifact_meta`)."""
    data = np.load(os.path.join(directory, "pretrained.npz"))
    if cfg is not None:
        meta = {
            k[len("meta/") :]: data[k][()]
            for k in data.files
            if k.startswith("meta/")
        }
        check_artifact_meta(meta, cfg, os.path.join(directory, "pretrained.npz"))
    params = _load_section(data, "params/", target_params)
    if any(k.startswith("batch_stats/") for k in data.files):
        batch_stats = _load_section(data, "batch_stats/", target_batch_stats)
    else:
        batch_stats = target_batch_stats
    return params, batch_stats
