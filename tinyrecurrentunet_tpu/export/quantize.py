"""Int8 post-training quantization of model parameters.

The paper/reference claim a 362 KB int8 model (`README.md:6`). With 381,472
parameters, symmetric per-tensor int8 (1 byte/param + one fp32 scale per
tensor) lands at ~373 KB before container overhead — this module packs
exactly that, plus the dequantize-and-run path used by the parity harness.

BatchNorm running statistics are folded into the quantized pack as fp32
(they are statistics, not weights; int8-ing them costs accuracy for ~3 KB).
"""

from __future__ import annotations

import io
import os
import zipfile
from typing import Any

import jax
import numpy as np


def _flatten(tree: Any):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {"/".join(str(k) for k in path): np.asarray(v) for path, v in flat}


def quantize_params(params: Any):
    """-> dict name -> (int8 values, fp32 scale). Symmetric per-tensor."""
    out = {}
    for name, arr in _flatten(params).items():
        scale = float(np.max(np.abs(arr))) / 127.0
        if scale == 0.0:
            scale = 1.0
        q = np.clip(np.round(arr / scale), -127, 127).astype(np.int8)
        out[name] = (q, np.float32(scale))
    return out


def dequantize_params(quantized: dict, target_params: Any):
    """Rebuild a params pytree (fp32) from a quantized pack."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(target_params)
    leaves = []
    for path, v in flat:
        name = "/".join(str(k) for k in path)
        q, scale = quantized[name]
        arr = q.astype(np.float32) * scale
        if arr.shape != v.shape:
            raise ValueError(f"{name}: {arr.shape} != {v.shape}")
        leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_quantized(path: str, params: Any, batch_stats: Any | None = None) -> int:
    """Write a .trq zip pack; returns its size in bytes."""
    quantized = quantize_params(params)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, (q, scale) in quantized.items():
            buf = io.BytesIO()
            np.save(buf, q)
            zf.writestr(f"q/{name}", buf.getvalue())
            zf.writestr(f"scale/{name}", np.float32(scale).tobytes())
        if batch_stats is not None:
            for name, arr in _flatten(batch_stats).items():
                buf = io.BytesIO()
                np.save(buf, arr.astype(np.float32))
                zf.writestr(f"stats/{name}", buf.getvalue())
    return os.path.getsize(path)


def load_quantized(path: str):
    """-> (quantized dict, batch_stats dict-of-arrays by name)."""
    quantized: dict = {}
    stats: dict = {}
    with zipfile.ZipFile(path) as zf:
        for info in zf.infolist():
            kind, name = info.filename.split("/", 1)
            if kind == "q":
                quantized.setdefault(name, [None, None])[0] = np.load(
                    io.BytesIO(zf.read(info))
                )
            elif kind == "scale":
                quantized.setdefault(name, [None, None])[1] = np.frombuffer(
                    zf.read(info), np.float32
                )[0]
            elif kind == "stats":
                stats[name] = np.load(io.BytesIO(zf.read(info)))
    return {k: tuple(v) for k, v in quantized.items()}, stats


def restore_batch_stats(stats_by_name: dict, target_stats: Any):
    flat, treedef = jax.tree_util.tree_flatten_with_path(target_stats)
    leaves = []
    for path, v in flat:
        name = "/".join(str(k) for k in path)
        leaves.append(stats_by_name[name].reshape(v.shape))
    return jax.tree_util.tree_unflatten(treedef, leaves)
