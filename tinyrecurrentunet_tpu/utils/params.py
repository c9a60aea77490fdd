"""Parameter accounting (reference `util.py:52-70` print_size)."""

from __future__ import annotations

import jax
import numpy as np


def count_params(tree) -> int:
    return int(sum(np.prod(x.shape) for x in jax.tree.leaves(tree)))


def print_size(params, name: str = "TRUNet", keyword: str | None = None) -> int:
    n = count_params(params)
    print(f"{name} Parameters: {n / 1e6:.6f}M", flush=True, end="; ")
    if keyword is not None:
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        kn = sum(
            int(np.prod(v.shape))
            for path, v in flat
            if keyword in "/".join(str(p) for p in path)
        )
        print(f"{keyword} Parameters: {kn / 1e6:.6f}M", flush=True, end="; ")
    print(" ")
    return n
