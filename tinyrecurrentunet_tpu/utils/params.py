"""Parameter accounting (reference `util.py:52-70` print_size) and the
weight-rescaling initialization the reference carries as a capability
(reference `util.py:168-175`, arXiv 1911.13254)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def weight_scaling_init(params, alpha_mul: float = 10.0):
    """Rescale every (kernel, bias) pair by 1/sqrt(alpha_mul * std(kernel))
    (reference `util.py:168-175` semantics, applied functionally over the
    param tree instead of mutating torch layers)."""

    def rescale_module(module: dict) -> dict:
        kernel_keys = [k for k in module if "kernel" in k.lower() or k == "wi_fwd"]
        out = dict(module)
        for kk in kernel_keys:
            w = module[kk]
            alpha = alpha_mul * jnp.std(w)
            scale = jnp.sqrt(jnp.maximum(alpha, 1e-8))
            out[kk] = w / scale
            bias_key = kk.replace("kernel", "bias")
            if bias_key != kk and bias_key in module:
                out[bias_key] = module[bias_key] / scale
        return out

    def walk(tree):
        if isinstance(tree, dict):
            if any(not isinstance(v, dict) for v in tree.values()):
                return rescale_module(
                    {k: (walk(v) if isinstance(v, dict) else v) for k, v in tree.items()}
                )
            return {k: walk(v) for k, v in tree.items()}
        return tree

    return walk(jax.device_get(params))


def rescale(x):
    """Min-max rescale to [0, 1] (reference `util.py:26-27`)."""
    x = jnp.asarray(x)
    return (x - x.min()) / (x.max() - x.min())


def flatten(v):
    """Flatten one nesting level (reference `util.py:22-23`)."""
    return [x for y in v for x in y]


def std_normal(key, size):
    """Standard-normal sample (reference `util.py:160-164`, device-neutral
    and PRNG-keyed instead of global-state CUDA)."""
    return jax.random.normal(key, size)


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
