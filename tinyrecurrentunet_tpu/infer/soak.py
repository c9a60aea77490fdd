"""Sustained real-time soak of the native duplex stream host.

VERDICT r4 next #6: the reference's PortAudio callback loop
(`/root/reference/stream.py:83-129`) runs indefinitely against a wall
clock; the repo had per-block latency histograms and threaded ring unit
tests but never a minutes-long wall-clock-paced producer/consumer run
through the C++ SPSC rings driving the TPU step. This module is that run:

- a producer thread feeds one hop of audio into the native input ring
  every hop/sr seconds on an ABSOLUTE schedule (like an audio callback —
  drift does not accumulate);
- the consumer loop polls the input ring, runs StreamingDenoiser per
  block on the TPU (block_until_ready-fenced: at 381k params the step is
  dispatch-dominated, ~0.25 ms, so BUR is an honest fence in the
  pre-first-D2H regime — CLAUDE.md), and pushes a block to the output
  ring, which the producer thread drains (full duplex);
- xruns come from the native host's own counters (input underruns =
  consumer starved the real-time boundary, output overruns = consumer
  flooded it), latency/jitter from per-block wall timing.

Environment note (not a design property): the denoised samples stay on
device during the soak because this rig's TPU tunnel charges ~26 ms per
device->host pull AFTER the first one, which would poison every
subsequent fence (CLAUDE.md). The block pushed to the output ring is the
consumer's host-side copy of the input block, so the duplex ring path is
fully exercised; on real hardware the D2H of 128 samples is microseconds
and the denoised block would go out instead. One output is pulled and
checked finite after the clock stops.
"""

from __future__ import annotations

import argparse
import json
import threading
import time

import numpy as np


def run_soak(
    cfg,
    variables,
    duration_s: float = 60.0,
    warmup_blocks: int = 20,
) -> dict:
    """Run the wall-clock soak; returns a stats dict (streaming_soak_*)."""
    import jax
    import jax.numpy as jnp

    from tinyrecurrentunet_tpu.infer.streaming import StreamingDenoiser
    from tinyrecurrentunet_tpu.runtime.native import StreamHost

    sr = cfg.featurizer.sample_rate
    hop = cfg.featurizer.hop_length
    block_s = hop / sr

    sd = StreamingDenoiser(cfg, variables)
    state = sd.init_state()
    host = StreamHost(block_size=hop, capacity_blocks=64)

    # speech-ish looping source signal, synthesized up front
    rng = np.random.default_rng(0)
    t = np.arange(sr) / sr
    src = (0.1 * np.sin(2 * np.pi * 220 * t)
           + 0.02 * rng.standard_normal(sr)).astype(np.float32)

    # warm the compiled step before the clock starts
    warm = jnp.asarray(src[:hop])
    for _ in range(warmup_blocks):
        out, state = sd.process_block(state, warm)
    jax.block_until_ready(out)

    n_blocks = int(duration_s / block_s)
    stop = threading.Event()

    def producer():
        """Audio-callback stand-in: absolute-schedule feed + drain."""
        t0 = time.perf_counter()
        for i in range(n_blocks):
            target = t0 + i * block_s
            now = time.perf_counter()
            if target > now:
                time.sleep(target - now)
            lo = (i * hop) % sr
            chunk = src[lo : lo + hop]
            if len(chunk) < hop:
                chunk = np.concatenate([chunk, src[: hop - len(chunk)]])
            host.feed(chunk)
            host.collect(hop)  # drain the playback side
            if stop.is_set():
                return

    prod = threading.Thread(target=producer, daemon=True)
    latencies = []
    processed = 0
    started = time.perf_counter()
    prod.start()
    try:
        while processed < n_blocks:
            block = host.pull_block(starved=False)
            if block is None:
                if not prod.is_alive():
                    break  # producer done and ring drained
                time.sleep(block_s / 16)
                continue
            t_start = time.perf_counter()
            out, state = sd.process_block(state, jnp.asarray(block))
            out.block_until_ready()
            host.push_block(block)  # duplex path (see module docstring)
            host.add_busy(time.perf_counter() - t_start)
            latencies.append(time.perf_counter() - t_start)
            processed += 1
    finally:
        stop.set()
        prod.join(timeout=5.0)
    wall = time.perf_counter() - started

    # one D2H AFTER the clock stops: the output must be real audio
    assert np.all(np.isfinite(np.asarray(out)))

    lat = np.asarray(latencies)
    stats = host.stats()
    return {
        "streaming_soak_seconds": round(wall, 2),
        "streaming_soak_blocks": processed,
        "streaming_soak_sample_rate": sr,
        "streaming_soak_xruns": int(
            stats["input_underruns"] + stats["output_overruns"]
        ),
        "streaming_soak_deadline_misses": int(np.sum(lat > block_s)),
        "streaming_soak_median_ms": round(float(np.median(lat)) * 1000, 4),
        "streaming_soak_p99_ms": round(float(np.percentile(lat, 99)) * 1000, 4),
        "streaming_soak_max_ms": round(float(np.max(lat)) * 1000, 4),
        "streaming_soak_jitter_ms": round(
            float(np.percentile(lat, 99) - np.median(lat)) * 1000, 4
        ),
        "streaming_soak_duty_cycle": round(
            stats["busy_seconds"] / max(wall, 1e-9), 4
        ),
    }


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-c", "--config", default="config/proc16k.json")
    parser.add_argument("--duration", type=float, default=60.0)
    parser.add_argument("--out", default=None, help="write stats JSON here")
    args = parser.parse_args()

    import jax

    from tinyrecurrentunet_tpu.config import load_config
    from tinyrecurrentunet_tpu.models import TRUNet
    from tinyrecurrentunet_tpu.signal import Featurizer

    cfg = load_config(args.config)
    model = TRUNet(cfg.network)
    fz = Featurizer(cfg.featurizer)
    import jax.numpy as jnp

    dummy = fz(jnp.zeros(cfg.featurizer.hop_length * 8, jnp.float32))
    variables = model.init(jax.random.PRNGKey(0), dummy[:2])
    stats = run_soak(cfg, variables, duration_s=args.duration)
    line = json.dumps(stats)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
