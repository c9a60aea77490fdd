"""Benchmark: streaming real-time factor on 16 kHz denoising, per chip.

Prints ONE JSON line:
  {"metric": "streaming_rtf_16k", "value": <rtf>, "unit": "rtf",
   "vs_baseline": <0.05 / rtf>, ...extras}

- value: median wall-clock per 8 ms hop block / 8 ms, using the real
  block-by-block streaming step (sliding STFT + featurizer state + TRUNet
  with TGRU carry + PHM + OLA, one fused XLA program per block) — the
  strictest reading of the reference's rt.py protocol (one frame per step,
  reference `rt.py:20-27`).
- vs_baseline: BASELINE.md target is RTF <= 0.05 per chip; reported as
  target/measured so >1 means better than target.
- extras: offline full-clip RTF (whole 2 s pipeline in one device call) and
  the per-block breakdown.
"""

from __future__ import annotations

import dataclasses
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tinyrecurrentunet_tpu.config import Config, FeaturizerConfig
    from tinyrecurrentunet_tpu.infer.streaming import StreamingDenoiser
    from tinyrecurrentunet_tpu.models import TRUNet
    from tinyrecurrentunet_tpu.models.phm import denoise_output_to_audio
    from tinyrecurrentunet_tpu.signal import Featurizer

    sample_rate = 16000
    cfg = dataclasses.replace(
        Config(), featurizer=FeaturizerConfig(sample_rate=sample_rate)
    )
    model = TRUNet(cfg.network)
    featurizer = Featurizer(cfg.featurizer)
    hop = cfg.featurizer.hop_length

    rng = np.random.default_rng(0)
    t = np.arange(2 * sample_rate) / sample_rate
    audio = (
        0.2 * np.sin(2 * np.pi * 220 * t)
        + 0.05 * rng.standard_normal(len(t))
    ).astype(np.float32)

    variables = model.init(
        jax.random.PRNGKey(0), featurizer(jnp.asarray(audio))[:2]
    )

    # ---- streaming: block-by-block with carried state
    sd = StreamingDenoiser(cfg, variables)
    state = sd.init_state()
    block = jnp.asarray(audio[:hop])
    # warmup (compile + cache)
    for _ in range(20):
        out, state = sd.process_block(state, block)
    jax.block_until_ready(out)

    n_blocks = 500
    times = []
    for i in range(n_blocks):
        start = time.perf_counter()
        out, state = sd.process_block(state, block)
        out.block_until_ready()
        times.append(time.perf_counter() - start)
    block_seconds = hop / sample_rate
    median_step = float(np.median(times))
    rtf_stream = median_step / block_seconds

    # ---- chunked streaming (8 hops per call = 64 ms latency mode)
    k = 8
    sdc = StreamingDenoiser(cfg, variables, chunk_frames=k)
    cstate = sdc.init_state()
    cblock = jnp.asarray(audio[: hop * k])
    for _ in range(5):
        cout, cstate = sdc.process_block(cstate, cblock)
    jax.block_until_ready(cout)
    ctimes = []
    for _ in range(100):
        start = time.perf_counter()
        cout, cstate = sdc.process_block(cstate, cblock)
        cout.block_until_ready()
        ctimes.append(time.perf_counter() - start)
    rtf_chunked = float(np.median(ctimes)) / (k * block_seconds)

    # ---- offline: the whole 2 s pipeline in one device call
    def offline(variables, audio):
        spec = featurizer.spectrogram(audio)
        feats = featurizer.features_from_spec(spec)
        output, _ = model.apply(variables, feats)
        return denoise_output_to_audio(
            output, featurizer, cfg.network, length=audio.shape[-1],
            mixture_spec=spec,
        )

    offline_jit = jax.jit(offline)
    out = offline_jit(variables, jnp.asarray(audio))
    jax.block_until_ready(out)
    reps = 20
    start = time.perf_counter()
    for _ in range(reps):
        out = offline_jit(variables, jnp.asarray(audio))
    jax.block_until_ready(out)
    rtf_offline = (time.perf_counter() - start) / reps / 2.0

    target = 0.05
    result = {
        "metric": "streaming_rtf_16k",
        "value": round(rtf_stream, 6),
        "unit": "rtf",
        "vs_baseline": round(target / rtf_stream, 3),
        "median_block_ms": round(median_step * 1000, 4),
        "block_ms": round(block_seconds * 1000, 3),
        "chunked8_rtf": round(rtf_chunked, 6),
        "offline_rtf": round(rtf_offline, 6),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
