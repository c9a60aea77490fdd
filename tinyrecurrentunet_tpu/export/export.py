"""Model export: StableHLO (jax.export) and TFLite (float / int8).

The exported graph is the model forward on the reference's export shape —
features (T, C-channels-last) in, stacked feature sets out — mirroring the
reference's ONNX export of the bare network on a (751, 4, 257) dummy
(reference `onnx.py:31-44`, `config/tiny.json:57-61`). A streaming variant
exports the single-frame step with the TGRU carry as explicit I/O.

Usage:
    python -m tinyrecurrentunet_tpu.export.export -c config/tiny16k.json \
        --out exp/export [--ckpt_iter max | --random_init] [--int8]
"""

from __future__ import annotations

import argparse
import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from tinyrecurrentunet_tpu.config import Config, NetworkConfig, load_config
from tinyrecurrentunet_tpu.models import TRUNet


def _export_network_cfg(cfg: Config) -> NetworkConfig:
    """Network config for export graphs: Pallas kernels OFF — a Pallas
    custom-call cannot lower to TF/TFLite (the converter fails with
    'Failed to convert the given Jax function to hlo'), and the lax.scan
    path is the same math (equivalence-tested in tests/test_ops.py)."""
    return dataclasses.replace(cfg.network, use_pallas_gru="never")


def _forward_fn(model: TRUNet, variables: dict):
    def fwd(feats):
        y, _ = model.apply(variables, feats)
        return y

    return fwd


def _streaming_fn(model: TRUNet, variables: dict):
    def step(frame, tgru_h):
        y, h = model.apply(variables, frame, tgru_h)
        return y, h

    return step


def export_stablehlo(cfg: Config, variables: dict, out_dir: str) -> dict:
    """Serialize the forward and streaming-step graphs as StableHLO.

    Returns {name: path}."""
    from jax import export as jexport

    model = TRUNet(_export_network_cfg(cfg))
    ex = cfg.onnx_config
    freqs = cfg.featurizer.num_freqs
    os.makedirs(out_dir, exist_ok=True)
    paths = {}

    fwd = _forward_fn(model, variables)
    spec = jax.ShapeDtypeStruct((ex.time_step, freqs, ex.channels), jnp.float32)
    blob = jexport.export(jax.jit(fwd))(spec).serialize()
    paths["forward"] = os.path.join(out_dir, "trunet_forward.stablehlo")
    with open(paths["forward"], "wb") as f:
        f.write(blob)

    step = _streaming_fn(model, variables)
    frame_spec = jax.ShapeDtypeStruct((1, freqs, ex.channels), jnp.float32)
    fb = model.bottleneck_freqs(freqs)
    h_spec = jax.ShapeDtypeStruct((1, fb, cfg.network.tgru_hidden), jnp.float32)
    blob = jexport.export(jax.jit(step))(frame_spec, h_spec).serialize()
    paths["streaming_step"] = os.path.join(out_dir, "trunet_step.stablehlo")
    with open(paths["streaming_step"], "wb") as f:
        f.write(blob)
    return paths


def load_stablehlo(path: str):
    """Reload a serialized StableHLO module; returns a callable."""
    from jax import export as jexport

    with open(path, "rb") as f:
        return jexport.deserialize(f.read()).call


def export_tflite(
    cfg: Config,
    variables: dict,
    out_dir: str,
    int8: bool = False,
    representative=None,
) -> str:
    """Convert the forward graph to TFLite; optionally full-int8 quantized
    (requires a representative-dataset iterable of feature tensors)."""
    import tensorflow as tf

    model = TRUNet(_export_network_cfg(cfg))
    ex = cfg.onnx_config
    freqs = cfg.featurizer.num_freqs
    fwd = _forward_fn(model, variables)
    dummy = np.zeros((ex.time_step, freqs, ex.channels), np.float32)

    converter = tf.lite.TFLiteConverter.experimental_from_jax(
        [fwd], [[("feats", dummy)]]
    )
    if int8:
        # Dynamic-range quantization (int8 weights, float activations).
        # Full-int8 calibration is NOT used: this TF build's calibrator
        # segfaults feeding the scan-containing graph
        # (tensorflow/lite/python/optimize/calibrator.py _feed_tensors);
        # the weight quantization is what delivers the size target anyway.
        del representative
        converter.optimizations = [tf.lite.Optimize.DEFAULT]
    blob = converter.convert()
    os.makedirs(out_dir, exist_ok=True)
    name = "trunet_int8.tflite" if int8 else "trunet_float.tflite"
    path = os.path.join(out_dir, name)
    with open(path, "wb") as f:
        f.write(blob)
    return path


def export_tflite_streaming(
    cfg: Config, variables: dict, out_dir: str, int8: bool = True
) -> str:
    """Convert the SINGLE-FRAME streaming step (frame + TGRU carry in,
    masked-feature output + carry out) to TFLite.

    This is the edge-deployment artifact: the full-clip graph unrolls the
    time scan in the converter (7+ MB); the per-frame step stays ~460 KB
    with dynamic-range int8 — the reference's 362 KB ballpark
    (reference README.md:6)."""
    import tensorflow as tf

    model = TRUNet(_export_network_cfg(cfg))
    freqs = cfg.featurizer.num_freqs
    frame = np.zeros((1, freqs, cfg.network.input_size), np.float32)
    fb = model.bottleneck_freqs(freqs)
    h = np.zeros((1, fb, cfg.network.tgru_hidden), np.float32)
    step = _streaming_fn(model, variables)

    converter = tf.lite.TFLiteConverter.experimental_from_jax(
        [step], [[("frame", frame), ("tgru_h", h)]]
    )
    if int8:
        converter.optimizations = [tf.lite.Optimize.DEFAULT]
    blob = converter.convert()
    os.makedirs(out_dir, exist_ok=True)
    name = "trunet_step_int8.tflite" if int8 else "trunet_step_float.tflite"
    path = os.path.join(out_dir, name)
    with open(path, "wb") as f:
        f.write(blob)
    return path


def tflite_run(path: str, feats: np.ndarray) -> np.ndarray:
    """Run a TFLite model on one input tensor (the parity harness hook)."""
    import tensorflow as tf

    interp = tf.lite.Interpreter(model_path=path)
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    interp.set_tensor(inp["index"], np.asarray(feats, inp["dtype"]))
    interp.invoke()
    return interp.get_tensor(interp.get_output_details()[0]["index"])


def parity_report(cfg: Config, variables: dict, tflite_path: str, feats) -> dict:
    """Max-abs / relative error of the TFLite engine vs the jitted model
    (the numerical-match assertion the reference never had, SURVEY.md §4)."""
    model = TRUNet(_export_network_cfg(cfg))
    ref = np.asarray(_forward_fn(model, variables)(jnp.asarray(feats)))
    got = tflite_run(tflite_path, feats)
    max_abs = float(np.abs(ref - got).max())
    scale = float(np.abs(ref).max()) + 1e-12
    return {"max_abs_err": max_abs, "max_rel_err": max_abs / scale}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", required=True)
    parser.add_argument("--out", default="exp/export")
    parser.add_argument("--ckpt_iter", default=None)
    parser.add_argument("--random_init", action="store_true")
    parser.add_argument("--int8", action="store_true")
    parser.add_argument("--skip_tflite", action="store_true")
    args = parser.parse_args()
    cfg = load_config(args.config)

    from tinyrecurrentunet_tpu.train.state import create_train_state

    if args.random_init:
        state = create_train_state(cfg)
    else:
        from tinyrecurrentunet_tpu.infer.denoise import Denoiser

        state = None
        denoiser = Denoiser.from_checkpoint(cfg, args.ckpt_iter)
        variables = denoiser.variables
    if state is not None:
        variables = {"params": state.params, "batch_stats": state.batch_stats}

    paths = export_stablehlo(cfg, variables, args.out)
    print(f"stablehlo: {paths}")

    try:
        from tinyrecurrentunet_tpu.export.onnx_export import export_onnx

        report = export_onnx(
            cfg, jax.device_get(variables), os.path.join(args.out, "trunet.onnx")
        )
        print(
            f"onnx: {report['path']} ({report['size_bytes'] / 1024:.1f} KB), "
            f"parity max_abs={report['max_abs_err']:.2e}"
        )
    except Exception as e:  # noqa: BLE001
        print(f"onnx export failed: {e}")

    from tinyrecurrentunet_tpu.export.quantize import save_quantized

    qpath = os.path.join(args.out, "trunet_int8.trq")
    size = save_quantized(qpath, variables["params"], variables["batch_stats"])
    print(f"int8 param pack: {qpath} ({size / 1024:.1f} KB)")

    if not args.skip_tflite:
        ex = cfg.onnx_config
        freqs = cfg.featurizer.num_freqs
        rng = np.random.default_rng(0)
        rep = [
            rng.standard_normal((ex.time_step, freqs, ex.channels)).astype(
                np.float32
            )
            * 0.3
            for _ in range(4)
        ]
        # Each artifact independently: a converter failure on one graph must
        # not silently drop the other.
        try:
            path = export_tflite(cfg, variables, args.out, args.int8, rep)
            report = parity_report(cfg, variables, path, rep[0])
            print(f"tflite: {path} ({os.path.getsize(path) / 1024:.1f} KB), "
                  f"parity: {report}")
        except ImportError:
            print("tensorflow not available; skipped TFLite export")
        except Exception as e:  # noqa: BLE001 - converter failures
            print(f"tflite full-clip export failed: {e}")
        try:
            spath = export_tflite_streaming(cfg, variables, args.out, args.int8)
            print(
                f"tflite streaming step: {spath} "
                f"({os.path.getsize(spath) / 1024:.1f} KB)"
            )
        except ImportError:
            pass
        except Exception as e:  # noqa: BLE001
            print(f"tflite streaming export failed: {e}")


if __name__ == "__main__":
    main()
