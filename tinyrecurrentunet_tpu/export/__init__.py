"""Export layer (L6): StableHLO, TFLite (float + int8), int8 param packs,
ONNX + TorchScript artifacts (via the weight-identical torch mirror),
numerical parity harness, cross-engine latency bench.

Covers the reference's torch->ONNX/TorchScript path (reference
`onnx.py:14-91`) with JAX-native engines plus mirror-exported artifacts;
the parity harness asserts numerical match (the reference compared only
latency, never outputs — SURVEY.md §4)."""

from tinyrecurrentunet_tpu.export.quantize import (  # noqa: F401
    dequantize_params,
    quantize_params,
    save_quantized,
    load_quantized,
)
from tinyrecurrentunet_tpu.export.export import (  # noqa: F401
    export_stablehlo,
    export_tflite,
    load_stablehlo,
    tflite_run,
)
