"""Inference surfaces (L4/L5): offline denoise, eval metrics, streaming."""

from tinyrecurrentunet_tpu.infer.denoise import Denoiser  # noqa: F401
from tinyrecurrentunet_tpu.infer.streaming import (  # noqa: F401
    StreamingDenoiser,
    StreamState,
)
