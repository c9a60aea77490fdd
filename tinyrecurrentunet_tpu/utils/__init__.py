"""Utilities: metrics writers, profiling hooks, parameter accounting."""

from tinyrecurrentunet_tpu.utils.metrics import MetricsWriter  # noqa: F401
from tinyrecurrentunet_tpu.utils.params import count_params, print_size  # noqa: F401
