"""Compute ops: functional GRU scans, transposed conv, padding helpers.

These are the TPU-native replacements for the reference's implicit native
layer (cuDNN GRU / conv_transpose, SURVEY.md §2.2): pure functions built on
`lax.scan` / `lax.conv_general_dilated` so they fuse under jit and expose
explicit state for streaming.
"""

from tinyrecurrentunet_tpu.ops.gru import (  # noqa: F401
    gru_project_inputs,
    gru_scan,
    gru_step,
)
from tinyrecurrentunet_tpu.ops.conv import (  # noqa: F401
    conv1d,
    conv_transpose1d,
    pad_or_crop,
)
