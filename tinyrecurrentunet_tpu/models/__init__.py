"""Model zoo (L2): TRU-Net and its blocks, plus the phase-aware mask head."""

from tinyrecurrentunet_tpu.models.trunet import TRUNet  # noqa: F401
from tinyrecurrentunet_tpu.models.phm import (  # noqa: F401
    phase_aware_mask,
    bsigmoid_complex_mask,
    denoised_spec_from_output,
)
