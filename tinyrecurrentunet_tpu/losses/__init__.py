"""Losses (L2): multi-resolution STFT, cosine similarity, composite loss_fn."""

from tinyrecurrentunet_tpu.losses.mrstft import (  # noqa: F401
    MultiResolutionSTFTLoss,
    spectral_convergence_loss,
    log_stft_magnitude_loss,
)
from tinyrecurrentunet_tpu.losses.cossim import cossim_loss  # noqa: F401
from tinyrecurrentunet_tpu.losses.composite import (  # noqa: F401
    loss_fn,
    per_item_weights,
)
