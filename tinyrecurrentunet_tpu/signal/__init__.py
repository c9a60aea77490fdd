"""Signal core (L0): STFT/iSTFT, phase demodulation, PCEN, featurizer.

TPU-native replacement for the reference's torch/cuFFT featurizer
(reference `dataset.py:130-298`). Pure jittable functions; the featurizer
fuses with the model and loss into one XLA program.
"""

from tinyrecurrentunet_tpu.signal.stft import (  # noqa: F401
    frame_signal,
    stft,
    istft,
    stft_magnitude,
)
from tinyrecurrentunet_tpu.signal.phase import (  # noqa: F401
    unwrap,
    demod_phase,
    mod_phase,
)
from tinyrecurrentunet_tpu.signal.pcen import pcen, pcen_step  # noqa: F401
from tinyrecurrentunet_tpu.signal.features import Featurizer  # noqa: F401
