"""Data pipeline (L1): WAV IO, augmentation, clean/noisy pair datasets,
host-side prefetching loader with per-host sharding."""

from tinyrecurrentunet_tpu.data.audio_io import read_wav, write_wav  # noqa: F401
from tinyrecurrentunet_tpu.data.augment import DataAugment  # noqa: F401
from tinyrecurrentunet_tpu.data.dataset import (  # noqa: F401
    CleanNoisyPairDataset,
    SyntheticPairDataset,
    load_clean_noisy_dataloader,
)
from tinyrecurrentunet_tpu.data.loader import DataLoader  # noqa: F401
from tinyrecurrentunet_tpu.data.procgen import (  # noqa: F401
    ProceduralSpeechDataset,
    materialize_dns_testset,
)
