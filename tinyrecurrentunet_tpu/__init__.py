"""tinyrecurrentunet_tpu — a TPU-native (JAX/XLA/Pallas/pjit) TRU-Net framework.

A from-scratch re-design of the capabilities of Okrio/tinyrecurrentunet
(reference surveyed in SURVEY.md): real-time speech denoising with a tiny
recurrent U-Net (arXiv 2102.03207), built TPU-first:

- Signal core (`signal/`): STFT featurizer producing the (T, F, C) feature
  tensor (log-magnitude, PCEN, demodulated phase), fully jittable, with the
  inverse (mask -> complex spec -> iSTFT) fused into the same XLA program.
- Model (`models/`): frequency-axis conv U-Net with FGRU (bidirectional,
  frequency) and TGRU (unidirectional, time) bottleneck as `lax.scan`s with
  explicit carried state for streaming.
- Losses (`losses/`): L1-on-waveform + multi-resolution STFT + cosine
  similarity, assembled so noisy->feat->net->mask->iSTFT->loss compiles as
  ONE XLA program.
- Training (`train/`): jit/pjit train step, data-parallel over a
  `jax.sharding.Mesh`, linear-warmup/cosine-decay schedule, Orbax
  checkpointing with `max`-selector resume semantics.
- Inference (`infer/`): offline denoise, PESQ/STOI/SI-SDR eval, streaming
  step with explicit featurizer+GRU+OLA state carry.
- Export (`export/`): StableHLO export, int8 quantization (~362 KB target),
  numerical parity harness.

Layout convention: specs and features are time-major `(T, F)` / `(T, F, C)`
(NWC for the frequency-axis convs), unlike the reference's `(T, C, F)`
(reference `dataset.py:221-226` perm/de_perm). Adapters for the reference
layout live where export parity needs them.
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache (Pallas kernels take ~minutes to compile
# on remote-compile TPU setups; repeat runs hit the cache). Opt out with
# TRUNET_NO_COMPILE_CACHE=1 or by setting your own cache dir beforehand.
if not _os.environ.get("TRUNET_NO_COMPILE_CACHE"):
    try:
        import jax as _jax

        if _jax.config.jax_compilation_cache_dir is None:
            _jax.config.update(
                "jax_compilation_cache_dir",
                _os.environ.get("TRUNET_COMPILE_CACHE", "/tmp/trunet_jax_cache"),
            )
            _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # noqa: BLE001 - cache is best-effort
        pass

from tinyrecurrentunet_tpu.config import Config, load_config  # noqa: F401
