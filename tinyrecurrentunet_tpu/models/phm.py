"""Phase-aware beta-sigmoid mask (PHM) and the denoising head.

Intended behavior of the reference's `PhaseAwareMask` (reference
`phm.py:7-45`, defect D6 fixed: the undefined `phase_mix`/`phase_est` names
are the mixture/estimated phases) and of the unfinished loss head
(reference `util.py:221-234`, defect D7):

- the network emits 2 stacked feature sets — mixture estimate and noise
  estimate (reference `util.py:217-222`),
- mask = sigmoid(beta * (phase_mixture - phase_noise))   (`phm.py:41`)
- denoised magnitude = mask * |mixture|                  (`phm.py:44`)
- the denoised complex spec re-modulates with the mixture phase and is
  iSTFT'd on-device for the waveform losses (`README.md:50`).

All pure functions; they fuse into the single train-step XLA program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tinyrecurrentunet_tpu.config import FeaturizerConfig, NetworkConfig
from tinyrecurrentunet_tpu.signal.features import Featurizer, db_to_amp, denorm_db
from tinyrecurrentunet_tpu.signal.phase import mod_phase


def phase_aware_mask(
    phase_mixture: jax.Array, phase_estimated: jax.Array, beta: float = 0.5
) -> jax.Array:
    """sigmoid(beta * (phase_mixture - phase_estimated))
    (reference `phm.py:41`)."""
    return jax.nn.sigmoid(beta * (phase_mixture - phase_estimated))


def split_feature_sets(output: jax.Array, num_channels: int):
    """Split the network output (..., 2*C) into (mixture, noise) sets of
    (..., C) each (reference `util.py:221-222`)."""
    return output[..., :num_channels], output[..., num_channels:]


def denoised_spec_from_output(
    output: jax.Array,
    featurizer: Featurizer,
    beta: float = 0.5,
    mixture_spec: jax.Array | None = None,
    source: str = "mixture",
) -> jax.Array:
    """Network output (..., T, F, 2*C) -> denoised complex spec (..., T, F).

    source="mixture" (default): the mask multiplies the OBSERVED mixture
    spectrogram (magnitude AND phase reused from `mixture_spec`) — the
    reference PHM docstring's semantics (`phm.py:16-18`: "Mixture:
    spectrogram containing speech and noise"). The network's two feature
    sets contribute the mixture/noise phase estimates that shape the mask.

    source="network": magnitude and phase decoded from the network's own
    mixture feature set (the unfinished `util.py:221-234` reading) — the
    net must learn full phase reconstruction.
    """
    cfg: FeaturizerConfig = featurizer.config
    mix, noise = split_feature_sets(output, cfg.num_channels)
    mix_ch = featurizer.split_channels(mix)
    noise_ch = featurizer.split_channels(noise)

    phase_mix_est = mod_phase(mix_ch["real_demod"], mix_ch["imag_demod"])
    phase_noise = mod_phase(noise_ch["real_demod"], noise_ch["imag_demod"])
    mask = phase_aware_mask(phase_mix_est, phase_noise, beta)

    if source == "mixture":
        if mixture_spec is None:
            raise ValueError("source='mixture' requires mixture_spec")
        denoised_mag = mask * jnp.abs(mixture_spec)
        phase_out = jnp.angle(mixture_spec)
    elif source == "network":
        mix_mag = db_to_amp(
            denorm_db(mix_ch["logmag"], cfg.min_level_db, cfg.ref_level_db)
        )
        denoised_mag = mask * mix_mag
        phase_out = phase_mix_est
    else:
        raise ValueError(f"unknown phm source {source!r}")
    return jax.lax.complex(
        denoised_mag * jnp.cos(phase_out), denoised_mag * jnp.sin(phase_out)
    )


def denoise_output_to_audio(
    output: jax.Array,
    featurizer: Featurizer,
    network_config: NetworkConfig,
    length: int | None = None,
    mixture_spec: jax.Array | None = None,
) -> jax.Array:
    """Full head: network output -> denoised waveform (PHM + iSTFT).

    `mixture_spec` (the observed noisy spectrogram) is required for the
    default phm_source="mixture"; for "network" it is ignored.
    """
    spec = denoised_spec_from_output(
        output,
        featurizer,
        network_config.phm_beta,
        mixture_spec=mixture_spec,
        source=network_config.phm_source,
    )
    return featurizer.istft(spec, length=length)
