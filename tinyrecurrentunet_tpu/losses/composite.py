"""The composite training loss: the reference's intended `loss_fn`, finished.

Completes what the reference left unparseable (reference `util.py:186-251`,
defect D7): noisy waveform -> featurize -> network -> split mixture/noise
feature sets -> phase-aware mask -> re-modulate -> iSTFT -> waveform losses
(ell_p + multi-resolution STFT [+ optional cosine similarity]).

The entire path is one pure function of (params, batch), so under jit it
compiles to a single fused XLA program including both STFT directions —
the "reconstruct audio on-device for the loss" memory optimization the
reference README describes (`README.md:50`) and BASELINE.json requires.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from tinyrecurrentunet_tpu.config import LossConfig, NetworkConfig
from tinyrecurrentunet_tpu.losses.cossim import cossim_loss
from tinyrecurrentunet_tpu.losses.mrstft import MultiResolutionSTFTLoss
from tinyrecurrentunet_tpu.models.phm import denoise_output_to_audio
from tinyrecurrentunet_tpu.signal.features import Featurizer


def per_item_weights(clean_audio: jnp.ndarray, noisy_audio: jnp.ndarray) -> jnp.ndarray:
    """Per-item loss weights w_i = mean_b rms(noise_b) / rms(noise_i), clipped
    to [1/4, 4] (config.py LossConfig.per_item_norm rationale). Shape (B, 1)
    for (B, L) inputs; constant w.r.t. params (data-only)."""
    noise_ref = noisy_audio - clean_audio
    rms = jnp.sqrt(jnp.mean(noise_ref * noise_ref, axis=-1) + 1e-10)
    w = jnp.clip(jnp.mean(rms) / (rms + 1e-6), 0.25, 4.0)
    return jax.lax.stop_gradient(w)[..., None]


def loss_fn(
    apply_fn: Callable,
    params: Any,
    batch_stats: Any,
    clean_audio: jnp.ndarray,
    noisy_audio: jnp.ndarray,
    featurizer: Featurizer,
    network_config: NetworkConfig,
    loss_config: LossConfig,
    train: bool = True,
    tgru_h0=None,
):
    """Compute the composite loss.

    Args:
      apply_fn: the model's `.apply`.
      params / batch_stats: flax collections.
      clean_audio / noisy_audio: (B, L) or (L,) waveforms.
      train: when True, batch stats update and are returned.
      tgru_h0: optional TGRU carry-in for TBPTT segment training (the carry
        out is returned; gradients are truncated at segment boundaries by
        the caller not differentiating through it).

    Returns:
      (loss, loss_dict, new_batch_stats, tgru_h) — loss_dict mirrors the
      reference's per-term output dict (reference `util.py:243-250`).
    """
    variables = {"params": params, "batch_stats": batch_stats}
    noisy_spec = featurizer.spectrogram(noisy_audio)
    noisy_feat = featurizer.features_from_spec(noisy_spec)

    if train:
        (output, tgru_h), updates = apply_fn(
            variables, noisy_feat, tgru_h0, train=True, mutable=["batch_stats"]
        )
        new_batch_stats = updates["batch_stats"]
    else:
        output, tgru_h = apply_fn(variables, noisy_feat, tgru_h0)
        new_batch_stats = batch_stats

    denoised = denoise_output_to_audio(
        output,
        featurizer,
        network_config,
        length=clean_audio.shape[-1],
        mixture_spec=noisy_spec,
    )

    loss_dict = {}
    loss = 0.0

    # Per-item normalization (config.py LossConfig.per_item_norm): equalize
    # each item's gradient share by scaling its waveform triple with the
    # batch-mean-relative inverse noise RMS. w depends only on the data
    # (never on params), so it is a constant weighting of the loss surface.
    clean_eff, noisy_eff = clean_audio, noisy_audio
    if loss_config.per_item_norm and clean_audio.ndim >= 2:
        w = per_item_weights(clean_audio, noisy_audio)
        denoised = denoised * w
        clean_eff = clean_audio * w
        noisy_eff = noisy_audio * w

    # ell_p reconstruction loss on the waveform (reference `util.py:239-243`).
    err = denoised - clean_eff
    if loss_config.ell_p == 1:
        ell_p_loss = jnp.mean(jnp.abs(err))
    elif loss_config.ell_p == 2:
        ell_p_loss = jnp.mean(err * err)
    else:
        raise ValueError(f"ell_p must be 1 or 2, got {loss_config.ell_p}")
    loss += loss_config.ell_p_lambda * ell_p_loss
    loss_dict["ell_p"] = ell_p_loss

    # Multi-resolution STFT loss (reference `util.py:246-250`).
    if loss_config.stft_lambda > 0:
        mrstft = MultiResolutionSTFTLoss(loss_config.stft_config)
        sc_loss, mag_loss = mrstft(denoised, clean_eff)
        loss += (sc_loss + mag_loss) * loss_config.stft_lambda
        loss_dict["stft_sc"] = sc_loss * loss_config.stft_lambda
        loss_dict["stft_mag"] = mag_loss * loss_config.stft_lambda

    # Optional noise-side spectral loss (config.py `noise_stft_lambda`):
    # MR-STFT on the implied noise estimate vs the true noise. Reuses the
    # same bank configuration as the speech-side term.
    if loss_config.noise_stft_lambda > 0:
        mrstft_n = MultiResolutionSTFTLoss(loss_config.stft_config)
        n_sc, n_mag = mrstft_n(noisy_eff - denoised, noisy_eff - clean_eff)
        loss += (n_sc + n_mag) * loss_config.noise_stft_lambda
        loss_dict["noise_stft"] = (n_sc + n_mag) * loss_config.noise_stft_lambda

    # Optional cosine-similarity term (reference capability, D18 fixed).
    if loss_config.cossim_lambda > 0:
        cs = cossim_loss(denoised, clean_eff)
        loss += loss_config.cossim_lambda * cs
        loss_dict["cossim"] = cs

    # Optional feature-matching auxiliary loss: supervise the mixture set
    # toward featurizer(clean) and the noise set toward featurizer(noise).
    if loss_config.aux_feature_lambda > 0:
        from tinyrecurrentunet_tpu.models.phm import split_feature_sets

        clean_feat = featurizer(clean_audio)
        noise_feat = featurizer(noisy_audio - clean_audio)
        mix_est, noise_est = split_feature_sets(
            output, featurizer.config.num_channels
        )
        aux = jnp.mean(jnp.abs(mix_est - clean_feat)) + jnp.mean(
            jnp.abs(noise_est - noise_feat)
        )
        loss += loss_config.aux_feature_lambda * aux
        loss_dict["aux_feature"] = aux

    loss_dict["loss"] = loss
    return loss, loss_dict, new_batch_stats, tgru_h
