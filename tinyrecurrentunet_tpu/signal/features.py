"""The featurizer: waveform <-> (T, F, C) feature tensors.

TPU-native re-design of the reference `ProcessAudio` (reference
`dataset.py:130-298`), fixing its defects by construction:
- device-neutral (D8: the reference moved it to CUDA at import),
- PCEN wired as a real channel (SURVEY.md §0.2: 4-channel primary path),
- correct unwrap (D17).

Layout: features are (T, F, C) — time-major, channels-last (NWC for the
frequency-axis convs) — instead of the reference's (T, C, F) perm
(`dataset.py:221-226`). `to_reference_layout` / `from_reference_layout`
adapt where export parity needs the reference shape.

Everything here is jittable and differentiable, so featurize -> model ->
mask -> istft -> loss compiles as ONE XLA program (the fusion BASELINE.json
requires).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tinyrecurrentunet_tpu.config import FeaturizerConfig
from tinyrecurrentunet_tpu.signal.pcen import pcen as _pcen
from tinyrecurrentunet_tpu.signal.pcen import pcen_step as _pcen_step
from tinyrecurrentunet_tpu.signal.phase import demod_phase, mod_phase, unwrap_step
from tinyrecurrentunet_tpu.signal.stft import istft as _istft
from tinyrecurrentunet_tpu.signal.stft import stft as _stft


class FeaturizerState(NamedTuple):
    """Streaming carry for the featurizer (one entry per sequential op)."""

    prev_phase: jax.Array  # (F,) raw phase of the previous frame
    unwrap_corr: jax.Array  # (F,) accumulated unwrap correction
    pcen_m: jax.Array  # (F,) PCEN IIR smoother state
    frame_count: jax.Array  # () int32, 0 before the first frame


def amp_to_db(magnitude: jax.Array, ref_level_db: float = 25.0) -> jax.Array:
    """20*log10(clamp(mag, 1e-7)) - ref  (reference `dataset.py:207-211`)."""
    return 20.0 * jnp.log10(jnp.maximum(magnitude, 1e-7)) - ref_level_db


def db_to_amp(db_spec: jax.Array) -> jax.Array:
    """10^(db/20)  (reference `dataset.py:214-218`)."""
    return jnp.power(10.0, db_spec / 20.0)


def norm_db(db_spec: jax.Array, min_level_db: float = -100.0) -> jax.Array:
    """Scale dB values into [-1, 1] (reference `dataset.py:229-235`)."""
    return jnp.clip(
        ((db_spec - min_level_db) / -min_level_db) * 2.0 - 1.0, -1.0, 1.0
    )


def denorm_db(
    norm_spec: jax.Array, min_level_db: float = -100.0, ref_level_db: float = 25.0
) -> jax.Array:
    """Inverse of norm_db, re-adding the reference level
    (reference `dataset.py:238-243`)."""
    return (
        ((jnp.clip(norm_spec, -1.0, 1.0) + 1.0) / 2.0) * -min_level_db
        + min_level_db
        + ref_level_db
    )


def to_reference_layout(features: jax.Array) -> jax.Array:
    """(T, F, C) -> (T, C, F), the reference's tensor layout
    (reference `dataset.py:221-222`, `config/tiny.json:57-61`)."""
    return jnp.swapaxes(features, -1, -2)


def from_reference_layout(features: jax.Array) -> jax.Array:
    """(T, C, F) -> (T, F, C)."""
    return jnp.swapaxes(features, -1, -2)


@dataclasses.dataclass(frozen=True)
class Featurizer:
    """Waveform <-> feature-tensor transforms, parameterized by config.

    All methods are pure and jittable; `self` is hashable/static.
    """

    config: FeaturizerConfig = dataclasses.field(default_factory=FeaturizerConfig)

    # ---------- forward: waveform -> features ----------

    def spectrogram(self, audio: jax.Array) -> jax.Array:
        """Complex STFT (..., T, F); rectangular window, center/reflect
        (torch.stft defaults the reference relies on, `dataset.py:260-264`)."""
        return _stft(
            audio, n_fft=self.config.n_fft, hop_length=self.config.hop_length
        )

    def _channel(self, name: str, magnitude, real_demod, imag_demod):
        c = self.config
        if name == "logmag":
            return norm_db(amp_to_db(magnitude, c.ref_level_db), c.min_level_db)
        if name == "pcen":
            return _pcen(
                magnitude,
                eps=c.pcen_eps,
                s=c.pcen_s,
                alpha=c.pcen_alpha,
                delta=c.pcen_delta,
                r=c.pcen_r,
                axis=-2,
            )
        if name == "real_demod":
            return real_demod
        if name == "imag_demod":
            return imag_demod
        raise ValueError(name)

    def features_from_spec(self, spec: jax.Array) -> jax.Array:
        """Complex spec (..., T, F) -> features (..., T, F, C)."""
        magnitude = jnp.abs(spec)
        phase = jnp.angle(spec)
        real_demod, imag_demod = demod_phase(phase, axis=-2)
        chans = [
            self._channel(name, magnitude, real_demod, imag_demod)
            for name in self.config.channels
        ]
        return jnp.stack(chans, axis=-1)

    def __call__(self, audio: jax.Array) -> jax.Array:
        """Waveform (..., L) -> features (..., T, F, C)
        (reference `ProcessAudio.forward`, `dataset.py:246-272`)."""
        return self.features_from_spec(self.spectrogram(audio))

    # ---------- inverse: features -> waveform ----------

    def split_channels(self, features: jax.Array) -> dict:
        """(..., C) feature tensor -> {channel_name: (...)} dict."""
        return {
            name: features[..., i] for i, name in enumerate(self.config.channels)
        }

    def complex_spec(
        self, logmag_norm: jax.Array, real_demod: jax.Array, imag_demod: jax.Array
    ) -> jax.Array:
        """Re-modulate (denormalized) magnitude + demod phase into a complex
        spec (reference `mod_phase`, `dataset.py:182-203`)."""
        wrap = mod_phase(real_demod, imag_demod)
        magnitude = db_to_amp(
            denorm_db(logmag_norm, self.config.min_level_db, self.config.ref_level_db)
        )
        # mag * e^{i phi} built from real parts (complex exp is both slower
        # and unimplemented in some eager TPU paths).
        return jax.lax.complex(magnitude * jnp.cos(wrap), magnitude * jnp.sin(wrap))

    def inverse(self, features: jax.Array, length: int | None = None) -> jax.Array:
        """Features (..., T, F, C) -> waveform (..., L)
        (reference `ProcessAudio.backward`, `dataset.py:275-298`)."""
        ch = self.split_channels(features)
        spec = self.complex_spec(ch["logmag"], ch["real_demod"], ch["imag_demod"])
        return self.istft(spec, length=length)

    def istft(self, spec: jax.Array, length: int | None = None) -> jax.Array:
        return _istft(
            spec,
            n_fft=self.config.n_fft,
            hop_length=self.config.hop_length,
            length=length,
        )

    # ---------- streaming ----------

    def init_state(self, dtype=jnp.float32) -> FeaturizerState:
        f = self.config.num_freqs
        return FeaturizerState(
            prev_phase=jnp.zeros((f,), dtype),
            unwrap_corr=jnp.zeros((f,), dtype),
            pcen_m=jnp.zeros((f,), dtype),
            frame_count=jnp.zeros((), jnp.int32),
        )

    def step_from_spec_frame(self, spec_t: jax.Array, state: FeaturizerState):
        """One streaming featurizer step from a complex spectrum frame (F,).

        Returns (features_t (F, C), new_state). Feeding offline STFT frames
        one at a time reproduces __call__ exactly (tested equivalence).
        """
        c = self.config
        magnitude = jnp.abs(spec_t)
        raw_phase = jnp.angle(spec_t)

        # unwrap: the first frame passes through (no previous frame).
        # frame_count may carry leading stream axes (multi-stream serving);
        # broadcast it against the (..., F) phase.
        started = state.frame_count > 0
        started = started.reshape(started.shape + (1,) * (raw_phase.ndim - started.ndim))
        prev_phase = jnp.where(started, state.prev_phase, raw_phase)
        unwrapped, new_corr = unwrap_step(
            raw_phase, prev_phase, state.unwrap_corr
        )
        real_demod = jnp.sin(unwrapped)
        imag_demod = jnp.cos(unwrapped)

        chans = []
        pcen_m = state.pcen_m
        for name in c.channels:
            if name == "logmag":
                chans.append(norm_db(amp_to_db(magnitude, c.ref_level_db), c.min_level_db))
            elif name == "pcen":
                out, pcen_m = _pcen_step(
                    magnitude,
                    state.pcen_m,
                    eps=c.pcen_eps,
                    s=c.pcen_s,
                    alpha=c.pcen_alpha,
                    delta=c.pcen_delta,
                    r=c.pcen_r,
                )
                chans.append(out)
            elif name == "real_demod":
                chans.append(real_demod)
            elif name == "imag_demod":
                chans.append(imag_demod)
        new_state = FeaturizerState(
            prev_phase=raw_phase,
            unwrap_corr=new_corr,
            pcen_m=pcen_m,
            frame_count=state.frame_count + 1,
        )
        return jnp.stack(chans, axis=-1), new_state
