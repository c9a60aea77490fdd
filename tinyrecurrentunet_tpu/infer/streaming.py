"""Streaming denoiser: one hop-sized block in, one block out, all state
explicit.

This is the working version of the reference's stubbed real-time loop
(reference `stream.py:83-129`, defect D12) and the semantics its latency
benchmark assumed (reference `rt.py:21`): per-frame inference with carried
recurrent state. The whole step — sliding STFT window, featurizer state
(unwrap/PCEN), TRUNet with TGRU carry, PHM, iSTFT overlap-add — compiles to
ONE XLA program per block.

Alignment contract (hop h, n_fft = 4h, centered offline STFT):
  output block k == offline-denoised samples [(k-3)h, (k-2)h)
i.e. 3 blocks of algorithmic latency (24 ms at 16 kHz). The first blocks
differ from offline (zero-fill stands in for reflect padding); the
difference decays with the PCEN smoother and GRU forget gates, and the
phase-unwrap state differs only by multiples of 2*pi (sin/cos-invariant).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tinyrecurrentunet_tpu.config import Config
from tinyrecurrentunet_tpu.models import TRUNet
from tinyrecurrentunet_tpu.models.phm import denoised_spec_from_output
from tinyrecurrentunet_tpu.signal import Featurizer
from tinyrecurrentunet_tpu.signal.features import FeaturizerState


class StreamState(NamedTuple):
    in_buffer: jax.Array  # (n_fft,) last n_fft input samples
    feat_state: FeaturizerState
    tgru_h: jax.Array  # (1, F_bottleneck, tgru_hidden)
    ola_buffer: jax.Array  # (n_fft,) overlap-add accumulator


class StreamingDenoiser:
    def __init__(self, cfg: Config, variables: dict):
        fz_cfg = cfg.featurizer
        if fz_cfg.n_fft % fz_cfg.hop_length != 0:
            raise ValueError("streaming requires hop | n_fft")
        self.cfg = cfg
        self.model = TRUNet(cfg.network)
        self.featurizer = Featurizer(fz_cfg)
        self.variables = variables
        self.hop = fz_cfg.hop_length
        self.n_fft = fz_cfg.n_fft
        self._ratio = self.n_fft // self.hop

        model, featurizer = self.model, self.featurizer

        def spec_step(variables, state: StreamState, spec_t: jax.Array):
            """Per-frame core from a complex spectrum frame (F,): featurizer
            state update -> model step with TGRU carry -> PHM -> iSTFT OLA."""
            feats_t, feat_state = featurizer.step_from_spec_frame(
                spec_t, state.feat_state
            )
            output, tgru_h = model.apply(
                variables, feats_t[None, None], state.tgru_h
            )  # (1, 1, F, 2C)
            spec_out = denoised_spec_from_output(
                output[0, 0],
                featurizer,
                cfg.network.phm_beta,
                mixture_spec=spec_t,
                source=cfg.network.phm_source,
            )
            frame = jnp.fft.irfft(spec_out, n=self.n_fft)

            ola = state.ola_buffer + frame
            out_block = ola[: self.hop] / float(self._ratio)
            ola = jnp.concatenate(
                [ola[self.hop :], jnp.zeros((self.hop,), ola.dtype)]
            )
            return out_block, feat_state, tgru_h, ola

        def step(variables, state: StreamState, block: jax.Array):
            # slide the analysis window
            in_buffer = jnp.concatenate([state.in_buffer[self.hop :], block])
            spec_t = jnp.fft.rfft(in_buffer, n=self.n_fft)
            out_block, feat_state, tgru_h, ola = spec_step(variables, state, spec_t)
            return out_block, StreamState(in_buffer, feat_state, tgru_h, ola)

        def step_from_spec(variables, state: StreamState, spec_t: jax.Array):
            out_block, feat_state, tgru_h, ola = spec_step(variables, state, spec_t)
            return out_block, StreamState(state.in_buffer, feat_state, tgru_h, ola)

        self._step = jax.jit(step, donate_argnums=(1,))
        self._step_from_spec = jax.jit(step_from_spec, donate_argnums=(1,))

    def init_state(self) -> StreamState:
        return StreamState(
            in_buffer=jnp.zeros((self.n_fft,), jnp.float32),
            feat_state=self.featurizer.init_state(),
            tgru_h=self.model.init_tgru_state(1, self.cfg.featurizer.num_freqs),
            ola_buffer=jnp.zeros((self.n_fft,), jnp.float32),
        )

    def process_block(self, state: StreamState, block):
        """One hop-sized block in -> one hop-sized (delayed) block out."""
        out, state = self._step(self.variables, state, jnp.asarray(block))
        return out, state

    def process_spec_frame(self, state: StreamState, spec_t):
        """Per-frame step from an externally-computed complex STFT frame
        (F,) — the exactness hook: feeding offline STFT frames reproduces
        the offline pipeline bit-for-bit (no zero-fill startup transient)."""
        out, state = self._step_from_spec(self.variables, state, jnp.asarray(spec_t))
        return out, state

    def process(self, audio: np.ndarray):
        """Stream a whole waveform block-by-block (host loop; used by the
        CLI, tests, and the RTF benchmark). Returns the concatenated output
        (same length, 3-block latency included)."""
        length = len(audio)
        pad = (-length) % self.hop
        if pad:
            audio = np.pad(np.asarray(audio), (0, pad))
        state = self.init_state()
        blocks = []
        for i in range(0, len(audio), self.hop):
            out, state = self.process_block(state, audio[i : i + self.hop])
            blocks.append(np.asarray(out))
        return np.concatenate(blocks)[:length], state
