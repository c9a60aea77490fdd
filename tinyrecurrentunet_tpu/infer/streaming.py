"""Streaming denoiser: hop-sized blocks in, blocks out, all state explicit.

This is the working version of the reference's stubbed real-time loop
(reference `stream.py:83-129`, defect D12) and the semantics its latency
benchmark assumed (reference `rt.py:21`): per-frame inference with carried
recurrent state. The whole step — sliding STFT window, featurizer state
(unwrap/PCEN), TRUNet with TGRU carry, PHM, iSTFT overlap-add — compiles to
ONE XLA program per block.

Alignment contract (hop h, n_fft = 4h, centered offline STFT):
  output block k == offline-denoised samples [(k-3)h, (k-2)h)
i.e. 3 hops of algorithmic latency (24 ms at 16 kHz). The first blocks
differ from offline (zero-fill stands in for reflect padding); the
difference decays with the PCEN smoother and GRU forget gates, and the
phase-unwrap state differs only by multiples of 2*pi (sin/cos-invariant).

`chunk_frames=K` processes K hops per device call — identical math to K
single steps (tested), amortizing per-call dispatch K-fold at K*hop
latency; the TGRU scans the K frames inside the call.
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
from tinyrecurrentunet_tpu.signal.stft import frame_signal, overlap_add


class StreamState(NamedTuple):
    in_buffer: jax.Array  # (n_fft,) last n_fft input samples
    feat_state: FeaturizerState
    tgru_h: jax.Array  # (1, F_bottleneck, tgru_hidden)
    ola_buffer: jax.Array  # (n_fft,) overlap-add accumulator


class StreamingDenoiser:
    def __init__(self, cfg: Config, variables: dict, chunk_frames: int = 1):
        fz_cfg = cfg.featurizer
        if fz_cfg.n_fft % fz_cfg.hop_length != 0:
            raise ValueError("streaming requires hop | n_fft")
        self.cfg = cfg
        self.model = TRUNet(cfg.network)
        self.featurizer = Featurizer(fz_cfg)
        # device_put once: numpy weight trees otherwise re-upload per
        # block (measured 15 ms/block for the 4.4M large16k variant vs an
        # 8 ms real-time budget — see Denoiser.__init__).
        self.variables = jax.device_put(variables)
        self.frame_hop = fz_cfg.hop_length
        self.chunk_frames = chunk_frames
        self.hop = self.frame_hop * chunk_frames  # samples per call
        self.n_fft = fz_cfg.n_fft
        self._ratio = self.n_fft // self.frame_hop

        model, featurizer = self.model, self.featurizer
        k = chunk_frames
        hop = self.frame_hop
        n_fft = self.n_fft

        def core(variables, state: StreamState, specs: jax.Array):
            """K spectrum frames (k, F) -> (out (k*hop,), new state pieces)."""

            def feat_scan(feat_state, spec_t):
                feats_t, new_state = featurizer.step_from_spec_frame(
                    spec_t, feat_state
                )
                return new_state, feats_t

            feat_state, feats = jax.lax.scan(feat_scan, state.feat_state, specs)
            output, tgru_h = model.apply(
                variables, feats[None], state.tgru_h
            )  # (1, k, F, 2C)
            spec_out = denoised_spec_from_output(
                output[0],
                featurizer,
                cfg.network.phm_beta,
                mixture_spec=specs,
                source=cfg.network.phm_source,
            )  # (k, F)
            frames = jnp.fft.irfft(spec_out, n=n_fft, axis=-1)  # (k, n_fft)

            total = overlap_add(frames, hop, (k - 1) * hop + n_fft)
            total = total.at[:n_fft].add(state.ola_buffer)
            out = total[: k * hop] / float(self._ratio)
            ola = jnp.concatenate(
                [total[k * hop :], jnp.zeros((hop,), total.dtype)]
            )
            return out, feat_state, tgru_h, ola

        # The weight tree is passed as an EXPLICIT jit argument, never
        # captured in the closure. Tracing a closure over concrete arrays
        # bakes them into the HLO as dense literals, which READS the whole
        # device-pinned tree back to host at trace time — and after the
        # first device->host pull the axon plugin makes every subsequent
        # block_until_ready wait a full ~26 ms tunnel round-trip, so one
        # closure capture poisons per-block latency for the ENTIRE process
        # (measured: bench preview headline 0.38 ms -> 25.9 ms/block).
        # The per-call pytree flatten this would have saved is microseconds.

        def step(variables, state: StreamState, block: jax.Array):
            # slide the analysis window; frame the k new positions
            full = jnp.concatenate([state.in_buffer, block])  # n_fft + k*hop
            frames = frame_signal(full, n_fft, hop)[1:]  # (k, n_fft)
            specs = jnp.fft.rfft(frames, n=n_fft, axis=-1)
            out, feat_state, tgru_h, ola = core(variables, state, specs)
            return out, StreamState(full[k * hop :], feat_state, tgru_h, ola)

        def step_from_spec(variables, state: StreamState, spec_t: jax.Array):
            out, feat_state, tgru_h, ola = core(variables, state, spec_t[None])
            return out, StreamState(state.in_buffer, feat_state, tgru_h, ola)

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
        """chunk_frames*hop samples in -> the same number (delayed) out."""
        out, state = self._step(self.variables, state, jnp.asarray(block))
        return out, state

    def process_spec_frame(self, state: StreamState, spec_t):
        """Per-frame step from an externally-computed complex STFT frame
        (F,) — the exactness hook: feeding offline STFT frames reproduces
        the offline pipeline bit-for-bit (no zero-fill startup transient).
        Only meaningful with chunk_frames == 1."""
        if self.chunk_frames != 1:
            raise ValueError("process_spec_frame requires chunk_frames=1")
        out, state = self._step_from_spec(
            self.variables, state, jnp.asarray(spec_t)
        )
        return out, state

    def process(self, audio: np.ndarray):
        """Stream a whole waveform block-by-block (host loop; used by the
        CLI, tests, and the RTF benchmark). Returns the concatenated output
        (same length, 3-hop latency included)."""
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
