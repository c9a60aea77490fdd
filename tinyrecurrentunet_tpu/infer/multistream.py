"""Batched multi-stream denoiser: N concurrent real-time streams per chip.

The production-serving mode: every per-stream state (sliding STFT window,
unwrap/PCEN carry, TGRU hidden, OLA tail) gets a leading stream axis and one
device call advances ALL streams by `chunk_frames` hops. The model already
batches natively (leading dim), so N streams cost one kernel launch and a
factor-N larger MXU batch — throughput scales until compute saturates,
measured as `streams_per_chip` in bench extras.

Numerics: each stream is bit-identical to running its own StreamingDenoiser
(tested): the batch axis never mixes streams (convs are frame-local, the
FGRU/TGRU batch over streams x frames / streams x freq).
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


class MultiStreamState(NamedTuple):
    in_buffer: jax.Array  # (N, n_fft)
    feat_state: FeaturizerState  # arrays (N, F); frame_count (N,)
    tgru_h: jax.Array  # (N, F_b, H)
    ola_buffer: jax.Array  # (N, n_fft)


class MultiStreamDenoiser:
    def __init__(
        self,
        cfg: Config,
        variables: dict,
        num_streams: int,
        chunk_frames: int = 1,
    ):
        fz_cfg = cfg.featurizer
        if fz_cfg.n_fft % fz_cfg.hop_length != 0:
            raise ValueError("streaming requires hop | n_fft")
        self.cfg = cfg
        self.model = TRUNet(cfg.network)
        self.featurizer = Featurizer(fz_cfg)
        # device_put once: numpy weight trees otherwise re-upload per call
        # (see Denoiser.__init__ / StreamingDenoiser.__init__).
        self.variables = jax.device_put(variables)
        self.num_streams = num_streams
        self.chunk_frames = chunk_frames
        self.frame_hop = fz_cfg.hop_length
        self.hop = self.frame_hop * chunk_frames
        self.n_fft = fz_cfg.n_fft
        self._ratio = self.n_fft // self.frame_hop

        model, featurizer = self.model, self.featurizer
        k, hop, n_fft = chunk_frames, self.frame_hop, self.n_fft

        # Weights passed as an EXPLICIT jit argument — closure capture
        # would bake them into the HLO as literals, reading the whole tree
        # device->host at trace time and flipping the axon plugin into its
        # ~26 ms-per-block_until_ready regime for the rest of the process
        # (see StreamingDenoiser — same poisoning, measured on the bench).

        def step(variables, state: MultiStreamState, blocks: jax.Array):
            """blocks (N, k*hop) -> (out (N, k*hop), new state)."""
            full = jnp.concatenate([state.in_buffer, blocks], axis=-1)
            frames = frame_signal(full, n_fft, hop)[:, 1:]  # (N, k, n_fft)
            specs = jnp.fft.rfft(frames, n=n_fft, axis=-1)  # (N, k, F)

            def feat_scan(feat_state, spec_t):  # spec_t (N, F)
                feats_t, new_state = featurizer.step_from_spec_frame(
                    spec_t, feat_state
                )
                return new_state, feats_t

            feat_state, feats = jax.lax.scan(
                feat_scan, state.feat_state, jnp.swapaxes(specs, 0, 1)
            )  # feats (k, N, F, C)
            feats = jnp.swapaxes(feats, 0, 1)  # (N, k, F, C)

            output, tgru_h = model.apply(variables, feats, state.tgru_h)
            spec_out = denoised_spec_from_output(
                output,
                featurizer,
                cfg.network.phm_beta,
                mixture_spec=specs,
                source=cfg.network.phm_source,
            )  # (N, k, F)
            td = jnp.fft.irfft(spec_out, n=n_fft, axis=-1)  # (N, k, n_fft)

            total = overlap_add(td, hop, (k - 1) * hop + n_fft)  # (N, L)
            total = total.at[:, :n_fft].add(state.ola_buffer)
            out = total[:, : k * hop] / float(self._ratio)
            ola = jnp.concatenate(
                [total[:, k * hop :], jnp.zeros((total.shape[0], hop), total.dtype)],
                axis=-1,
            )
            return out, MultiStreamState(
                full[:, k * hop :], feat_state, tgru_h, ola
            )

        self._step = jax.jit(step, donate_argnums=(1,))

    def init_state(self) -> MultiStreamState:
        n, f = self.num_streams, self.cfg.featurizer.num_freqs
        return MultiStreamState(
            in_buffer=jnp.zeros((n, self.n_fft), jnp.float32),
            feat_state=FeaturizerState(
                prev_phase=jnp.zeros((n, f), jnp.float32),
                unwrap_corr=jnp.zeros((n, f), jnp.float32),
                pcen_m=jnp.zeros((n, f), jnp.float32),
                frame_count=jnp.zeros((n,), jnp.int32),
            ),
            tgru_h=self.model.init_tgru_state(n, f),
            ola_buffer=jnp.zeros((n, self.n_fft), jnp.float32),
        )

    def process_block(self, state: MultiStreamState, blocks):
        """blocks (N, chunk_frames*hop) in -> same shape (delayed) out."""
        out, state = self._step(self.variables, state, jnp.asarray(blocks))
        return out, state

    def process(self, audio: np.ndarray):
        """Stream N waveforms (N, L) block-by-block; returns (N, L)."""
        n, length = audio.shape
        assert n == self.num_streams
        pad = (-length) % self.hop
        if pad:
            audio = np.pad(audio, ((0, 0), (0, pad)))
        state = self.init_state()
        outs = []
        for i in range(0, audio.shape[-1], self.hop):
            out, state = self.process_block(state, audio[:, i : i + self.hop])
            outs.append(np.asarray(out))
        return np.concatenate(outs, axis=-1)[:, :length], state
