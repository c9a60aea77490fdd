"""TRU-Net: frequency-axis conv U-Net with FGRU/TGRU bottleneck.

The intended architecture of the reference (reference `network.py:122-171`,
`docs/net.jpg`), with its defects fixed by construction:
- D1/D2: the encoder/decoder are plain config-driven stacks.
- D3: the TGRU is wired in (FGRU over frequency, then TGRU over time) and
  its carry is an explicit input/output — the streaming state.
- D4: decoder skips are channel-concat (192 = 64 + 128), pad-to-match on
  the frequency axis.
- D5: every dimension comes from NetworkConfig.

TPU-first data layout: features are (B, T, F, C). Frame-local stages
(convs, FGRU) fold time into the batch axis — (B*T, F, C) — so the MXU sees
one large batch instead of 751 tiny per-frame ops; only the TGRU scans over
time, with batch (B*F'', C). This is what makes the single-frame streaming
step (reference `rt.py:21` semantics) and the full-sequence training graph
the same program.

Forward contract:
    y, tgru_h = model.apply(vars, x, tgru_h0, train=...)
    x: (B, T, F, C_in) or (T, F, C_in)
    y: (B, T, F, 2*C_in) — stacked mixture/noise feature sets
       (reference `util.py:217-222`)
    tgru_h: (B, F_bottleneck, tgru_hidden) carry; pass it back in to
       continue a stream (T=1 steps reproduce the full-sequence output).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from tinyrecurrentunet_tpu.config import NetworkConfig
from tinyrecurrentunet_tpu.models.blocks import (
    DepthwiseSeparableConv1d,
    GRUBlock,
    StandardConv1d,
    TrCNNBlock,
)
from tinyrecurrentunet_tpu.ops.conv import pad_or_crop


class TRUNet(nn.Module):
    config: NetworkConfig = NetworkConfig()

    def bottleneck_freqs(self, num_freqs: int) -> int:
        """Frequency-axis length at the bottleneck for a given input F."""
        f = num_freqs
        for i, (_, k, s) in enumerate(self.config.encoder):
            p = s // 2 if i == 0 else k // 2
            f = (f + 2 * p - k) // s + 1
        return f

    def init_tgru_state(self, batch: int, num_freqs: int, dtype=jnp.float32):
        """Zero TGRU carry for a (batch, num_freqs)-shaped input stream."""
        fb = self.bottleneck_freqs(num_freqs)
        return jnp.zeros((batch, fb, self.config.tgru_hidden), dtype)

    @nn.compact
    def __call__(self, x: jax.Array, tgru_h0: jax.Array | None = None, train: bool = False):
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)

        unbatched = x.ndim == 3
        if unbatched:
            x = x[None]
        batch, time, freqs, _ = x.shape
        x = x.astype(dtype)

        # ---- encoder: frame-local convs over frequency; fold time into batch
        z = x.reshape(batch * time, freqs, x.shape[-1])
        skips = []
        for i, (feat, k, s) in enumerate(cfg.encoder):
            if i == 0:
                z = StandardConv1d(feat, k, s, dtype=dtype)(z)
            else:
                z = DepthwiseSeparableConv1d(feat, k, s, dtype=dtype)(z, train=train)
            skips.append(z)

        # ---- bottleneck: FGRU over the downsampled frequency axis
        # (batch = B*T frames -> large MXU batches), then TGRU over time.
        fb = z.shape[1]
        z, _ = GRUBlock(
            cfg.fgru_hidden,
            cfg.fgru_out,
            bidirectional=True,
            dtype=dtype,
            use_pallas_gru=cfg.use_pallas_gru,
            scan_unroll=cfg.gru_scan_unroll,
        )(z, train=train)

        # TGRU: (B*T, Fb, C) -> (B*Fb, T, C), scan over time with carry.
        z = z.reshape(batch, time, fb, cfg.fgru_out)
        z = z.transpose(0, 2, 1, 3).reshape(batch * fb, time, cfg.fgru_out)
        if tgru_h0 is not None:
            h0 = tgru_h0.astype(dtype).reshape(batch * fb, cfg.tgru_hidden)
        else:
            h0 = None
        z, h_final = GRUBlock(
            cfg.tgru_hidden,
            cfg.tgru_out,
            dtype=dtype,
            use_pallas_gru=cfg.use_pallas_gru,
            scan_unroll=cfg.gru_scan_unroll,
        )(z, h0=h0, train=train)
        tgru_h = h_final.reshape(batch, fb, cfg.tgru_hidden)
        z = z.reshape(batch, fb, time, cfg.tgru_out)
        z = z.transpose(0, 2, 1, 3).reshape(batch * time, fb, cfg.tgru_out)

        # ---- decoder: skip-concat (except the first block), pad-to-match
        # on the frequency axis (reference `network.py:96-98,141-146`).
        dec = cfg.decoder
        z = TrCNNBlock(dec[0][0], dec[0][1], dec[0][2], dtype=dtype)(z, train=train)
        # skips for decoder blocks 1..N-1 are encoder outputs N-2..0 reversed,
        # skipping the bottleneck's own input (encoder block N-1).
        dec_skips = skips[-2::-1]
        for idx, ((feat, k, s), skip) in enumerate(zip(dec[1:], dec_skips), start=1):
            z = pad_or_crop(z, skip.shape[1], axis=1)
            z = jnp.concatenate([z, skip], axis=-1)
            is_last = idx == len(dec) - 1
            # The last block emits the stacked mixture/noise feature sets,
            # whose width follows input_size (6 for the 3-channel variant).
            feat = cfg.output_size if is_last else feat
            z = TrCNNBlock(feat, k, s, final_norm=not is_last, dtype=dtype)(
                z, train=train
            )

        z = pad_or_crop(z, freqs, axis=1)
        y = z.reshape(batch, time, freqs, cfg.output_size).astype(jnp.float32)
        if unbatched:
            return y[0], tgru_h
        return y, tgru_h
