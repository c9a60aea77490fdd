"""TRU-Net building blocks (flax.linen), TPU-first.

Block structure matches the reference's intended architecture
(reference `network.py:9-120`, `docs/net.jpg`), with TPU-native choices:
- NWC layout (channels on the lane axis),
- pointwise convs as Dense (same math, simpler fusion),
- GRUs from `ops.gru` (fused gate matmuls + lax.scan, explicit carry),
- BatchNorm with running averages for inference/streaming so the
  frame-at-a-time graph equals the full-sequence graph (SURVEY.md §7
  "streaming state semantics").

Parameter counts reproduce the reference diagram (`docs/net.jpg`):
encoder 81,344 / FGRU 82,880 / TGRU 82,880 (see tests/test_model.py).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from tinyrecurrentunet_tpu.ops import conv as conv_ops
from tinyrecurrentunet_tpu.ops import gru as gru_ops

Dtype = Any


def _torch_gru_init(hidden: int):
    """torch.nn.GRU reset_parameters: U(-1/sqrt(H), 1/sqrt(H))."""
    k = 1.0 / float(hidden) ** 0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -k, k)

    return init


class StandardConv1d(nn.Module):
    """Conv1d(pad=stride//2) + ReLU (reference `network.py:9-21`)."""

    features: int
    kernel: int
    stride: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            (self.kernel,),
            strides=(self.stride,),
            padding=[(self.stride // 2, self.stride // 2)],
            dtype=self.dtype,
        )(x)
        return nn.relu(x)


class DepthwiseSeparableConv1d(nn.Module):
    """pointwise 1x1 -> BN -> ReLU -> depthwise(k, s) -> BN -> ReLU
    (reference `network.py:24-43`)."""

    features: int
    kernel: int
    stride: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.features, dtype=self.dtype)(x)  # pointwise conv
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        x = nn.relu(x)
        w = self.param(
            "depthwise_kernel",
            nn.initializers.lecun_normal(),
            (self.kernel, 1, self.features),
            jnp.float32,
        )
        b = self.param("depthwise_bias", nn.initializers.zeros, (self.features,), jnp.float32)
        x = conv_ops.conv1d(
            x,
            w.astype(self.dtype),
            stride=self.stride,
            padding=self.kernel // 2,
            groups=self.features,
        ) + b.astype(self.dtype)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        return nn.relu(x)


def pallas_gru_shape_ok(
    rows: int, length: int, hidden: int, trainable: bool
) -> bool:
    """Shape classes where the Pallas GRU kernel beats `lax.scan` on TPU,
    from the fenced end-to-end A/B `bench.py` records every round (see the
    policy discussion in `GRU._scan`):

    - narrow batch + long scan (rows <= 64, length >= 16): the
      VMEM-resident carry wins or ties at every measured size;
    - wide-but-bounded inference shapes with hidden >= 256 (the 4.4M
      `large16k` variant, 251-row FGRU): per-step matmuls are big enough
      that the kernel wins ~1.25x median end to end — inference only, because
      the wide trainable path is unmeasured and r2 measured an 11x scan
      win on wide flagship training batches;
    - short scans (length < 16, e.g. streaming steps) never qualify: the
      kernel only adds compile time.
    """
    return length >= 16 and (
        rows <= 64 or (not trainable and hidden >= 256 and rows <= 512)
    )


class GRU(nn.Module):
    """Single-layer (optionally bidirectional) GRU with torch param layout.

    Returns (outputs (B, L, H*dirs), final_hidden (B, H) of the forward
    direction) — the forward-direction carry is the streaming state.
    """

    hidden: int
    bidirectional: bool = False
    dtype: Dtype = jnp.float32

    def _direction_params(self, name: str, in_features: int):
        init = _torch_gru_init(self.hidden)
        wi = self.param(f"wi_{name}", init, (in_features, 3 * self.hidden), jnp.float32)
        wh = self.param(f"wh_{name}", init, (self.hidden, 3 * self.hidden), jnp.float32)
        bi = self.param(f"bi_{name}", init, (3 * self.hidden,), jnp.float32)
        bh = self.param(f"bh_{name}", init, (3 * self.hidden,), jnp.float32)
        return tuple(p.astype(self.dtype) for p in (wi, wh, bi, bh))

    use_pallas: str = "never"  # "auto" | "always" | "never"
    trainable_kernel: bool = False  # use the custom-VJP kernel (training)
    scan_unroll: int = 1  # lax.scan unroll factor (ops/gru.py gru_scan)

    def _scan(self, x, h0, params, reverse=False):
        # Kernel selection is by SHAPE, from measured truth on TPU v5e
        # (VERDICT round-1 #8 / round-2 #9). Round 3 re-measured with the
        # honest D2H-fenced slope protocol (bench.py _throughput_seconds;
        # the earlier BUR-based timings under-measured real compute):
        # - flagship (381k params, fgru 64/tgru 128): forcing the kernel
        #   everywhere loses 2.8x end to end (offline 0.72 ms vs 0.26 ms
        #   scan) - the rows>64 FGRU shapes are the damage; the narrow
        #   TGRU (16 rows x 251) is a wash either way at this size.
        # - large variant (4.4M params, fgru 256/tgru 512): the kernel
        #   wins 1.33x end to end (0.49 ms vs 0.65 ms scan) INCLUDING the
        #   251-row FGRU - at hidden >= 256 the per-step matmul is big
        #   enough that the VMEM-resident carry pays off even wide. Hence
        #   the hidden>=256 relaxation below, inference-only: training
        #   shapes (trainable_kernel) keep the conservative rule because
        #   the wide-batch trainable path is unmeasured at these sizes,
        #   and r2 measured an 11x scan win on wide flagship batches.
        # - short scans (streaming steps, length < 16): kernel only adds
        #   compile time.
        # bench.py records the flagship and large A/B every round so this
        # policy stays pinned to data.
        rows, length = x.shape[0], x.shape[1]
        if self.use_pallas == "always" or (
            self.use_pallas == "auto"
            and pallas_gru_shape_ok(
                rows, length, self.hidden, self.trainable_kernel
            )
            and jax.default_backend() == "tpu"
        ):
            interpret = jax.default_backend() != "tpu"
            if self.trainable_kernel:
                from tinyrecurrentunet_tpu.ops.pallas_gru_vjp import (
                    gru_scan_pallas_trainable,
                )

                return gru_scan_pallas_trainable(
                    x, h0, *params, reverse=reverse, interpret=interpret
                )
            from tinyrecurrentunet_tpu.ops.pallas_gru import gru_scan_pallas

            return gru_scan_pallas(
                x, h0, *params, reverse=reverse, interpret=interpret
            )
        return gru_ops.gru_scan(
            x, h0, *params, reverse=reverse, unroll=self.scan_unroll
        )

    @nn.compact
    def __call__(self, x, h0=None):
        batch = x.shape[0]
        if h0 is None:
            h0 = jnp.zeros((batch, self.hidden), self.dtype)
        params_f = self._direction_params("fwd", x.shape[-1])
        out_f, h_f = self._scan(x, h0, params_f)
        if not self.bidirectional:
            return out_f, h_f
        params_b = self._direction_params("bwd", x.shape[-1])
        h0_b = jnp.zeros((batch, self.hidden), self.dtype)
        out_b, _ = self._scan(x, h0_b, params_b, reverse=True)
        return jnp.concatenate([out_f, out_b], axis=-1), h_f


class GRUBlock(nn.Module):
    """GRU -> 1x1 projection -> BN -> ReLU (reference `network.py:45-58`)."""

    hidden: int
    out_features: int
    bidirectional: bool = False
    dtype: Dtype = jnp.float32
    use_pallas_gru: str = "auto"
    scan_unroll: int = 1

    @nn.compact
    def __call__(self, x, h0=None, train: bool = False):
        # Training uses the custom-VJP kernel (hand-written BPTT walk);
        # inference uses the lighter forward-only kernel (no residuals).
        out, h_final = GRU(
            self.hidden,
            bidirectional=self.bidirectional,
            dtype=self.dtype,
            use_pallas=self.use_pallas_gru,
            trainable_kernel=train,
            scan_unroll=self.scan_unroll,
        )(x, h0)
        out = nn.Dense(self.out_features, dtype=self.dtype)(out)
        out = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(out)
        return nn.relu(out), h_final


class TrCNNBlock(nn.Module):
    """1x1 conv -> BN -> ReLU -> ConvTranspose(k, s, p=s//2) [-> BN -> ReLU].

    Covers FirstTrCNN / TrCNN / LastTrCNN (reference `network.py:60-120`):
    the skip concat happens in the caller; `final_norm=False` gives the
    LastTrCNN variant (no trailing BN/ReLU).
    """

    features: int
    kernel: int
    stride: int
    final_norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.features, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        x = nn.relu(x)
        w = self.param(
            "tr_kernel",
            nn.initializers.lecun_normal(),
            (self.kernel, self.features, self.features),
            jnp.float32,
        )
        b = self.param("tr_bias", nn.initializers.zeros, (self.features,), jnp.float32)
        x = conv_ops.conv_transpose1d(
            x, w.astype(self.dtype), stride=self.stride, padding=self.stride // 2
        ) + b.astype(self.dtype)
        if self.final_norm:
            x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
            x = nn.relu(x)
        return x
