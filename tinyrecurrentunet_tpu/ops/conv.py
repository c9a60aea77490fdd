"""1-D conv / transposed-conv primitives with torch-parity length semantics.

The reference's frequency-axis convs use torch Conv1d/ConvTranspose1d with
explicit paddings (reference `network.py:13-43,60-120`):
- conv: L_out = (L + 2p - k)//s + 1
- conv_transpose: L_out = (L - 1)*s - 2p + k

XLA-native: both lower to `lax.conv_general_dilated` (transposed = input
dilation), NWC layout so the channel axis rides the TPU lane dimension.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_DIMS = ("NWC", "WIO", "NWC")


def conv1d(
    x: jax.Array,
    w: jax.Array,
    stride: int,
    padding: int,
    groups: int = 1,
) -> jax.Array:
    """x (B, L, Cin), w (k, Cin//groups, Cout) -> (B, L_out, Cout)."""
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=_DIMS,
        feature_group_count=groups,
    )


def conv_transpose1d(
    x: jax.Array,
    w: jax.Array,
    stride: int,
    padding: int,
) -> jax.Array:
    """Transposed conv with torch length semantics.

    x (B, L, Cin), w (k, Cin, Cout) -> (B, (L-1)*stride - 2*padding + k, Cout).

    Implemented as explicit zero-insertion upsampling + a stride-1 conv
    rather than `lhs_dilation`: identical math and FLOPs (XLA lowers input
    dilation the same way), but this form legalizes everywhere — TFLite
    rejects `mhlo.convolution` with lhs_dilation while converting the
    zero-stuffed graph cleanly (see export/).
    """
    k = w.shape[0]
    if stride > 1:
        b, length, c = x.shape
        z = jnp.zeros((b, length, stride - 1, c), x.dtype)
        x = jnp.concatenate([x[:, :, None, :], z], axis=2).reshape(
            b, length * stride, c
        )
        x = x[:, : (length - 1) * stride + 1]
    pad = k - 1 - padding
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1,),
        padding=[(pad, pad)],
        dimension_numbers=_DIMS,
    )


def pad_or_crop(x: jax.Array, target_len: int, axis: int = -2) -> jax.Array:
    """Pad (or crop, for negative diff) `axis` to target_len with the
    reference's split: diff//2 at the front, the remainder at the back
    (reference `network.py:96-97` F.pad semantics, which crops on negative
    pads)."""
    cur = x.shape[axis]
    diff = target_len - cur
    if diff == 0:
        return x
    front, back = diff // 2, diff - diff // 2
    axis = axis % x.ndim
    if diff > 0:
        pads = [(0, 0)] * x.ndim
        pads[axis] = (front, back)
        return jnp.pad(x, pads)
    start = -front  # front is negative: crop from the start
    return jax.lax.slice_in_dim(x, start, start + target_len, axis=axis)
