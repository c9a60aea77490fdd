"""Functional GRU: fused-gate matmuls + `lax.scan`, with explicit state.

Replaces the reference's cuDNN `nn.GRU` (reference `network.py:48`) with a
TPU-native design:

- The input projection for ALL timesteps is one big (B*L, D) x (D, 3H)
  matmul (MXU-friendly), hoisted out of the scan.
- The scan body is a single (B, H) x (H, 3H) matmul plus VPU gate math.
- The carry is explicit, so the same cell serves training (full-sequence
  scan) and streaming (one `gru_step` per frame) with bit-identical math —
  the TGRU streaming-state contract the reference never wired up (defect D3,
  `network.py:150`).

Math matches torch.nn.GRU (gate order r, z, n; separate input/hidden biases,
`b_ih`/`b_hh`), so parameter counts match the reference diagram
(`docs/net.jpg`: FGRU 82,880 / TGRU 82,880).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gru_project_inputs(x: jax.Array, wi: jax.Array, bi: jax.Array) -> jax.Array:
    """Input projection for all steps: (..., D) @ (D, 3H) + (3H,)."""
    return jnp.dot(x, wi, preferred_element_type=x.dtype) + bi


def _gates(x_proj_t: jax.Array, h: jax.Array, wh: jax.Array, bh: jax.Array):
    """One cell update from a projected input. Shapes: x_proj_t (B, 3H),
    h (B, H), wh (H, 3H), bh (3H,)."""
    hidden = h.shape[-1]
    h_proj = jnp.dot(h, wh, preferred_element_type=h.dtype) + bh
    xr, xz, xn = jnp.split(x_proj_t, 3, axis=-1)
    hr, hz, hn = jnp.split(h_proj, 3, axis=-1)
    del hidden
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return (1.0 - z) * n + z * h


def gru_step(
    x_t: jax.Array,
    h: jax.Array,
    wi: jax.Array,
    wh: jax.Array,
    bi: jax.Array,
    bh: jax.Array,
) -> jax.Array:
    """One streaming GRU step from a raw input frame x_t (B, D) -> h' (B, H)."""
    return _gates(gru_project_inputs(x_t, wi, bi), h, wh, bh)


def gru_scan(
    x: jax.Array,
    h0: jax.Array,
    wi: jax.Array,
    wh: jax.Array,
    bi: jax.Array,
    bh: jax.Array,
    reverse: bool = False,
    unroll: int = 1,
):
    """Full-sequence GRU.

    Args:
      x: (B, L, D) inputs.
      h0: (B, H) initial hidden state.
      reverse: scan right-to-left (for the bidirectional FGRU); outputs stay
        aligned with the input positions (torch bidirectional semantics).
      unroll: `lax.scan` unroll factor; same math, same HLO per step
        (equivalence pinned by test). Measured on real v5e
        (SCALING.json train_unroll_ab): no win at flagship shapes —
        unroll 4/8 cost ~4% on the train step, so the ~3% train MFU is
        bound by the serial recurrence chain, not XLA loop control.
        Shipped configs keep 1.

    Returns:
      (outputs (B, L, H), final_hidden (B, H)).
    """
    x_proj = gru_project_inputs(x, wi, bi)  # (B, L, 3H): one MXU matmul
    xs = jnp.swapaxes(x_proj, 0, 1)  # (L, B, 3H) scan-major

    def body(h, x_proj_t):
        h_next = _gates(x_proj_t, h, wh, bh)
        return h_next, h_next

    h_final, ys = jax.lax.scan(body, h0, xs, reverse=reverse, unroll=unroll)
    return jnp.swapaxes(ys, 0, 1), h_final
