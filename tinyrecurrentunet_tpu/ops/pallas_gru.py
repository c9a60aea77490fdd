"""Pallas TPU kernel for the GRU time scan.

The GRU's input projection is one large MXU matmul hoisted out of the scan
(ops/gru.py); what remains is the strictly-sequential part: per step, an
(B, H) x (H, 3H) matmul plus VPU gate math. This kernel runs that whole
recurrence inside VMEM:

- the hidden state lives in a VMEM scratch for the entire sequence (no
  HBM round trip between steps),
- Wh/bh are resident in VMEM,
- x_proj is streamed in T-chunks by the Pallas grid pipeline (grid steps
  execute sequentially on TPU, so the carry persists across chunks),
- each step issues one MXU dot (B x H x 3H) and a handful of VPU ops.

Layouts: x_proj (T, B, 3H) — B on the sublane axis, 3H on lanes; for the
TGRU (B=16 freq positions, H=128) every operand is exactly tile-aligned.

Numerics match ops.gru.gru_scan (same gate order/bias convention); the
fallback and the kernel are interchangeable, selected in models/blocks.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gru_kernel(x_ref, h0_ref, wh_ref, bh_ref, out_ref, hT_ref, h_scratch):
    """One grid step: advance the recurrence over this T-chunk.

    x_ref:   (CHUNK, B, 3H) projected inputs for this chunk
    h0_ref:  (B, H) initial hidden state
    wh_ref:  (H, 3H), bh_ref: (1, 3H)
    out_ref: (CHUNK, B, H) hidden states for this chunk
    hT_ref:  (B, H) final hidden state (written on the last grid step)
    h_scratch: (B, H) carry, persistent across grid steps
    """
    step = pl.program_id(0)
    num_steps = pl.num_programs(0)
    chunk = x_ref.shape[0]
    hidden = h0_ref.shape[1]

    @pl.when(step == 0)
    def _():
        h_scratch[:] = h0_ref[:]

    wh = wh_ref[:]
    bh = bh_ref[:]

    def body(t, _):
        h = h_scratch[:]
        x_t = x_ref[t]
        h_proj = (
            jnp.dot(h, wh, preferred_element_type=jnp.float32) + bh
        )
        xr = x_t[:, :hidden]
        xz = x_t[:, hidden : 2 * hidden]
        xn = x_t[:, 2 * hidden :]
        hr = h_proj[:, :hidden]
        hz = h_proj[:, hidden : 2 * hidden]
        hn = h_proj[:, 2 * hidden :]
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_next = (1.0 - z) * n + z * h
        h_scratch[:] = h_next
        out_ref[t] = h_next
        return 0

    jax.lax.fori_loop(0, chunk, body, 0)

    @pl.when(step == num_steps - 1)
    def _():
        hT_ref[:] = h_scratch[:]


@functools.partial(jax.jit, static_argnames=("reverse", "interpret", "chunk"))
def gru_scan_pallas(
    x: jax.Array,
    h0: jax.Array,
    wi: jax.Array,
    wh: jax.Array,
    bi: jax.Array,
    bh: jax.Array,
    reverse: bool = False,
    interpret: bool = False,
    chunk: int | None = None,
):
    """Drop-in replacement for ops.gru.gru_scan with the recurrence in a
    Pallas kernel. x (B, L, D) -> (outputs (B, L, H), final hidden (B, H)).
    """
    batch, length, _ = x.shape
    hidden = h0.shape[-1]
    out_dtype = x.dtype

    # one big MXU matmul for every step's input projection (input dtype,
    # e.g. bf16); the recurrence itself runs in f32 inside the kernel.
    x_proj = jnp.dot(x, wi, preferred_element_type=x.dtype) + bi  # (B, L, 3H)
    x_proj = x_proj.astype(jnp.float32)
    if reverse:
        x_proj = x_proj[:, ::-1]
    xs = jnp.swapaxes(x_proj, 0, 1)  # (L, B, 3H) scan-major

    # pad L to a chunk multiple; padded steps run but their outputs are
    # dropped and the carry is taken at the true final index. Auto-size the
    # chunk so VMEM-resident blocks (x_proj + outputs per step, double-
    # buffered) stay within budget at wide batch shapes.
    if chunk is None:
        budget = 4 * 1024 * 1024
        bytes_per_step = batch * 4 * (4 * hidden)
        chunk = int(max(1, min(budget // max(bytes_per_step, 1), 128)))
    chunk = min(chunk, max(length, 1))
    pad = (-length) % chunk
    if pad:
        # replicate the zero-update trick: padded x_proj of zeros still
        # mutates h, so instead pad and later take hT at index length-1
        xs = jnp.pad(xs, ((0, pad), (0, 0), (0, 0)))
    padded_len = length + pad
    num_chunks = padded_len // chunk

    out, h_final = pl.pallas_call(
        _gru_kernel,
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, batch, 3 * hidden), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, 3 * hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((chunk, batch, hidden), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((padded_len, batch, hidden), jnp.float32),
            jax.ShapeDtypeStruct((batch, hidden), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((batch, hidden), jnp.float32)],
        interpret=interpret,
    )(
        xs,
        h0.astype(jnp.float32),
        wh.astype(jnp.float32),
        bh.reshape(1, -1).astype(jnp.float32),
    )

    out = out[:length]
    if pad:
        # the kernel kept scanning through the zero padding; the true final
        # hidden state is the output at the last REAL step.
        h_final = out[length - 1]
    if reverse:
        out = out[::-1]
    return jnp.swapaxes(out, 0, 1).astype(out_dtype), h_final.astype(out_dtype)
