"""Trainable Pallas GRU: forward + hand-written backward (custom VJP).

Completes ops/pallas_gru.py for the training path: the forward kernel also
saves the per-step gate activations; the backward kernel walks the sequence
in reverse inside VMEM, carrying dL/dh and accumulating the hidden-weight
gradients on-chip, so BPTT costs one kernel launch instead of a 751-step
XLA while-loop in each direction.

Math (per step, torch gate order r,z,n — matches ops/gru.py):
  hp   = h_{t-1} @ Wh + bh         (split hp_r, hp_z, hp_n)
  r    = sigmoid(xp_r + hp_r)
  z    = sigmoid(xp_z + hp_z)
  n    = tanh(xp_n + r * hp_n)
  h_t  = (1 - z) * n + z * h_{t-1}

Backward (dh = upstream grad at step t + carry):
  dz      = dh * (h_{t-1} - n) * z * (1 - z)
  dn      = dh * (1 - z) * (1 - n^2)
  dr      = dn * hp_n * r * (1 - r)
  d_xp    = [dr, dz, dn]
  d_hp    = [dr, dz, dn * r]
  carry   = dh * z + d_hp @ Wh^T
  dWh    += h_{t-1}^T @ d_hp ;  dbh += sum_B d_hp

The input projection (xp = x @ Wi + bi) and its gradients are plain MXU
matmuls outside the kernels. Gradient checked against jax.grad of the
lax.scan reference in tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(x_ref, h0_ref, wh_ref, bh_ref, out_ref, hT_ref, save_ref, h_scratch):
    """Forward chunk; also writes residuals save[t] = concat(r, z, n, hp_n)."""
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
        h_proj = jnp.dot(h, wh, preferred_element_type=jnp.float32) + bh
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
        save_ref[t] = jnp.concatenate([r, z, n, hn], axis=-1)
        return 0

    jax.lax.fori_loop(0, chunk, body, 0)

    @pl.when(step == num_steps - 1)
    def _():
        hT_ref[:] = h_scratch[:]


def _bwd_kernel(
    g_ref,       # (CHUNK, B, H) upstream output grads, reversed time order
    hprev_ref,   # (CHUNK, B, H) h_{t-1} per step, reversed time order
    save_ref,    # (CHUNK, B, 4H) residuals, reversed time order
    wh_ref,      # (H, 3H)
    dxp_ref,     # out: (CHUNK, B, 3H) d(x_proj), reversed time order
    dwh_ref,     # out: (H, 3H) accumulated
    dbh_ref,     # out: (1, 3H) accumulated
    dh0_ref,     # out: (B, H) grad wrt h0 (the final carry)
    dh_scratch,
    dwh_scratch,
    dbh_scratch,
):
    step = pl.program_id(0)
    num_steps = pl.num_programs(0)
    chunk = g_ref.shape[0]
    hidden = g_ref.shape[2]

    @pl.when(step == 0)
    def _():
        dh_scratch[:] = jnp.zeros_like(dh_scratch)
        dwh_scratch[:] = jnp.zeros_like(dwh_scratch)
        dbh_scratch[:] = jnp.zeros_like(dbh_scratch)

    wh_t = wh_ref[:].T  # (3H, H)

    def body(t, _):
        dh = dh_scratch[:] + g_ref[t]
        saved = save_ref[t]
        r = saved[:, :hidden]
        z = saved[:, hidden : 2 * hidden]
        n = saved[:, 2 * hidden : 3 * hidden]
        hn = saved[:, 3 * hidden :]
        h_prev = hprev_ref[t]
        dz = dh * (h_prev - n) * z * (1.0 - z)
        dn = dh * (1.0 - z) * (1.0 - n * n)
        dr = dn * hn * r * (1.0 - r)
        d_xp = jnp.concatenate([dr, dz, dn], axis=-1)
        d_hp = jnp.concatenate([dr, dz, dn * r], axis=-1)
        dxp_ref[t] = d_xp
        dwh_scratch[:] += jnp.dot(
            h_prev.T, d_hp, preferred_element_type=jnp.float32
        )
        dbh_scratch[:] += jnp.sum(d_hp, axis=0, keepdims=True)
        dh_scratch[:] = dh * z + jnp.dot(
            d_hp, wh_t, preferred_element_type=jnp.float32
        )
        return 0

    jax.lax.fori_loop(0, chunk, body, 0)

    @pl.when(step == num_steps - 1)
    def _():
        dwh_ref[:] = dwh_scratch[:]
        dbh_ref[:] = dbh_scratch[:]
        dh0_ref[:] = dh_scratch[:]


def _pad_time(xs, chunk, length):
    pad = (-length) % chunk
    if pad:
        xs = jnp.pad(xs, ((0, pad),) + ((0, 0),) * (xs.ndim - 1))
    return xs, length + pad


def _auto_chunk(batch: int, hidden: int, length: int, requested: int | None) -> int:
    """Largest T-chunk whose VMEM-resident blocks fit a ~4 MB budget.

    Per step the kernels hold x_proj (3H) + residuals (4H) + outputs (H) +
    h_prev (H) + d_xp (3H) floats per batch row (the worst of fwd/bwd),
    double-buffered by the grid pipeline. Training shapes can be wide
    (B = clips x bottleneck_freqs = 128+), where large chunks blow the
    16 MB VMEM limit.
    """
    if requested is not None:
        return min(requested, max(length, 1))
    budget = 4 * 1024 * 1024
    bytes_per_step = batch * 4 * (9 * hidden)
    chunk = max(1, budget // max(bytes_per_step, 1))
    return int(min(chunk, max(length, 1), 128))


def _forward(x, h0, wi, wh, bi, bh, reverse, interpret, chunk):
    batch, length, _ = x.shape
    hidden = h0.shape[-1]
    x_proj = jnp.dot(x, wi, preferred_element_type=x.dtype) + bi
    if reverse:
        x_proj = x_proj[:, ::-1]
    # recurrence runs in f32 inside the kernels regardless of compute dtype
    xs = jnp.swapaxes(x_proj, 0, 1).astype(jnp.float32)  # (L, B, 3H)

    chunk = _auto_chunk(batch, hidden, length, chunk)
    xs, padded = _pad_time(xs, chunk, length)
    num_chunks = padded // chunk

    out, hT, saved = pl.pallas_call(
        _fwd_kernel,
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, batch, 3 * hidden), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, 3 * hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((chunk, batch, hidden), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, 4 * hidden), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((padded, batch, hidden), jnp.float32),
            jax.ShapeDtypeStruct((batch, hidden), jnp.float32),
            jax.ShapeDtypeStruct((padded, batch, 4 * hidden), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((batch, hidden), jnp.float32)],
        interpret=interpret,
    )(
        xs,
        h0.astype(jnp.float32),
        wh.astype(jnp.float32),
        bh.reshape(1, -1).astype(jnp.float32),
    )

    if padded != length:
        hT = out[length - 1]
    return out, hT, xs, saved, chunk, padded


def _to_outputs(out_scan, length, reverse, dtype):
    out = out_scan[:length]
    outputs = jnp.swapaxes(out, 0, 1)
    if reverse:
        outputs = outputs[:, ::-1]
    return outputs.astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def gru_scan_pallas_trainable(
    x, h0, wi, wh, bi, bh, reverse=False, interpret=False, chunk=None
):
    """Differentiable drop-in for ops.gru.gru_scan backed by Pallas kernels.

    x (B, L, D) -> (outputs (B, L, H), final hidden (B, H)).
    """
    out_scan, hT, _, _, _, _ = _forward(
        x, h0, wi, wh, bi, bh, reverse, interpret, chunk
    )
    return _to_outputs(out_scan, x.shape[1], reverse, x.dtype), hT.astype(x.dtype)


def _fwd_rule(x, h0, wi, wh, bi, bh, reverse, interpret, chunk):
    out_scan, hT, xs, saved, chunk_eff, padded = _forward(
        x, h0, wi, wh, bi, bh, reverse, interpret, chunk
    )
    outputs = _to_outputs(out_scan, x.shape[1], reverse, x.dtype)
    del xs
    residuals = (x, h0, wi, wh, out_scan, saved)
    return (outputs, hT.astype(x.dtype)), residuals


def _bwd_rule(reverse, interpret, chunk, residuals, grads):
    x, h0, wi, wh, out_scan, saved = residuals
    g_out, g_hT = grads
    batch, length, _ = x.shape
    hidden = h0.shape[-1]
    padded = out_scan.shape[0]
    chunk_eff = _auto_chunk(batch, hidden, length, chunk)
    num_chunks = padded // chunk_eff

    # upstream grads in scan-major order, matching the forward's xs
    g = jnp.swapaxes(g_out, 0, 1).astype(jnp.float32)  # (L, B, H)
    g_hT = g_hT.astype(jnp.float32)
    if reverse:
        g = g[::-1]
    # the final-state grad attaches to the last REAL step
    g = g.at[length - 1].add(g_hT)
    if padded != length:
        g = jnp.pad(g, ((0, padded - length), (0, 0), (0, 0)))

    # h_{t-1} sequence: h0 then the forward outputs shifted by one
    hprev = jnp.concatenate([h0[None], out_scan[:-1]], axis=0)

    # reversed time order for the backward walk. Padded steps sit at the
    # head of the reversed arrays; their upstream grads are zero, so the
    # carry stays zero until the first real step.
    g_rev = g[::-1]
    hprev_rev = hprev[::-1]
    saved_rev = saved[::-1]

    dxp_rev, dwh, dbh, dh0 = pl.pallas_call(
        _bwd_kernel,
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((chunk_eff, batch, hidden), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk_eff, batch, hidden), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk_eff, batch, 4 * hidden), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, 3 * hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((chunk_eff, batch, 3 * hidden), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, 3 * hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((padded, batch, 3 * hidden), jnp.float32),
            jax.ShapeDtypeStruct((hidden, 3 * hidden), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * hidden), jnp.float32),
            jax.ShapeDtypeStruct((batch, hidden), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((batch, hidden), jnp.float32),
            pltpu.VMEM((hidden, 3 * hidden), jnp.float32),
            pltpu.VMEM((1, 3 * hidden), jnp.float32),
        ],
        interpret=interpret,
    )(g_rev, hprev_rev, saved_rev, wh.astype(jnp.float32))

    dxp = dxp_rev[::-1][:length]  # (L, B, 3H) forward order
    d_xproj = jnp.swapaxes(dxp, 0, 1)  # (B, L, 3H)
    if reverse:
        d_xproj = d_xproj[:, ::-1]

    d_xproj = d_xproj.astype(x.dtype)
    dx = jnp.einsum("blh,dh->bld", d_xproj, wi)
    dwi = jnp.einsum("bld,blh->dh", x, d_xproj)
    dbi = jnp.sum(d_xproj, axis=(0, 1))
    return (
        dx,
        dh0.astype(x.dtype),
        dwi,
        dwh.astype(x.dtype),
        dbi,
        dbh.reshape(-1).astype(x.dtype),
    )


gru_scan_pallas_trainable.defvjp(_fwd_rule, _bwd_rule)
