"""Pallas GRU kernel parity tests (interpret mode on CPU; the same kernel
compiles natively on TPU — benchmarked in bench.py / rt_bench)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinyrecurrentunet_tpu.ops.gru import gru_scan
from tinyrecurrentunet_tpu.ops.pallas_gru import gru_scan_pallas


def _params(rng, d, h):
    return [
        jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.3)
        for s in [(d, 3 * h), (h, 3 * h), (3 * h,), (3 * h,)]
    ]


class TestPallasGRU:
    @pytest.mark.parametrize("batch,length,d,h,chunk", [
        (16, 100, 64, 128, 32),   # TGRU regime
        (16, 64, 64, 128, 64),    # exact multiple
        (8, 7, 16, 32, 64),       # shorter than one chunk
    ])
    def test_matches_lax_scan(self, rng, batch, length, d, h, chunk):
        x = jnp.asarray(rng.standard_normal((batch, length, d)).astype(np.float32))
        params = _params(rng, d, h)
        h0 = jnp.asarray(rng.standard_normal((batch, h)).astype(np.float32) * 0.1)
        ref_out, ref_h = gru_scan(x, h0, *params)
        out, hT = gru_scan_pallas(x, h0, *params, interpret=True, chunk=chunk)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(hT), np.asarray(ref_h), rtol=1e-4, atol=1e-5)

    def test_reverse_matches(self, rng):
        x = jnp.asarray(rng.standard_normal((4, 33, 16)).astype(np.float32))
        params = _params(rng, 16, 32)
        h0 = jnp.zeros((4, 32))
        ref_out, ref_h = gru_scan(x, h0, *params, reverse=True)
        out, hT = gru_scan_pallas(x, h0, *params, reverse=True, interpret=True, chunk=16)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(hT), np.asarray(ref_h), rtol=1e-4, atol=1e-5)


class TestKernelPolicy:
    def test_shape_policy_matches_fenced_measurements(self):
        """The auto-selection predicate encodes the fenced end-to-end A/B
        (bench.py r3): kernel for narrow long scans everywhere, kernel for
        wide inference shapes only at hidden >= 256, scan for trainable
        wide shapes and short scans."""
        from tinyrecurrentunet_tpu.models.blocks import pallas_gru_shape_ok

        # flagship offline TGRU: 16 rows x 251 steps
        assert pallas_gru_shape_ok(16, 251, 128, False)
        # flagship offline FGRU: 251 rows, hidden 64 -> scan (2.8x loss)
        assert not pallas_gru_shape_ok(251, 16, 64, False)
        # large16k offline FGRU: 251 rows, hidden 256 -> kernel (1.3x win)
        assert pallas_gru_shape_ok(251, 17, 256, False)
        # same shape during training -> scan (wide trainable unmeasured)
        assert not pallas_gru_shape_ok(251, 17, 256, True)
        # streaming step (length 1) -> never
        assert not pallas_gru_shape_ok(16, 1, 128, False)
        # wide training batch (B*T rows) -> scan (11x loss measured r2)
        assert not pallas_gru_shape_ok(2008, 16, 256, True)


class TestPallasGRUVJP:
    @pytest.mark.parametrize("batch,length,d,h,chunk,reverse", [
        (4, 20, 8, 16, 8, False),
        (4, 20, 8, 16, 8, True),
        (3, 13, 8, 16, 8, False),   # padding path
        (16, 33, 64, 128, 16, False),  # TGRU-like shapes
        # wide training rows (> the 512-row tile): exercises the row-tiling
        # grid axis + row padding that fixed the r4 VMEM OOM (VERDICT #4)
        (520, 12, 8, 16, 8, False),
    ])
    def test_grads_match_lax_scan(self, rng, batch, length, d, h, chunk, reverse):
        from tinyrecurrentunet_tpu.ops.pallas_gru_vjp import gru_scan_pallas_trainable

        x = jnp.asarray(rng.standard_normal((batch, length, d)).astype(np.float32))
        params = _params(rng, d, h)
        h0 = jnp.asarray(rng.standard_normal((batch, h)).astype(np.float32) * 0.1)
        # a loss touching both the outputs and the final state
        w_out = jnp.asarray(rng.standard_normal((h,)).astype(np.float32))

        def loss_ref(x, h0, *ps):
            out, hT = gru_scan(x, h0, *ps, reverse=reverse)
            return jnp.mean(out * out) + jnp.sum(hT * w_out)

        def loss_pl(x, h0, *ps):
            out, hT = gru_scan_pallas_trainable(
                x, h0, *ps, reverse=reverse, interpret=True, chunk=chunk
            )
            return jnp.mean(out * out) + jnp.sum(hT * w_out)

        val_ref, g_ref = jax.value_and_grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(
            x, h0, *params
        )
        val_pl, g_pl = jax.value_and_grad(loss_pl, argnums=(0, 1, 2, 3, 4, 5))(
            x, h0, *params
        )
        np.testing.assert_allclose(float(val_pl), float(val_ref), rtol=1e-5)
        names = ["dx", "dh0", "dwi", "dwh", "dbi", "dbh"]
        for name, a, b in zip(names, g_pl, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-5,
                err_msg=f"{name} mismatch (reverse={reverse})",
            )

    def test_bfloat16_inputs(self, rng):
        """bf16 inputs work (the recurrence runs f32 inside the kernel) and
        stay close to the f32 reference."""
        from tinyrecurrentunet_tpu.ops.pallas_gru_vjp import gru_scan_pallas_trainable

        x = jnp.asarray(rng.standard_normal((4, 20, 8)).astype(np.float32))
        params = _params(rng, 8, 16)
        h0 = jnp.zeros((4, 16))
        ref_out, ref_h = gru_scan(x, h0, *params)
        out, hT = gru_scan_pallas_trainable(
            x.astype(jnp.bfloat16),
            h0.astype(jnp.bfloat16),
            *[p.astype(jnp.bfloat16) for p in params],
            interpret=True,
            chunk=8,
        )
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref_out), rtol=0.1, atol=0.05
        )

        def loss(x16):
            o, h = gru_scan_pallas_trainable(
                x16, h0.astype(jnp.bfloat16),
                *[p.astype(jnp.bfloat16) for p in params],
                interpret=True, chunk=8,
            )
            return jnp.mean(o.astype(jnp.float32) ** 2)

        g = jax.grad(loss)(x.astype(jnp.bfloat16))
        assert g.dtype == jnp.bfloat16
        assert np.all(np.isfinite(np.asarray(g, np.float32)))

    def test_forward_matches(self, rng):
        from tinyrecurrentunet_tpu.ops.pallas_gru_vjp import gru_scan_pallas_trainable

        x = jnp.asarray(rng.standard_normal((4, 25, 8)).astype(np.float32))
        params = _params(rng, 8, 16)
        h0 = jnp.zeros((4, 16))
        ref_out, ref_h = gru_scan(x, h0, *params)
        out, hT = gru_scan_pallas_trainable(x, h0, *params, interpret=True, chunk=8)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(hT), np.asarray(ref_h), rtol=1e-4, atol=1e-5)


class TestModelWithPallas:
    def test_trunet_pallas_inference_matches(self, rng):
        """Full model with the Pallas recurrence (interpret) == lax.scan."""
        from tinyrecurrentunet_tpu.config import NetworkConfig
        from tinyrecurrentunet_tpu.models import TRUNet

        cfg_ref = NetworkConfig(use_pallas_gru="never")
        cfg_pl = dataclasses.replace(cfg_ref, use_pallas_gru="always")
        x = jnp.asarray(rng.standard_normal((6, 257, 4)).astype(np.float32))
        model_ref = TRUNet(cfg_ref)
        variables = model_ref.init(jax.random.PRNGKey(0), x)
        y_ref, h_ref = model_ref.apply(variables, x)
        y_pl, h_pl = TRUNet(cfg_pl).apply(variables, x)
        np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_ref), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(h_pl), np.asarray(h_ref), rtol=1e-4, atol=1e-5)

    def test_training_path_stays_differentiable(self, rng):
        """train=True must keep the lax.scan path (Pallas has no VJP)."""
        from tinyrecurrentunet_tpu.config import NetworkConfig
        from tinyrecurrentunet_tpu.models import TRUNet

        model = TRUNet(NetworkConfig(use_pallas_gru="always"))
        x = jnp.asarray(rng.standard_normal((4, 257, 4)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x)

        def loss(params):
            (y, _), _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x,
                train=True,
                mutable=["batch_stats"],
            )
            return jnp.mean(y * y)

        g = jax.grad(loss)(variables["params"])
        assert all(np.all(np.isfinite(np.asarray(v))) for v in jax.tree.leaves(g))
