"""Driver entry-point contract tests.

Round-1 regression (MULTICHIP_r01.json, VERDICT weak #1): dryrun_multichip
silently depended on backend-initialization order — calling entry() (which
initializes the backend) first made the later mesh come up with 1 device.
The fix runs the SPMD body in a clean subprocess; these tests pin the
contract: entry-then-dryrun in ONE process must pass.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, ".")  # repo root on path for __graft_entry__


class TestEntry:
    def test_entry_is_jittable(self):
        import jax

        from __graft_entry__ import entry

        fn, args = entry()
        out = jax.jit(fn)(*args)
        out = np.asarray(out)
        assert out.shape == (32000,)
        assert np.all(np.isfinite(out))


class TestDryrunMultichip:
    def test_after_entry_same_process(self):
        """The driver's calling pattern: backend already initialized by
        entry(); dryrun_multichip(8) must still see 8 devices."""
        from __graft_entry__ import dryrun_multichip, entry

        fn, args = entry()  # initializes the (CPU) backend in this process
        dryrun_multichip(8)  # must not inherit this process's device count

    def test_subprocess_env_scrubbed(self, monkeypatch):
        """Even with hostile env (platform pinned to a nonexistent device
        count, stale force-host flag), the dryrun must scrub and pass."""
        monkeypatch.setenv("JAX_PLATFORMS", "axon,cpu")
        monkeypatch.setenv(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=1"
        )
        from __graft_entry__ import dryrun_multichip

        dryrun_multichip(4)


class TestMakeMesh:
    def test_raises_on_too_few_devices(self):
        from tinyrecurrentunet_tpu.parallel.mesh import make_mesh

        with pytest.raises(ValueError, match="device"):
            make_mesh(1024)

    def test_exact_count(self):
        from tinyrecurrentunet_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(8)
        assert mesh.devices.size == 8
