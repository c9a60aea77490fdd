"""Two-process multi-host bring-up test (VERDICT round-1 item #7).

Exercises the path the reference could only run on real GPUs
(`distributed.py:150-189` per-GPU launcher + NCCL group): two OS processes
rendezvous via jax.distributed.initialize on localhost, each contributes
its loader shard, and one SPMD train step runs over the 2-device global
mesh with compiler-inserted cross-process collectives. Both processes must
report the identical loss.
"""

import os
import socket
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _clean_env() -> dict:
    """Pure-CPU single-local-device env for each worker (same scrub as
    __graft_entry__.dryrun_multichip: the sitecustomize axon plugin triggers
    must go, or the worker comes up on the TPU tunnel)."""
    env = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith(("PALLAS_AXON", "AXON_", "TPU_"))
    }
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = " ".join(
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


@pytest.mark.slow
def test_two_process_train_step_agrees():
    port = _free_port()
    coordinator = f"localhost:{port}"
    env = _clean_env()
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, coordinator, "2", str(pid)],
            env=env,
            cwd=_REPO,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        # 1200 s: two workers compile serially on this 1-core host under
        # full-suite load; the workers' own barrier timeouts are 600 s.
        out, err = p.communicate(timeout=1200)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(out)
    losses = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("LOSS ")]
        assert lines, f"no LOSS line in worker output:\n{out[-1000:]}"
        losses.append(float(lines[-1].split()[1]))
    assert losses[0] == losses[1], f"processes disagree: {losses}"
