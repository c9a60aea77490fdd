"""Preemption recovery (VERDICT round-1 item #10, SURVEY.md §5).

The reference's only recovery story is restart-and-resume from the latest
checkpoint (`train.py:71-95`, `util.py:30-49`); it was never tested. Here a
real training process is SIGKILLed mid-run after its first checkpoint
commits, then restarted: the resumed run must pick up the latest checkpoint,
reach the configured iteration count, and the metrics JSONL must cover the
whole schedule across both process lifetimes (append-mode continuity).
"""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "_preempt_worker.py"
)


def _env():
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


def _committed_steps(ckpt_dir: str):
    if not os.path.isdir(ckpt_dir):
        return []
    steps = []
    for name in os.listdir(ckpt_dir):
        # orbax writes to a tmp dir and renames on commit
        if name.isdigit() and os.path.isdir(os.path.join(ckpt_dir, name)):
            steps.append(int(name))
    return sorted(steps)


@pytest.mark.slow
def test_sigkill_then_resume_completes(tmp_path):
    workdir = str(tmp_path)
    ckpt_dir = os.path.join(workdir, "preempt", "checkpoint")
    env = _env()

    # ---- phase 1: train with per-item delay; SIGKILL after first ckpt
    p1 = subprocess.Popen(
        [sys.executable, _WORKER, workdir, "0.4"],
        env=env,
        cwd=_REPO,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )
    deadline = time.time() + 600
    try:
        while time.time() < deadline:
            if _committed_steps(ckpt_dir):
                break
            if p1.poll() is not None:
                out = p1.stdout.read()
                raise AssertionError(
                    f"phase-1 exited before any checkpoint (rc={p1.returncode}):\n"
                    + out[-3000:]
                )
            time.sleep(0.1)
        else:
            raise AssertionError("no checkpoint appeared within the deadline")
        time.sleep(0.5)  # let the save finish its post-commit bookkeeping
        p1.send_signal(signal.SIGKILL)
        out1, _ = p1.communicate(timeout=60)
    finally:
        if p1.poll() is None:
            p1.kill()
    assert "DONE" not in out1, "phase 1 finished before the kill; no preemption"
    killed_at = _committed_steps(ckpt_dir)
    assert killed_at and killed_at[0] >= 10

    # ---- phase 2: restart with no delay; must resume and complete
    p2 = subprocess.run(
        [sys.executable, _WORKER, workdir, "0.0"],
        env=env,
        cwd=_REPO,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert p2.returncode == 0, p2.stdout[-3000:] + p2.stderr[-2000:]
    assert "DONE" in p2.stdout
    resumed = [
        l for l in p2.stdout.splitlines() if l.startswith("resumed from checkpoint")
    ]
    assert resumed, p2.stdout[-2000:]
    resume_iter = int(resumed[0].rsplit(" ", 1)[-1])
    assert resume_iter >= killed_at[0]

    # the final save lands at n_iters - 1
    final_steps = _committed_steps(ckpt_dir)
    assert max(final_steps) == 29, final_steps

    # ---- metrics JSONL continuity across both process lifetimes
    jsonl = os.path.join(workdir, "logs", "metrics.jsonl")
    with open(jsonl) as f:
        records = [json.loads(line) for line in f]
    steps = [r["step"] for r in records]
    assert set(steps) == {0, 5, 10, 15, 20, 25}, sorted(set(steps))
    # file order is non-decreasing: phase 2 appended after phase 1, resuming
    # at (not before) the checkpointed step
    assert steps == sorted(steps), steps
    # timestamps are monotone in file order (append-mode, no truncation)
    times = [r["time"] for r in records]
    assert all(t2 >= t1 for t1, t2 in zip(times, times[1:]))
