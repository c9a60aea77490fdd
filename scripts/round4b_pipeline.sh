#!/bin/bash
# Round-4b unattended TPU pipeline: retrain on the reverb-emphasized corpus.
#
# Follow-up to scripts/round4_pipeline.sh (wait for it to finish first).
# The round-4 quality artifacts showed the pure-'reverb' row flat
# (-0.06 dB flagship / +0.46 dB large vs a measured +3.4 dB ideal-
# magnitude-mask oracle): the absolute-error losses let -5 dB additive
# items out-gradient the small reverb residual. data/procgen.py now
# oversamples pure reverb for TRAINING only (TRAIN_KIND_SCHEDULE, 25% of
# items; reverberant total 5/12) and widens the training DRR draw to
# -6..+8 dB (TRAIN_DRR_RANGE). Testset recipe unchanged — QUALITY*.json
# stays comparable. This script retrains flagship then large on that
# corpus and re-scores both.
#
# Stamps in /tmp/r4b_stamps; logs /tmp/round4b_pipe.log + /tmp/r4b_<stamp>.log.
set -u
cd /root/repo
STAMPS=/tmp/r4b_stamps
mkdir -p "$STAMPS"
LOG=/tmp/round4b_pipe.log
exec >>"$LOG" 2>&1

say() { echo "[$(date +%H:%M:%S)] $*"; }

tpu_up() {
    timeout 300 python - <<'EOF' >/dev/null 2>&1
import jax
import jax.numpy as jnp
x = jnp.ones((8, 8))
assert float((x @ x).sum()) > 0
EOF
}

wait_tpu() {
    local n=0
    until tpu_up; do
        n=$((n + 1))
        say "TPU probe $n failed; sleeping 300s"
        sleep 300
    done
    say "TPU up"
}

run_train() {
    local stamp=$1 exp=$2
    shift 2
    [ -f "$STAMPS/$stamp" ] && { say "skip $stamp (stamped)"; return 0; }
    local mfile="ckpt/$exp/logs/metrics.jsonl"
    local attempt=0
    while [ $attempt -lt 24 ]; do
        attempt=$((attempt + 1))
        wait_tpu
        say "start $stamp attempt $attempt: $*"
        "$@" >"/tmp/r4b_${stamp}.log" 2>&1 &
        local pid=$!
        # Age is measured from max(metrics mtime, THIS attempt's start):
        # a stale metrics.jsonl left by a killed earlier attempt otherwise
        # trips the watchdog 60 s into every retry (measured: attempt 2
        # killed at metrics age 1362 s before its first write).
        local started=$(date +%s)
        local grace=1200
        while kill -0 "$pid" 2>/dev/null; do
            sleep 60
            if [ -f "$mfile" ]; then
                local ref=$(stat -c %Y "$mfile")
                [ "$ref" -lt "$started" ] && ref=$started
                local age=$(( $(date +%s) - ref ))
                if [ "$age" -gt "$grace" ]; then
                    say "$stamp stalled (metrics age ${age}s) — killing $pid"
                    kill "$pid" 2>/dev/null
                    sleep 10
                    kill -9 "$pid" 2>/dev/null
                    break
                fi
                grace=900
            fi
        done
        wait "$pid"
        local rc=$?
        if [ $rc -eq 0 ]; then
            touch "$STAMPS/$stamp"
            say "done $stamp"
            return 0
        fi
        say "$stamp exited rc=$rc; retrying"
        sleep 60
    done
    say "GIVE UP on $stamp after $attempt attempts"
    return 1
}

run_step() {
    local stamp=$1 tmo=$2
    shift 2
    [ -f "$STAMPS/$stamp" ] && { say "skip $stamp (stamped)"; return 0; }
    local attempt=0
    while [ $attempt -lt 12 ]; do
        attempt=$((attempt + 1))
        wait_tpu
        say "start $stamp attempt $attempt: $*"
        if timeout "$tmo" "$@" >"/tmp/r4b_${stamp}.log" 2>&1; then
            touch "$STAMPS/$stamp"
            say "done $stamp"
            return 0
        fi
        say "$stamp failed (rc=$?); retrying"
        sleep 120
    done
    say "GIVE UP on $stamp"
    return 1
}

run_cpu() {
    local stamp=$1 tmo=$2
    shift 2
    [ -f "$STAMPS/$stamp" ] && { say "skip $stamp (stamped)"; return 0; }
    say "start $stamp: $*"
    if timeout "$tmo" "$@" >"/tmp/r4b_${stamp}.log" 2>&1; then
        touch "$STAMPS/$stamp"
        say "done $stamp"
        return 0
    fi
    say "FAILED $stamp (rc=$?)"
    return 1
}

say "=== round-4b pipeline start ==="

# Wait for round-4a to fully release the TPU (its last stamp is benchpreview).
while [ ! -f /tmp/r4_stamps/benchpreview ]; do
    say "waiting for round-4a pipeline (benchpreview stamp)"
    sleep 180
done
say "round-4a complete"

# Quality outputs go to scratch first; the session compares against the
# committed JSONs and only promotes artifacts that actually improved.
for exp in TRUNet-proc TRUNet-large; do
    if [ ! -f "$STAMPS/wipe_b_$exp" ]; then
        rm -rf "ckpt/$exp"
        touch "$STAMPS/wipe_b_$exp"
        say "wiped ckpt/$exp for the reverb-emphasis retrain"
    fi
done

# 1. Flagship retrain on TRAIN_KIND_SCHEDULE + TRAIN_DRR_RANGE corpus.
run_train train16b TRUNet-proc \
    python -m tinyrecurrentunet_tpu.train.loop -c config/proc16k.json --procedural
run_cpu artifact16b 1800 env JAX_PLATFORMS=cpu \
    python -m tinyrecurrentunet_tpu.train.export_pretrained \
    -c config/proc16k.json --out /tmp/r4b_artifacts/TRUNet-proc
run_cpu quant16b 1800 env JAX_PLATFORMS=cpu \
    python -m tinyrecurrentunet_tpu.export.quantize \
    -c config/proc16k.json --pretrained /tmp/r4b_artifacts/TRUNet-proc
run_step quality16b 7200 python -m tinyrecurrentunet_tpu.infer.quality \
    -c config/proc16k.json --pretrained /tmp/r4b_artifacts/TRUNet-proc \
    --int8 /tmp/r4b_artifacts/TRUNet-proc/model_int8.trq \
    --out /tmp/r4b_QUALITY.json

# 2. Full pytest suite in the TPU-idle window (single-core host: the
# suite must never overlap a TPU trainer's dispatch loop, CLAUDE.md).
# Runs between the flagship and large retrains so the round always gets a
# fresh full-suite result even if the large retrain doesn't fit.
run_cpu suiteb 3600 python -m pytest tests/ -q

# The large16k retrain was dropped from this round: it would still be
# training when the driver runs the round-end bench on this chip, and a
# concurrent trainer poisons every latency-shaped number (single host,
# single core). The committed large artifact already scores all-positive
# per-kind rows; the reverb-emphasized corpus retrain for it is round-5
# work.

say "=== round-4b pipeline complete ==="
