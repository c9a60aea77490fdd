#!/bin/bash
# Round-5 unattended TPU pipeline: retrain the remaining artifacts on the
# reverb-emphasized TRAIN_KIND_SCHEDULE corpus (data/procgen.py: 25% pure
# reverb training share, TRAIN_DRR_RANGE -6..+8 dB).
#
# Round 4b retrained ONLY the 16 kHz flagship on that corpus (large16k was
# deferred: its trainer would have collided with the round-4 driver bench
# on this single-chip, single-core host). This script finishes the job:
#   1. large16k retrain  -> scratch /tmp/r5_artifacts/TRUNet-large
#   2. 48 kHz retrain    -> scratch /tmp/r5_artifacts/TRUNet-proc48
#   3. full pytest suite in the TPU-idle window
#
# Outputs go to scratch; the session compares /tmp/r5_QUALITY*.json against
# the committed QUALITY*.json and only promotes artifacts that actually
# improved (the committed large reverb row is the target: +0.46 dB vs the
# +3.35 dB ideal-magnitude-mask oracle, ORACLE.json).
#
# Stamps in /tmp/r5_stamps; logs /tmp/round5_pipe.log + /tmp/r5_<stamp>.log.
set -u
cd /root/repo
STAMPS=/tmp/r5_stamps
mkdir -p "$STAMPS"
LOG=/tmp/round5_pipe.log
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
        "$@" >"/tmp/r5_${stamp}.log" 2>&1 &
        local pid=$!
        # Watchdog age = max(metrics mtime, THIS attempt's start) — a stale
        # metrics.jsonl from a killed attempt must not trip the next one.
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
        if timeout "$tmo" "$@" >"/tmp/r5_${stamp}.log" 2>&1; then
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
    if timeout "$tmo" "$@" >"/tmp/r5_${stamp}.log" 2>&1; then
        touch "$STAMPS/$stamp"
        say "done $stamp"
        return 0
    fi
    say "FAILED $stamp (rc=$?)"
    return 1
}

say "=== round-5 pipeline start ==="

# Fresh retrains on the kind-schedule corpus: wipe old checkpoints once.
for exp in TRUNet-large TRUNet-proc48; do
    if [ ! -f "$STAMPS/wipe5_$exp" ]; then
        rm -rf "ckpt/$exp"
        touch "$STAMPS/wipe5_$exp"
        say "wiped ckpt/$exp for the kind-schedule retrain"
    fi
done

# 1. large16k retrain (the Pallas-kernel flagship, 55k iters).
run_train trainlarge5 TRUNet-large \
    python -m tinyrecurrentunet_tpu.train.loop -c config/large16k.json --procedural
run_cpu artifactlarge5 1800 env JAX_PLATFORMS=cpu \
    python -m tinyrecurrentunet_tpu.train.export_pretrained \
    -c config/large16k.json --out /tmp/r5_artifacts/TRUNet-large
run_cpu quantlarge5 1800 env JAX_PLATFORMS=cpu \
    python -m tinyrecurrentunet_tpu.export.quantize \
    -c config/large16k.json --pretrained /tmp/r5_artifacts/TRUNet-large
run_step qualitylarge5 7200 python -m tinyrecurrentunet_tpu.infer.quality \
    -c config/large16k.json --pretrained /tmp/r5_artifacts/TRUNet-large \
    --int8 /tmp/r5_artifacts/TRUNet-large/model_int8.trq \
    --out /tmp/r5_QUALITYLARGE.json

# 2. 48 kHz retrain (30k iters).
run_train train48b TRUNet-proc48 \
    python -m tinyrecurrentunet_tpu.train.loop -c config/proc48k.json --procedural
run_cpu artifact48b 1800 env JAX_PLATFORMS=cpu \
    python -m tinyrecurrentunet_tpu.train.export_pretrained \
    -c config/proc48k.json --out /tmp/r5_artifacts/TRUNet-proc48
run_cpu quant48b 1800 env JAX_PLATFORMS=cpu \
    python -m tinyrecurrentunet_tpu.export.quantize \
    -c config/proc48k.json --pretrained /tmp/r5_artifacts/TRUNet-proc48
run_step quality48b 7200 python -m tinyrecurrentunet_tpu.infer.quality \
    -c config/proc48k.json --pretrained /tmp/r5_artifacts/TRUNet-proc48 \
    --int8 /tmp/r5_artifacts/TRUNet-proc48/model_int8.trq \
    --out /tmp/r5_QUALITY48.json

# 3. Full pytest suite in the TPU-idle window (single-core host:
# never overlap a TPU trainer's dispatch loop, CLAUDE.md).
run_cpu suite5 3600 python -m pytest tests/ -q

say "=== round-5 pipeline complete ==="
