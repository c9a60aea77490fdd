#!/bin/bash
# Round-4 unattended TPU pipeline.
#
# The TPU tunnel goes down for hours at a time (CLAUDE.md); this script
# waits for (1) the CPU-heavy pytest suite to finish (single-core host —
# concurrent CPU load starves the trainer's dispatch loop) and (2) the
# tunnel to answer a fenced probe, then runs the round-4 sequence:
#
#   scaling study -> retrain proc16k on the -5..25 dB + noisy_reverb corpus
#   -> artifact + QUALITY.json -> retrain large16k -> artifact + QUALITYLARGE
#   -> retrain proc48k -> artifact + QUALITY48 -> bench preview
#
# Every TPU step is retried through tunnel drops: the trainer resumes from
# its last checkpoint, and a stall watchdog kills a hung trainer (tunnel
# drops make jax dispatch hang, not crash) by recorded PID when
# ckpt/<exp>/logs/metrics.jsonl stops advancing.
#
# Stamps in /tmp/r4_stamps make the script idempotent: rerunning skips
# completed steps.
set -u
cd /root/repo
STAMPS=/tmp/r4_stamps
mkdir -p "$STAMPS"
LOG=/tmp/round4_pipe.log
exec >>"$LOG" 2>&1

say() { echo "[$(date +%H:%M:%S)] $*"; }

wait_cpu_quiet() {
    # Wait for any full pytest suite launched earlier to release the core.
    while ps -p "${SUITE_PID:-0}" >/dev/null 2>&1; do
        say "waiting for pytest suite pid=$SUITE_PID"
        sleep 120
    done
}

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

# Run a training module with a stall watchdog. $1=stamp $2=exp_name $3...=cmd
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
        "$@" >"/tmp/r4_${stamp}.log" 2>&1 &
        local pid=$!
        # Stall watchdog: metrics.jsonl must advance at least every 15 min
        # (first compile ~2 min; valid every 500 iters is seconds).
        local grace=1200
        while kill -0 "$pid" 2>/dev/null; do
            sleep 60
            if [ -f "$mfile" ]; then
                local age=$(( $(date +%s) - $(stat -c %Y "$mfile") ))
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

# Run a bounded TPU step (quality eval, scaling, bench) with retries.
run_step() {
    local stamp=$1 tmo=$2
    shift 2
    [ -f "$STAMPS/$stamp" ] && { say "skip $stamp (stamped)"; return 0; }
    local attempt=0
    while [ $attempt -lt 12 ]; do
        attempt=$((attempt + 1))
        wait_tpu
        say "start $stamp attempt $attempt: $*"
        if timeout "$tmo" "$@" >"/tmp/r4_${stamp}.log" 2>&1; then
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

# CPU-only step (exports); no TPU wait.
run_cpu() {
    local stamp=$1 tmo=$2
    shift 2
    [ -f "$STAMPS/$stamp" ] && { say "skip $stamp (stamped)"; return 0; }
    say "start $stamp: $*"
    if timeout "$tmo" "$@" >"/tmp/r4_${stamp}.log" 2>&1; then
        touch "$STAMPS/$stamp"
        say "done $stamp"
        return 0
    fi
    say "FAILED $stamp (rc=$?)"
    return 1
}

say "=== round-4 pipeline start ==="
wait_cpu_quiet

# Fresh retrains on the new corpus: wipe round-3 checkpoints exactly once.
for exp in TRUNet-proc TRUNet-large TRUNet-proc48; do
    if [ ! -f "$STAMPS/wipe_$exp" ]; then
        rm -rf "ckpt/$exp"
        touch "$STAMPS/wipe_$exp"
        say "wiped ckpt/$exp for the round-4 corpus retrain"
    fi
done

# 1. Scaling study first (quick; informs batch policy; SCALING.json).
run_step scaling 5400 python -m tinyrecurrentunet_tpu.train.scaling \
    -c config/proc16k.json --batches 16,32,64,128 --out SCALING.json

# 2. Flagship 16 kHz retrain on the -5..25 dB + noisy_reverb corpus.
run_train train16 TRUNet-proc \
    python -m tinyrecurrentunet_tpu.train.loop -c config/proc16k.json --procedural
run_cpu artifact16 1800 env JAX_PLATFORMS=cpu \
    python -m tinyrecurrentunet_tpu.train.export_pretrained \
    -c config/proc16k.json --out artifacts/TRUNet-proc
run_cpu quant16 1800 env JAX_PLATFORMS=cpu \
    python -m tinyrecurrentunet_tpu.export.quantize \
    -c config/proc16k.json --pretrained artifacts/TRUNet-proc
run_step quality16 7200 python -m tinyrecurrentunet_tpu.infer.quality \
    -c config/proc16k.json --pretrained artifacts/TRUNet-proc \
    --int8 artifacts/TRUNet-proc/model_int8.trq --out QUALITY.json

# 3. large16k (the Pallas-kernel flagship).
run_train trainlarge TRUNet-large \
    python -m tinyrecurrentunet_tpu.train.loop -c config/large16k.json --procedural
run_cpu artifactlarge 1800 env JAX_PLATFORMS=cpu \
    python -m tinyrecurrentunet_tpu.train.export_pretrained \
    -c config/large16k.json --out artifacts/TRUNet-large
run_cpu quantlarge 1800 env JAX_PLATFORMS=cpu \
    python -m tinyrecurrentunet_tpu.export.quantize \
    -c config/large16k.json --pretrained artifacts/TRUNet-large
run_step qualitylarge 7200 python -m tinyrecurrentunet_tpu.infer.quality \
    -c config/large16k.json --pretrained artifacts/TRUNet-large \
    --int8 artifacts/TRUNet-large/model_int8.trq --out QUALITYLARGE.json

# 4. 48 kHz regime.
run_train train48 TRUNet-proc48 \
    python -m tinyrecurrentunet_tpu.train.loop -c config/proc48k.json --procedural
run_cpu artifact48 1800 env JAX_PLATFORMS=cpu \
    python -m tinyrecurrentunet_tpu.train.export_pretrained \
    -c config/proc48k.json --out artifacts/TRUNet-proc48
run_cpu quant48 1800 env JAX_PLATFORMS=cpu \
    python -m tinyrecurrentunet_tpu.export.quantize \
    -c config/proc48k.json --pretrained artifacts/TRUNet-proc48
run_step quality48 7200 python -m tinyrecurrentunet_tpu.infer.quality \
    -c config/proc48k.json --pretrained artifacts/TRUNet-proc48 \
    --int8 artifacts/TRUNet-proc48/model_int8.trq --out QUALITY48.json

# 5. Bench preview (the driver runs the real BENCH_r04 at round end).
run_step benchpreview 5400 sh -c 'python bench.py > /tmp/bench_r4_preview.json'

say "=== round-4 pipeline complete ==="
