#!/bin/bash
# Round-5 unattended TPU pipeline (VERDICT r4 "next round" items),
# ordered by value-per-wall-clock-hour:
#   0. 60 s native-ring soak (VERDICT #6) -> /tmp/r5_SOAK.json
#   1. Flagship 16k retrain with ALL round-5 levers (per-item loss norm,
#      diverse babble, b64/bf16; VERDICT #1/#2/#3)
#      -> /tmp/r5_artifacts/TRUNet-proc + /tmp/r5_QUALITY.json
#   2. Pallas trainable-GRU A/B at production batches (post row-tiling fix,
#      VERDICT #4) -> SCALING.json train_kernel_ab (no more "oom" rows
#      expected; if the kernel still loses, the session deletes it).
#   3. 48 kHz retrain (b16/bf16)  -> /tmp/r5_QUALITY48.json
#   4. TBPTT long-context variant (VERDICT #7) -> /tmp/r5_QUALITYTBPTT.json
#   5. large16k retrain (b16/bf16) -> /tmp/r5_QUALITYLARGE.json
#   6. full pytest suite in the TPU-idle window
#
# Candidate outputs land in /tmp; the session compares against the
# committed QUALITY*.json (scripts/compare_quality.py) and only promotes
# artifacts that improved (reverb row >= +0.5 dB and babble >= +2.0 dB are
# the round-5 gates for the flagship; no other kind may regress > 0.25 dB).
#
# Stamps in /tmp/r5_stamps; logs /tmp/round5_pipe.log + /tmp/r5_<stamp>.log.
set -u
cd /root/repo
STAMPS=/tmp/r5_stamps
mkdir -p "$STAMPS" /tmp/r5_artifacts
LOG=/tmp/round5_pipe.log
exec >>"$LOG" 2>&1

say() { echo "[$(date +%H:%M:%S)] $*"; }

tpu_up() {
    # The tunnel's first-D2H relay handshake has been measured as slow as
    # ~262 s on this rig (round 5); 300 s timed out three probes in a row.
    timeout 580 python - <<'EOF' >/dev/null 2>&1
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

# Fresh retrains with the round-5 levers: wipe old checkpoints once.
for exp in TRUNet-proc TRUNet-proc48 TRUNet-large; do
    if [ ! -f "$STAMPS/wipe5_$exp" ]; then
        rm -rf "ckpt/$exp"
        touch "$STAMPS/wipe5_$exp"
        say "wiped ckpt/$exp for the round-5 retrain"
    fi
done

# Stage order is wall-clock-priority (round 5 lost ~6 h to driver overhead
# + tunnel-handshake probe failures before the first train step): the
# cheap soak first, then the flagship retrain (VERDICT #1/#2/#3 — the
# round's headline), then everything else in descending value-per-hour.

# 0. 60 s wall-clock soak through the native rings (VERDICT #6).
run_step soak5 900 python -m tinyrecurrentunet_tpu.infer.soak \
    -c config/proc16k.json --duration 60 --out /tmp/r5_SOAK.json

# 1. Flagship retrain: per-item norm + diverse babble + b64/bf16.
run_train train16 TRUNet-proc \
    python -m tinyrecurrentunet_tpu.train.loop -c config/proc16k.json --procedural
run_cpu artifact16 1800 env JAX_PLATFORMS=cpu \
    python -m tinyrecurrentunet_tpu.train.export_pretrained \
    -c config/proc16k.json --out /tmp/r5_artifacts/TRUNet-proc
run_cpu quant16 1800 env JAX_PLATFORMS=cpu \
    python -m tinyrecurrentunet_tpu.export.quantize \
    -c config/proc16k.json --pretrained /tmp/r5_artifacts/TRUNet-proc
run_step quality16 7200 python -m tinyrecurrentunet_tpu.infer.quality \
    -c config/proc16k.json --pretrained /tmp/r5_artifacts/TRUNet-proc \
    --int8 /tmp/r5_artifacts/TRUNet-proc/model_int8.trq \
    --out /tmp/r5_QUALITY.json

# 2. Pallas trainable-kernel A/B at production shapes (post row-tiling
#    fix, VERDICT #4) -> SCALING.json train_kernel_ab.
run_step kernelab5 5400 python -m tinyrecurrentunet_tpu.train.scaling \
    -c config/proc16k.json --kernel_ab_only --batches 8,16,64 \
    --ab_dtypes float32,bfloat16 --out SCALING.json

# 3. 48 kHz retrain (b16/bf16 + both quality levers).
run_train train48 TRUNet-proc48 \
    python -m tinyrecurrentunet_tpu.train.loop -c config/proc48k.json --procedural
run_cpu artifact48 1800 env JAX_PLATFORMS=cpu \
    python -m tinyrecurrentunet_tpu.train.export_pretrained \
    -c config/proc48k.json --out /tmp/r5_artifacts/TRUNet-proc48
run_cpu quant48 1800 env JAX_PLATFORMS=cpu \
    python -m tinyrecurrentunet_tpu.export.quantize \
    -c config/proc48k.json --pretrained /tmp/r5_artifacts/TRUNet-proc48
run_step quality48 7200 python -m tinyrecurrentunet_tpu.infer.quality \
    -c config/proc48k.json --pretrained /tmp/r5_artifacts/TRUNet-proc48 \
    --int8 /tmp/r5_artifacts/TRUNet-proc48/model_int8.trq \
    --out /tmp/r5_QUALITY48.json

# 4. TBPTT long-context variant (VERDICT #7): 8 s crops as four 2 s
#    segments with the TGRU carry crossing segment boundaries. Shortened
#    horizon (5600 clip batches = 22400 optimizer updates, matching the
#    config's schedule) so it fits the remaining round-5 wall clock.
if [ ! -f "$STAMPS/wipe5_TRUNet-tbptt" ]; then
    rm -rf ckpt/TRUNet-tbptt
    touch "$STAMPS/wipe5_TRUNet-tbptt"
fi
run_train traintbptt TRUNet-tbptt \
    python -m tinyrecurrentunet_tpu.train.loop -c config/tbptt16k.json \
    --procedural --procedural_items 2000 --max_iters 5600
run_cpu artifacttbptt 1800 env JAX_PLATFORMS=cpu \
    python -m tinyrecurrentunet_tpu.train.export_pretrained \
    -c config/tbptt16k.json --out /tmp/r5_artifacts/TRUNet-tbptt
run_step qualitytbptt 7200 python -m tinyrecurrentunet_tpu.infer.quality \
    -c config/tbptt16k.json --pretrained /tmp/r5_artifacts/TRUNet-tbptt \
    --out /tmp/r5_QUALITYTBPTT.json

# 5. large16k retrain (b16/bf16 + both quality levers) — last of the
#    retrains: most likely casualty if the wall clock runs out.
run_train trainlarge TRUNet-large \
    python -m tinyrecurrentunet_tpu.train.loop -c config/large16k.json --procedural
run_cpu artifactlarge 1800 env JAX_PLATFORMS=cpu \
    python -m tinyrecurrentunet_tpu.train.export_pretrained \
    -c config/large16k.json --out /tmp/r5_artifacts/TRUNet-large
run_cpu quantlarge 1800 env JAX_PLATFORMS=cpu \
    python -m tinyrecurrentunet_tpu.export.quantize \
    -c config/large16k.json --pretrained /tmp/r5_artifacts/TRUNet-large
run_step qualitylarge 7200 python -m tinyrecurrentunet_tpu.infer.quality \
    -c config/large16k.json --pretrained /tmp/r5_artifacts/TRUNet-large \
    --int8 /tmp/r5_artifacts/TRUNet-large/model_int8.trq \
    --out /tmp/r5_QUALITYLARGE.json

# 6. Full pytest suite in the TPU-idle window (single-core host:
# never overlap a TPU trainer's dispatch loop, CLAUDE.md).
run_cpu suite5 3600 python -m pytest tests/ -q -x

say "=== round-5 pipeline complete ==="
