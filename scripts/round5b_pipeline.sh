#!/bin/bash
# Round-5b unattended TPU pipeline — the isolating follow-up to the
# rejected round-5 lever bundle (docs/QUALITY_r5_levers_rejected.json):
#
#   1. Flagship retrain A: ROUND-4 loss recipe (per_item_norm=false,
#      eval-style babble) at the measured-best b64/bf16 config with a 2x
#      sample budget (45k steps x 64 = 2.88M samples, 8000 unique items).
#      Isolates VERDICT #3's b64/bf16 promotion from the falsified
#      round-5 levers and tests raw budget as the reverb lever.
#      -> /tmp/r5b_artifacts/TRUNet-proc + /tmp/r5b_QUALITY.json
#   2. Dereverb capability diagnostic: same 381k architecture trained
#      from scratch on reverb-ONLY items (config/diag_reverb16k.json).
#      Settles WHY the flagship reverb row is ~0: if this model's reverb
#      row is also ~0 the per-frame-mask architecture at 381k cannot
#      dereverberate (capacity/architecture limit); if it is clearly
#      positive the limit is multi-task gradient competition.
#      -> /tmp/r5b_QUALITY_REVERBDIAG.json (121 files => n~22/reverb kind)
#   3. Full pytest suite (no -x) in the TPU-idle window.
#
# Promotion is decided interactively afterwards via
# scripts/compare_quality.py (gates: no kind regresses >0.25 dB, overall
# >= committed +3.81 dB; reverb >= +0.5 dB is the stretch goal).
set -u
cd /root/repo
STAMPS=/tmp/r5b_stamps
mkdir -p "$STAMPS" /tmp/r5b_artifacts
LOG=/tmp/round5b_pipe.log
exec >>"$LOG" 2>&1

say() { echo "[$(date +%H:%M:%S)] $*"; }

tpu_up() {
    # First-D2H relay handshake measured up to ~262 s; 580 s timeout.
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
        "$@" >"/tmp/r5b_${stamp}.log" 2>&1 &
        local pid=$!
        local started=$(date +%s)
        local grace=1500
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
        if timeout "$tmo" "$@" >"/tmp/r5b_${stamp}.log" 2>&1; then
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
    if timeout "$tmo" "$@" >"/tmp/r5b_${stamp}.log" 2>&1; then
        touch "$STAMPS/$stamp"
        say "done $stamp"
        return 0
    fi
    say "FAILED $stamp rc=$?"
    return 1
}

say "=== round-5b pipeline start ==="

for exp in TRUNet-proc TRUNet-reverbdiag; do
    if [ ! -f "$STAMPS/wipe5b_$exp" ]; then
        rm -rf "ckpt/$exp"
        touch "$STAMPS/wipe5b_$exp"
        say "wiped ckpt/$exp"
    fi
done

# 1. Retrain A: round-4 recipe, b64/bf16, 2x budget.
run_train train16b TRUNet-proc \
    python -m tinyrecurrentunet_tpu.train.loop -c config/proc16k.json \
    --procedural --procedural_items 8000 --babble_style eval
run_cpu artifact16b 1800 env JAX_PLATFORMS=cpu \
    python -m tinyrecurrentunet_tpu.train.export_pretrained \
    -c config/proc16k.json --out /tmp/r5b_artifacts/TRUNet-proc
run_cpu quant16b 1800 env JAX_PLATFORMS=cpu \
    python -m tinyrecurrentunet_tpu.export.quantize \
    -c config/proc16k.json --pretrained /tmp/r5b_artifacts/TRUNet-proc
run_step quality16b 7200 python -m tinyrecurrentunet_tpu.infer.quality \
    -c config/proc16k.json --pretrained /tmp/r5b_artifacts/TRUNet-proc \
    --int8 /tmp/r5b_artifacts/TRUNet-proc/model_int8.trq \
    --out /tmp/r5b_QUALITY.json

# 2. Dereverb capability diagnostic (reverb-only training).
run_train traindiag TRUNet-reverbdiag \
    python -m tinyrecurrentunet_tpu.train.loop -c config/diag_reverb16k.json \
    --procedural --procedural_items 4000 --kinds reverb --babble_style eval
run_cpu artifactdiag 1800 env JAX_PLATFORMS=cpu \
    python -m tinyrecurrentunet_tpu.train.export_pretrained \
    -c config/diag_reverb16k.json --out /tmp/r5b_artifacts/TRUNet-reverbdiag
run_step qualitydiag 7200 python -m tinyrecurrentunet_tpu.infer.quality \
    -c config/diag_reverb16k.json \
    --pretrained /tmp/r5b_artifacts/TRUNet-reverbdiag \
    --num_files 121 --out /tmp/r5b_QUALITY_REVERBDIAG.json

# 3. Full suite in the TPU-idle window (no -x: want the full failure list).
run_cpu suite5b 3600 python -m pytest tests/ -q

say "=== round-5b pipeline complete ==="
