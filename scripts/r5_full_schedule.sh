#!/bin/bash
# Round-5 (VERDICT r4 #5): run the reference benchmark schedule
# WALL-TO-WALL on the real-scale fixture and record the honest end-to-end
# numbers: 20 epochs x 16384 rays (reference
# benchmarking/benchmark_synthetic_nerf.sh:22-25) with ckpt/val/slim all
# firing, then write bench_runs/r5_full_schedule.json with total wall
# minutes + final PSNR. bench.py attaches the record to its extras as
# full_schedule_wall_min / full_schedule_psnr.
#
# The record is updated INCREMENTALLY (every 2 min, "complete": false)
# while the schedule runs, so a pool outage or round-end timeout still
# leaves an honest partial record of how far the wall-clock got.
#
# Usage: bash scripts/r5_full_schedule.sh [out_root] [epochs]
set -e
ROOT=${1:-/tmp/realscale}
EPOCHS=${2:-20}
REPO="$(cd "$(dirname "$0")/.." && pwd)"

if [ ! -f "$ROOT/Synthetic_NeRF/Lego/transforms_train.json" ]; then
    echo "== generating 800x800 x 100-view fixture (device-accelerated)"
    python "$REPO/scripts/make_blender_fixture.py" \
        "$ROOT/Synthetic_NeRF/Lego" --wh 800 --views 100 --test_views 8 \
        --samples 256
fi

mkdir -p "$ROOT/run"
cd "$ROOT/run"
ln -sf "$REPO/train.py" train.py
export PYTHONPATH="$REPO:${PYTHONPATH}"

T0=$(date +%s)

record() {  # record <complete:0|1>
    python - "$T0" "$(date +%s)" "$EPOCHS" "$REPO" "$ROOT" "$1" << 'EOF'
import json, os, re, sys
t0, t1, epochs, repo, root, done = (int(sys.argv[1]), int(sys.argv[2]),
                                    int(sys.argv[3]), sys.argv[4],
                                    sys.argv[5], sys.argv[6] == "1")
wall_min = (t1 - t0) / 60.0
log = ""
try:
    log = open(f"{root}/run/schedule.log").read()
except OSError:
    pass
# train.py prints 'test/psnr=<x>' for the held-out eval at the end
m = re.findall(r"test/psnr[=\s]+([0-9.]+)", log)
psnr = float(m[-1]) if m else None
steps = re.findall(r"step (\d+)", log)
rec = {"full_schedule_wall_min": round(wall_min, 2),
       "full_schedule_psnr": psnr, "epochs": epochs,
       "full_schedule_complete": done,
       "full_schedule_steps": int(steps[-1]) if steps else 0,
       "scene": "Lego-fixture-800x800x100",
       "reference_wall_min": 5.0,
       "wall_ratio_vs_reference": round(wall_min / 5.0, 1)}
out = f"{repo}/bench_runs/r5_full_schedule.json"
tmp = out + ".tmp"
json.dump(rec, open(tmp, "w"), indent=1)
os.replace(tmp, out)
print("wrote", out, rec)
EOF
}

# Supervisor loop (round 5): pool fault storms exhaust the trainer's
# in-process recovery cap and kill the process (the first r5 attempt died
# at recovery 8/8 with 6.5k steps unsaved). With ARNERF_AUTO_RESUME the
# trainer persists its fault-recovery snapshot to disk and a fresh
# process resumes from it, so the schedule survives any number of
# crashes; wall-clock keeps accumulating into the honest record.
export ARNERF_AUTO_RESUME=1
export ARNERF_MAX_RECOVERIES=${ARNERF_MAX_RECOVERIES:-64}
: > "$ROOT/run/schedule.log"
RC=1
for attempt in $(seq 1 24); do
    echo "== schedule attempt $attempt ==" >> "$ROOT/run/schedule.log"
    ROOT_DIR="$ROOT/Synthetic_NeRF" SCENES="Lego" EPOCHS="$EPOCHS" \
        bash "$REPO/benchmarking/benchmark_synthetic_nerf.sh" \
        >> "$ROOT/run/schedule.log" 2>&1 &
    RUN_PID=$!
    echo "$RUN_PID" > /tmp/r5_sched.pid
    while kill -0 "$RUN_PID" 2>/dev/null; do
        sleep 120
        record 0 || true
        tail -1 "$ROOT/run/schedule.log" || true
    done
    RC=0
    wait "$RUN_PID" || RC=$?
    if [ "$RC" = 0 ]; then break; fi
    echo "== attempt $attempt crashed (rc=$RC); resuming from snapshot ==" \
        >> "$ROOT/run/schedule.log"
    sleep 30
done
if [ "$RC" = 0 ]; then record 1; else record 0; fi
exit $RC
