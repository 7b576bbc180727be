#!/bin/bash
# Round-5 (VERDICT r4 #5): run the reference benchmark schedule
# WALL-TO-WALL on the real-scale fixture and record the honest end-to-end
# numbers: 20 epochs x 16384 rays (reference
# benchmarking/benchmark_synthetic_nerf.sh:22-25) with ckpt/val/slim all
# firing, then write bench_runs/r5_full_schedule.json with total wall
# minutes + final PSNR. bench.py attaches the record to its extras as
# full_schedule_wall_min / full_schedule_psnr.
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
ROOT_DIR="$ROOT/Synthetic_NeRF" SCENES="Lego" EPOCHS="$EPOCHS" \
    bash "$REPO/benchmarking/benchmark_synthetic_nerf.sh" \
    2>&1 | tee "$ROOT/run/schedule.log"
T1=$(date +%s)

python - "$T0" "$T1" "$EPOCHS" "$REPO" "$ROOT" << 'EOF'
import json, re, sys
t0, t1, epochs, repo, root = (int(sys.argv[1]), int(sys.argv[2]),
                              int(sys.argv[3]), sys.argv[4], sys.argv[5])
wall_min = (t1 - t0) / 60.0
psnr = None
log = open(f"{root}/run/schedule.log").read()
# train.py prints 'test/psnr=<x>' for the held-out eval at the end
m = re.findall(r"test/psnr[=\s]+([0-9.]+)", log)
if m:
    psnr = float(m[-1])
rec = {"full_schedule_wall_min": round(wall_min, 2),
       "full_schedule_psnr": psnr, "epochs": epochs,
       "scene": "Lego-fixture-800x800x100",
       "reference_wall_min": 5.0,
       "wall_ratio_vs_reference": round(wall_min / 5.0, 1)}
out = f"{repo}/bench_runs/r5_full_schedule.json"
json.dump(rec, open(out, "w"), indent=1)
print("wrote", out, rec)
EOF
