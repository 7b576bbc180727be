#!/bin/bash
# Round-5 single-window measurement chain: run the moment the axon pool
# answers. Ordered by value-per-minute so a short window still yields the
# headline numbers:
#   1. hoisted-march A/B (+ VPU-coarse A/B)   (~10 min)
#   2. full bench.py -> bench_runs/r5_bench.log (~12 min)
#   3. full reference schedule wall-to-wall    (~80+ min, VERDICT r4 #5)
# Usage: bash scripts/r5_measure_chain.sh [skip_ab]
cd /root/repo
set -x
if [ "${1:-}" != "skip_ab" ]; then
    timeout 1500 python scripts/tpu_hoist_ab.py 6 \
        > bench_runs/r5_hoist_ab.log 2>&1
    ARNERF_VPU_COARSE=0 timeout 900 python scripts/tpu_hoist_ab.py 6 \
        > bench_runs/r5_hoist_ab_novpu.log 2>&1
fi
timeout 2400 python bench.py > bench_runs/r5_bench.log 2>&1
timeout 14400 bash scripts/r5_full_schedule.sh /tmp/realscale 20 \
    > bench_runs/r5_full_schedule_driver.log 2>&1
echo "CHAIN DONE rc=$?"
