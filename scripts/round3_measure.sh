#!/bin/bash
# Round-3 measurement chain: run everything that needs the real chip in one
# recovered-pool window. Each stage logs to /tmp and tolerates failures.
# Stage order puts the headline bench FIRST (the window may not last).
cd /root/repo

echo "=== bench (headline: pooled marching + shrink-to-fit budgets) ===" \
    | tee /tmp/r3_bench.log
timeout 4500 python -u bench.py >> /tmp/r3_bench.log 2>&1
echo "BENCH_EXIT=$?" >> /tmp/r3_bench.log

echo "=== step profile (flat64 vs pool32 vs pool16 per budget) ===" \
    | tee /tmp/r3_step.log
timeout 3000 python -u scripts/tpu_step_profile.py --skip_baked \
    >> /tmp/r3_step.log 2>&1
echo "EXIT=$?" >> /tmp/r3_step.log

echo "=== baked anatomy (block4 + quant, n_steps 192) ===" \
    | tee /tmp/r3_anatomy.log
timeout 2400 python -u scripts/tpu_baked_anatomy.py 256 192 16 8 block \
    >> /tmp/r3_anatomy.log 2>&1
echo "ANATOMY_EXIT=$?" >> /tmp/r3_anatomy.log

echo "=== baked anatomy A/B: n_steps 128 ===" | tee /tmp/r3_anatomy_128.log
timeout 1800 python -u scripts/tpu_baked_anatomy.py 256 128 16 8 block \
    >> /tmp/r3_anatomy_128.log 2>&1
echo "EXIT=$?" >> /tmp/r3_anatomy_128.log

echo "=== baked anatomy A/B: no quant ===" | tee /tmp/r3_anatomy_noq.log
timeout 1800 python -u scripts/tpu_baked_anatomy.py 256 192 16 8 block noq \
    >> /tmp/r3_anatomy_noq.log 2>&1
echo "EXIT=$?" >> /tmp/r3_anatomy_noq.log

echo "=== baked fps probe ===" | tee /tmp/r3_fps.log
timeout 2400 python -u scripts/tpu_baked_fps.py >> /tmp/r3_fps.log 2>&1
echo "EXIT=$?" >> /tmp/r3_fps.log

echo "chain done"
