#!/bin/bash
# Round-3 measurement chain: run everything that needs the real chip in one
# recovered-pool window. Each stage logs to /tmp and tolerates failures.
# Stage order puts the headline bench FIRST (the window may not last).
cd /root/repo

echo "=== bench (headline) ===" | tee /tmp/r3_bench.log
timeout 3600 python -u bench.py >> /tmp/r3_bench.log 2>&1
echo "BENCH_EXIT=$?" >> /tmp/r3_bench.log

echo "=== baked anatomy (block4 + quant) ===" | tee /tmp/r3_anatomy.log
timeout 2400 python -u scripts/tpu_baked_anatomy.py 256 192 16 8 block \
    >> /tmp/r3_anatomy.log 2>&1
echo "ANATOMY_EXIT=$?" >> /tmp/r3_anatomy.log

echo "=== baked anatomy A/B: no quant ===" | tee /tmp/r3_anatomy_noq.log
timeout 1800 python -u scripts/tpu_baked_anatomy.py 256 192 16 8 block noq \
    >> /tmp/r3_anatomy_noq.log 2>&1
echo "EXIT=$?" >> /tmp/r3_anatomy_noq.log

echo "=== baked anatomy A/B: Wc=4 ===" | tee /tmp/r3_anatomy_w4.log
timeout 1800 python -u scripts/tpu_baked_anatomy.py 256 192 16 4 block \
    >> /tmp/r3_anatomy_w4.log 2>&1
echo "EXIT=$?" >> /tmp/r3_anatomy_w4.log

echo "=== baked fps probe ===" | tee /tmp/r3_fps.log
timeout 2400 python -u scripts/tpu_baked_fps.py >> /tmp/r3_fps.log 2>&1
echo "EXIT=$?" >> /tmp/r3_fps.log

echo "=== step profile ===" | tee /tmp/r3_step.log
timeout 2400 python -u scripts/tpu_step_profile.py --skip_baked \
    >> /tmp/r3_step.log 2>&1
echo "EXIT=$?" >> /tmp/r3_step.log

echo "chain done"
