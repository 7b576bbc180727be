#!/bin/bash
# Poll the axon TPU pool with a trivial probe; when it answers, run the
# round-5 full reference schedule (VERDICT r4 #5) once. Single TPU
# process at a time: the probe and the schedule never overlap.
cd /root/repo
PROBE='import jax, jax.numpy as jnp; print("SUM", float(jnp.ones((8,8)).sum()))'
for i in $(seq 1 200); do
    echo "[poll $i] $(date +%H:%M:%S)" >> /tmp/tpu_poll5.log
    if timeout 150 python -c "$PROBE" >> /tmp/tpu_poll5.log 2>&1; then
        echo "[poll $i] POOL ALIVE — launching full schedule" \
            >> /tmp/tpu_poll5.log
        timeout 10800 bash scripts/r5_full_schedule.sh /tmp/realscale 20 \
            > bench_runs/r5_full_schedule_driver.log 2>&1
        echo "SCHEDULE_EXIT=$?" >> /tmp/tpu_poll5.log
        exit 0
    fi
    sleep 120
done
echo "POOL NEVER RECOVERED" >> /tmp/tpu_poll5.log
exit 1
