#!/bin/bash
# Poll the axon TPU pool with a trivial probe; when it answers, run the
# round-3 measurement chain (scripts/round3_measure.sh) once. Single TPU
# process at a time: the probe and the chain never overlap.
cd /root/repo
PROBE='import jax, jax.numpy as jnp; print("SUM", float(jnp.ones((8,8)).sum()))'
for i in $(seq 1 200); do
    echo "[poll $i] $(date +%H:%M:%S)" >> /tmp/tpu_poll.log
    if timeout 150 python -c "$PROBE" >> /tmp/tpu_poll.log 2>&1; then
        echo "[poll $i] POOL ALIVE — launching measurement chain" \
            >> /tmp/tpu_poll.log
        bash scripts/round3_measure.sh > /tmp/r3_chain_driver.log 2>&1
        echo "CHAIN_EXIT=$?" >> /tmp/tpu_poll.log
        exit 0
    fi
    sleep 150
done
echo "POOL NEVER RECOVERED" >> /tmp/tpu_poll.log
exit 1
