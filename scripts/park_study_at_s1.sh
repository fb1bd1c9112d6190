#!/bin/bash
# Stop the running encoder-study driver (pgid $1) the moment seed-1's
# last run (true_state s1) reports its exit code, then relaunch the
# grid time-boxed to seed 2 on the 4 non-oracle encoders.  The kill
# lands <1 s after the next child spawns — it is still in CPython
# import, no JAX backend, no tunnel RPC in flight (the wedge-protocol
# constraint, memory/axon-tpu-tunnel-quirks.md).
PGID=$1
LOG=/root/study_r5_driver.log
while ! grep -q "bc true_state s1: rc=" $LOG; do sleep 0.5; done
kill -TERM -$PGID 2>/dev/null
sleep 2
kill -KILL -$PGID 2>/dev/null
echo "parked at s1 boundary $(date)" >> $LOG
cd /root/repo
setsid python scripts/encoder_study.py --workdir /root/study_r5 \
    --seeds 2 --encoders resnet50,resnet50_l3,random \
    --abort_on_fail 3 >> $LOG 2>&1 < /dev/null &
echo $! > /tmp/study.pid
echo "relaunched seeds-2 grid pid $(cat /tmp/study.pid)"
