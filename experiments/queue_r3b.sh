#!/bin/bash
# Round-3 queue, part 2: after the tokamak refscale job releases the chip,
# run the 2D refscale demonstration (VERDICT r2 item 1) with crash retries.
#
# The 14:11 attempt died on a transient "TPU worker process crashed or
# restarted" during posttrain epoch 0; all phase programs were prewarmed
# and fit HBM (prewarm_2d_r3c.log), so the right response is retry +
# resume: pretrain resumes from /tmp/smoke_ref_ckpt, the posttrain /
# backward phases resume epoch-granular state from /tmp/smoke_pt_state /
# /tmp/smoke_bw_state (run_inference state_dir), and completed-epoch
# metrics persist in the results JSON.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "[queue2] prior job done at $(date)" >> /tmp/queue_r3.log
fi

# wall-clock budget: the remaining window fits ~1 posttrain epoch + ~2
# backward epochs; cap epochs directly instead of leaning on the deadline
DEADLINE=$(date -u -d "2026-08-17 18:52" +%s)
export SMOKE_PRETRAIN_STEPS=3000 SMOKE_BASELINE_EVAL=1
export SMOKE_PT_EPOCHS=1 SMOKE_PT_STEPS=300 SMOKE_BW_EPOCHS=2
export SMOKE_DEADLINE_TS=$DEADLINE SMOKE_BW_RESERVE_S=0

for attempt in 3 4; do
  if [ "$(date -u +%s)" -ge "$DEADLINE" ]; then
    echo "[queue2] deadline passed, not starting attempt $attempt" >> /tmp/queue_r3.log
    break
  fi
  python experiments/run_2d_refscale_r3.py > /tmp/smoke_r3_attempt${attempt}.log 2>&1 &
  echo $! > /tmp/smoke_refscale.pid
  wait $!
  rc=$?
  echo "[queue2] 2d attempt $attempt exit=$rc at $(date)" >> /tmp/queue_r3.log
  [ "$rc" -eq 0 ] && break
  sleep 90  # let a crashed TPU worker restart before resuming
done
echo "[queue2] done at $(date)" >> /tmp/queue_r3.log
