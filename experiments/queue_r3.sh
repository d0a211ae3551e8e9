#!/bin/bash
# Round-3 chip-job queue: wait for the 2D refscale job (pid file re-read each
# loop so restarts with a new pid keep the queue waiting), then run the
# remaining chip jobs sequentially (one chip).
#
# Ordering: the quick required artifacts first (sampler breakdown + bench +
# pipeline bench, ~20 min total with a warm compile cache — VERDICT r2
# item 6), then the long reference-scale runs, which checkpoint (tokamak
# every 25k steps, 1D every 50k) and resume next round if the session ends
# mid-run. The cheap artifacts must not be squeezed out by a long pretrain
# overrunning the round boundary.
set -u
cd /root/repo
# keep /root/.axon_site (registers the axon TPU backend) on the path
export PYTHONPATH=/root/repo:${PYTHONPATH:-}

while true; do
  pid=$(cat /tmp/smoke_refscale.pid 2>/dev/null || echo "")
  if [ -z "$pid" ] || ! kill -0 "$pid" 2>/dev/null; then
    # require two consecutive misses 60s apart (restart window)
    sleep 60
    pid2=$(cat /tmp/smoke_refscale.pid 2>/dev/null || echo "")
    if [ -z "$pid2" ] || ! kill -0 "$pid2" 2>/dev/null; then
      break
    fi
  fi
  sleep 60
done

echo "[queue] 2d job finished at $(date)" >> /tmp/queue_r3.log

python experiments/profile_sampler_breakdown.py > /tmp/breakdown_r3.log 2>&1
echo "[queue] breakdown exit=$? at $(date)" >> /tmp/queue_r3.log
python bench.py > /tmp/bench_r3.log 2>&1
echo "[queue] bench exit=$? at $(date)" >> /tmp/queue_r3.log
python experiments/bench_pipeline.py > /tmp/bench_pipe_r3.log 2>&1
echo "[queue] bench_pipeline exit=$? at $(date)" >> /tmp/queue_r3.log

# tokamak refscale at 200k pretrain steps (VERDICT r2 item 3); resumes from
# the round-2 ckpt-20000, ~40 min of pretrain + ~50 min of phases
python experiments/run_tokamak_refscale.py > /tmp/tok_refscale_r3.log 2>&1
echo "[queue] tokamak refscale exit=$? at $(date)" >> /tmp/queue_r3.log

# 100k (2x round-2's 50k): the round's chip budget went to the 2D
# headline (VERDICT r2 item 1); 150k more 1D steps at ~16 steps/s would
# not fit behind it. LR cosine T_max=1e4 means steps past ~10k cycle the
# same schedule; quality at 50k was already paper-scale (J 0.0134).
B_PRETRAIN_STEPS=100000 python experiments/run_1d_refscale.py > /tmp/b_refscale_r3.log 2>&1
echo "[queue] 1d refscale exit=$? at $(date)" >> /tmp/queue_r3.log
