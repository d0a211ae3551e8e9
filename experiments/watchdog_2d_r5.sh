#!/bin/bash
# Round-5 watchdog for the at-scale 2D run: the tunneled TPU backend has
# twice left a device call silently blocked on a socket read mid-pretrain
# (thread in sk_wait_data, 0% CPU, no exception ever raised — see
# experiments/TPU_RECOVERY_r5.md). In-process fault recovery only catches
# RAISED errors, so this external loop kills-and-relaunches the runner when
# its log goes stale; every phase of run_2d_refscale_r4.py is resumable
# (chunked checkpointed pretrain, keyed results, epoch phase state), so a
# relaunch costs at most one pretrain chunk / one finetune epoch.
#
# Usage: STALL_S=900 END_TS=<epoch> watchdog_2d_r5.sh  (env for the runner
# — SMOKE_* — must already be exported; PIDs only, no pattern kills.)
set -u
LOG=/tmp/r5_2d.log
STALL_S=${STALL_S:-900}
END_TS=${END_TS:?set END_TS (absolute epoch seconds: hard stop)}
cd /root/repo
attempt=0
while true; do
  now=$(date +%s)
  [ "$now" -ge "$END_TS" ] && { echo "[wd] end ts reached"; break; }
  attempt=$((attempt + 1))
  left=$((END_TS - now))
  echo "[wd $(date +%H:%M:%S)] launch attempt $attempt (budget ${left}s)"
  timeout -k 30 "$left" python -u experiments/run_2d_refscale_r4.py \
    >> "$LOG" 2>&1 &
  PY=$!
  echo "$PY" > /tmp/r5_2d.pid
  while kill -0 "$PY" 2>/dev/null; do
    sleep 60
    now=$(date +%s)
    mt=$(stat -c %Y "$LOG" 2>/dev/null || echo "$now")
    if [ $((now - mt)) -gt "$STALL_S" ]; then
      echo "[wd $(date +%H:%M:%S)] log stale $((now - mt))s — killing $PY"
      kill "$PY" 2>/dev/null
      sleep 10
      kill -9 "$PY" 2>/dev/null
      break
    fi
    if [ "$now" -ge "$END_TS" ]; then
      echo "[wd $(date +%H:%M:%S)] hard stop — killing $PY"
      kill "$PY" 2>/dev/null
      sleep 10
      kill -9 "$PY" 2>/dev/null
      wait "$PY" 2>/dev/null
      exit 0
    fi
  done
  wait "$PY" 2>/dev/null
  rc=$?
  echo "[wd $(date +%H:%M:%S)] runner exited rc=$rc"
  # clean completion (or deliberate SystemExit) ends the watchdog; any
  # other exit (stall kill = 143/137, crash) relaunches after a breather
  [ "$rc" -eq 0 ] && break
  sleep 20
done
echo "[wd $(date +%H:%M:%S)] done"
