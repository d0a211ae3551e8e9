#!/bin/bash
# Round-5 chip chain, part 2 — runs after the UNet3D MFU study frees the
# chip. Order: tokamak artifact restore (datagen + 200k pretrain) ->
# multiseed error bars (VERDICT r4 #5) -> tokamak fast-sampler arm
# (VERDICT r4 #4) -> bounded kernel-fault isolation replay (VERDICT r4 #1,
# P1-P3: the round-3 crash programs on the XLA backend; the Pallas CG
# variants have their own on-chip certification in
# pallas_cg_certification_r5.jsonl and the remote compile service 500s on
# fresh Pallas programs this round, so P4/P5 are skipped here).
# Every step persists incrementally; a round-boundary truncation keeps
# whatever has landed.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
set -o pipefail
set -x

log() { echo "[queue-b $(date +%H:%M:%S)] $*" | tee -a /tmp/r5b_queue.log; }

log "=== 1. tokamak artifact restore (dataset + 200k pretrain) ==="
timeout 9000 python -u experiments/restore_tokamak_artifacts_r5.py \
    2>&1 | tee /tmp/r5_tokrestore.log
log "tokrestore rc=$?"

log "=== 2. tokamak multiseed error bars (5 eval seeds x 3 phases) ==="
TOK_EVAL_SEEDS=5 timeout 7200 python -u experiments/run_tokamak_multiseed_r4.py \
    2>&1 | tee /tmp/r5_tok.log
log "tok multiseed rc=$?"

log "=== 3. tokamak fast-sampler arm (5 samplers, cal-matched, 3 seeds) ==="
TOK_EVAL_SEEDS=3 timeout 5400 python -u experiments/run_tokamak_fastsampler_r5.py \
    2>&1 | tee /tmp/r5_tokfast.log
log "tok fastsampler rc=$?"

log "=== 4. kernel-fault isolation replay (P1-P3, XLA backend) ==="
ISO_REPEATS=2 ISO_PROGRAMS=P1,P2,P3 timeout 5400 \
    python -u experiments/isolate_kernel_fault_r4.py \
    2>&1 | tee /tmp/r5_isolate2.log
log "isolate rc=$?"

log "queue-b complete"
