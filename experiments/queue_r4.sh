#!/bin/bash
# Round-4 chip queue — run unattended as soon as the TPU backend returns.
# Priority: green bench artifact -> fault isolation -> cheap quality
# artifacts (1D DPM, tokamak multiseed) -> MFU study -> the long 2D run.
# Everything logs under /tmp/r4_*.log; JSON results land in experiments/.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
# pipefail so the rc=$? logged after each `cmd | tee` pipeline is the
# command's status, not tee's (advisor round-4 finding)
set -o pipefail
set -x

log() { echo "[queue $(date +%H:%M:%S)] $*" | tee -a /tmp/r4_queue.log; }

log "=== 1. bench.py (headline perf artifact) ==="
timeout 3600 python -u bench.py 2>&1 | tee /tmp/r4_bench.log
log "bench rc=$?"

log "=== 2. kernel-fault isolation (bounded) ==="
ISO_REPEATS=2 timeout 10800 python -u experiments/isolate_kernel_fault_r4.py \
    2>&1 | tee /tmp/r4_isolate.log
log "isolate rc=$?"

log "=== 3. 1D DPM-Solver++ refscale validation ==="
timeout 7200 python -u experiments/run_1d_dpm_refscale_r4.py \
    2>&1 | tee /tmp/r4_dpm.log
log "dpm rc=$?"

log "=== 4. tokamak multi-seed error bars ==="
timeout 10800 python -u experiments/run_tokamak_multiseed_r4.py \
    2>&1 | tee /tmp/r4_tok.log
log "tok rc=$?"

log "=== 5. UNet3D MFU study (per-op sweep + 3 full-step configs) ==="
MFU_OPS=1 MFU_CONFIGS=full_b7,save_heavy_b7,packed_attn_save_heavy_b7 \
    timeout 14400 \
    python -u experiments/profile_unet3d_mfu_r4.py 2>&1 | tee /tmp/r4_mfu.log
log "mfu rc=$?"

# pick the fastest measured (remat policy, attn impl, conv impl) for the
# long 2D run
WINNER=$(python - <<'EOF'
import json
best, bt = ("full", "heads", "xla"), None
try:
    for line in open("/root/repo/experiments/unet3d_mfu_round4.jsonl"):
        r = json.loads(line)
        if r.get("batch") == 7 and "s_per_step" in r:
            if bt is None or r["s_per_step"] < bt:
                bt = r["s_per_step"]
                best = (r["policy"], r.get("attn_impl", "heads"),
                        r.get("conv_impl", "xla"))
except FileNotFoundError:
    pass
print(" ".join(best))
EOF
)
POLICY=$(echo $WINNER | cut -d' ' -f1)
ATTN=$(echo $WINNER | cut -d' ' -f2)
CONV=$(echo $WINNER | cut -d' ' -f3)
log "selected remat policy: $POLICY attn: $ATTN conv: $CONV"

log "=== 6. 2D at-scale run (pretrain extension + 8-epoch posttrain + backward) ==="
# Adapt the pretrain extension to the time actually left: reserve ~3.5 h
# for posttrain+backward (deadline-capped themselves), budget the rest to
# pretrain at the measured s/step of the selected config (fallback 2.5).
PLAN=$(POLICY="$POLICY" python - <<'EOF'
import json, os, time
deadline = float(os.environ.get("SMOKE_DEADLINE_TS", 0) or 0)
spp = 2.5
try:
    for line in open("/root/repo/experiments/unet3d_mfu_round4.jsonl"):
        r = json.loads(line)
        if r.get("batch") == 7 and r.get("policy") == os.environ.get("POLICY") \
                and "s_per_step" in r:
            spp = r["s_per_step"]
except FileNotFoundError:
    pass
if deadline:
    budget_s = max(deadline - time.time() - 3.5 * 3600, 0)
    steps = 3000 + int(budget_s / spp)
    steps = max(3000, min(steps, 30000))
else:
    steps = 30000
# posttrain epochs scale down with a thin budget too
pt_steps = 4000 if steps > 15000 else (2000 if steps > 8000 else 1000)
print(f"{steps} {pt_steps}")
EOF
)
PRETRAIN_STEPS=$(echo $PLAN | cut -d' ' -f1)
PT_STEPS=$(echo $PLAN | cut -d' ' -f2)
log "2D plan: pretrain to $PRETRAIN_STEPS steps, posttrain 8x$PT_STEPS (policy $POLICY)"
SMOKE_REMAT_POLICY="$POLICY" SMOKE_ATTN_IMPL="$ATTN" SMOKE_CONV_IMPL="$CONV" \
    SMOKE_PRETRAIN_STEPS="$PRETRAIN_STEPS" \
    SMOKE_PT_STEPS="$PT_STEPS" timeout 86400 \
    python -u experiments/run_2d_refscale_r4.py 2>&1 | tee /tmp/r4_2d.log
log "2d rc=$?"

log "queue complete"
