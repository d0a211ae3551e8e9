#!/bin/bash
# Round-4 chip queue — run unattended as soon as the TPU backend returns.
# Priority: green bench artifact -> fault isolation -> cheap quality
# artifacts (1D DPM, tokamak multiseed) -> MFU study -> the long 2D run.
# Everything logs under /tmp/r4_*.log; JSON results land in experiments/.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
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

log "=== 5. UNet3D MFU study (per-op sweep + 2 full-step configs) ==="
MFU_OPS=1 MFU_CONFIGS=full_b7,save_heavy_b7 timeout 14400 \
    python -u experiments/profile_unet3d_mfu_r4.py 2>&1 | tee /tmp/r4_mfu.log
log "mfu rc=$?"

# pick the faster measured remat policy for the long 2D run
POLICY=$(python - <<'EOF'
import json
best, bt = "full", None
try:
    for line in open("/root/repo/experiments/unet3d_mfu_round4.jsonl"):
        r = json.loads(line)
        if r.get("batch") == 7 and "s_per_step" in r:
            if bt is None or r["s_per_step"] < bt:
                bt, best = r["s_per_step"], r["policy"]
except FileNotFoundError:
    pass
print(best)
EOF
)
log "selected remat policy: $POLICY"

log "=== 6. 2D at-scale run (pretrain extension + 8-epoch posttrain + backward) ==="
# deadline: env SMOKE_DEADLINE_TS if provided by the launcher, else none
SMOKE_REMAT_POLICY="$POLICY" timeout 86400 \
    python -u experiments/run_2d_refscale_r4.py 2>&1 | tee /tmp/r4_2d.log
log "2d rc=$?"

log "queue complete"
