#!/bin/bash
# Round-5 TPU evidence sequence, run after the flagship 30k completes
# (VERDICT r4 #1-#3, #7).  Ordered by evidence-per-minute; the TPU quality
# A/B (VERDICT #5, hours) stays a separate manual step so perf work can
# happen in between.
#
# Usage: bash scripts/tpu_checklist_r05.sh <final_ckpt.npz>
set -u
CKPT=${1:?usage: tpu_checklist_r05.sh <ckpt.npz>}
cd "$(dirname "$0")/.."
log() { echo "$(date -u +%H:%M:%S) $*" | tee -a /tmp/checklist_r05.log; }

log "checklist start ckpt=$CKPT"
timeout 2400 python scripts/measure_occupancy.py "$CKPT" \
  data/synth_composite > /tmp/occupancy_r05.log 2>&1
log "occupancy rc=$? (BENCH_PARAMS.json refreshed)"
timeout 3600 python bench.py > /tmp/bench_r05.json 2> /tmp/bench_r05.err
log "bench rc=$? -> /tmp/bench_r05.json"
timeout 2400 python scripts/ablate_step.py --phase A \
  > /tmp/ablate_A_r05.log 2>&1
log "ablate_A rc=$?"
timeout 2400 python scripts/ablate_step.py --phase C \
  > /tmp/ablate_C_r05.log 2>&1
log "ablate_C rc=$?"
# CP 0.949x -> >=1.2x lever: bf16 one-hot line matrices (r3 measured
# ~6ms/step on VM; CP is all-lines so the effect should be larger).
# fp32/bf16 pair on the same process-fresh program set.
timeout 2400 python scripts/ablate_step.py --phase C --model TensorCP \
  > /tmp/ablate_CP_fp32_r05.log 2>&1
log "ablate_CP_fp32 rc=$?"
timeout 2400 python scripts/ablate_step.py --phase C --model TensorCP \
  --line_dtype bfloat16 > /tmp/ablate_CP_bf16_r05.log 2>&1
log "ablate_CP_bf16 rc=$?"
# Same lever on VM: r3 measured ~6ms/step from bf16 one-hot lines but it
# was tied to the losing plane-table bf16; line_dtype separates them.
timeout 2400 python scripts/ablate_step.py --phase C \
  --line_dtype bfloat16 > /tmp/ablate_C_bf16line_r05.log 2>&1
log "ablate_C_bf16line rc=$?"
timeout 2400 python scripts/ablate_step.py --phase A \
  --line_dtype bfloat16 > /tmp/ablate_A_bf16line_r05.log 2>&1
log "ablate_A_bf16line rc=$?"
timeout 3600 python scripts/bench_render.py > /tmp/render_r05.log 2>&1
log "render rc=$?"
timeout 2400 python scripts/ablate_render.py \
  > /tmp/ablate_render_r05.log 2>&1
log "ablate_render rc=$?"
log "checklist done"
