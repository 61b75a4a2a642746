#!/bin/bash
# Round-5 follow-on chain: once the evidence checklist finishes, re-measure
# bench + phase ablations at the tap-lerp HEAD (commit cf365e7 changed the
# hot program AFTER the checklist's ablations ran), commit every artifact
# defensively (r4 lesson: a VM reset destroyed all uncommitted evidence),
# then fire the TPU matched-seed quality A/B.
set -u
cd "$(dirname "$0")/.."
log() { echo "$(date -u +%H:%M:%S) $*" | tee -a /tmp/post_checklist_r05.log; }

while ! grep -q "checklist done" /tmp/checklist_r05.log 2>/dev/null; do
  sleep 60
done
log "checklist done -> collect render artifacts"
python - <<'EOF'
import json, os
# fold the r05 ablation JSON lines measured since the last collect into
# ABLATE_STEP_r05.json (bf16line arms; taplerp arms get added next pass)
path = "ABLATE_STEP_r05.json"
d = json.load(open(path)) if os.path.exists(path) else {"arms": []}
seen = {(a.get("tag"), a.get("fwd_bwd_ms")) for a in d["arms"]}
for f, tag in [("/tmp/ablate_C_bf16line_r05.log", "C_vm_bf16line"),
               ("/tmp/ablate_A_bf16line_r05.log", "A_vm_bf16line"),
               ("/tmp/ablate_A_taplerp.log", "A_vm_taplerp"),
               ("/tmp/ablate_C_taplerp.log", "C_vm_taplerp"),
               ("/tmp/ablate_CP_taplerp.log", "C_cp_taplerp")]:
    try:
        for ln in open(f):
            if ln.strip().startswith("{"):
                a = json.loads(ln); a["tag"] = tag
                if (tag, a.get("fwd_bwd_ms")) not in seen:
                    d["arms"].append(a)
    except OSError:
        pass
json.dump(d, open(path, "w"), indent=1)
EOF
git add -A ABLATE_STEP_r05.json RENDER_r05.json BENCH_PARAMS.json \
  ABLATE_RENDER_r05.json 2>/dev/null
git commit -q -m "RENDER_r05 + bf16-line ablation arms (checklist artifacts)" \
  2>/dev/null && log "committed checklist artifacts"

log "re-measure at tap-lerp HEAD"
timeout 3600 python bench.py > /tmp/bench_r05b.json 2> /tmp/bench_r05b.err
log "bench rc=$? -> /tmp/bench_r05b.json"
timeout 2400 python scripts/ablate_step.py --phase A \
  > /tmp/ablate_A_taplerp.log 2>&1
log "ablate_A rc=$?"
timeout 2400 python scripts/ablate_step.py --phase C \
  > /tmp/ablate_C_taplerp.log 2>&1
log "ablate_C rc=$?"
timeout 2400 python scripts/ablate_step.py --phase C --model TensorCP \
  > /tmp/ablate_CP_taplerp.log 2>&1
log "ablate_CP rc=$?"
python - <<'EOF'
import json, os
if os.path.getsize("/tmp/bench_r05b.json") > 0:
    new = json.load(open("/tmp/bench_r05b.json"))
    json.dump(new, open("BENCH_SELF_r05.json", "w"))
d = json.load(open("ABLATE_STEP_r05.json"))
seen = {(a.get("tag"), a.get("fwd_bwd_ms")) for a in d["arms"]}
for f, tag in [("/tmp/ablate_A_taplerp.log", "A_vm_taplerp"),
               ("/tmp/ablate_C_taplerp.log", "C_vm_taplerp"),
               ("/tmp/ablate_CP_taplerp.log", "C_cp_taplerp")]:
    try:
        for ln in open(f):
            if ln.strip().startswith("{"):
                a = json.loads(ln); a["tag"] = tag
                if (tag, a.get("fwd_bwd_ms")) not in seen:
                    d["arms"].append(a)
    except OSError:
        pass
json.dump(d, open("ABLATE_STEP_r05.json", "w"), indent=1)
EOF
git add BENCH_SELF_r05.json ABLATE_STEP_r05.json BENCH_DETAIL.json
git commit -q -m "Re-measured bench + ablations at the tap-lerp HEAD" \
  && log "committed tap-lerp re-measure"

log "fire TPU quality A/B"
bash scripts/tpu_ab_r05.sh 20211202
git add AB_TPU_r05.json 2>/dev/null
git commit -q -m "AB_TPU_r05: matched-seed 15k stratified-vs-uniform on TPU" \
  && log "committed AB_TPU_r05"
log "chain done"
