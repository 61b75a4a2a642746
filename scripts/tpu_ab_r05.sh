#!/bin/bash
# TPU matched-seed quality A/B at scale (VERDICT r4 #5 / r3 #4): the two
# 15k arms of configs/synth_ab_{strat,unstrat}.txt run sequentially on the
# tunneled TPU with the same seed; the only delta is stratification (with
# the noise-match fix at its default-on setting in the strat arm).
# Run AFTER the r5 evidence checklist so perf measurements see a quiet
# chip.  Each arm is supervised (--auto_resume) against tunnel wedges.
#
# Usage: bash scripts/tpu_ab_r05.sh [seed]
set -u
SEED=${1:-20211202}
cd "$(dirname "$0")/.."
log() { echo "$(date -u +%H:%M:%S) $*" | tee -a /tmp/ab_tpu_r05.log; }

# phase-A top-K appearance split candidate (round-5 gap hunt: the app
# half of the pre-mask step is ~86 ms of full-lattice appearance traffic;
# the reference itself thresholds appearance by weight from iter 0)
for k in 64 32; do
  log "ablate_A topk=$k start"
  timeout 2400 python scripts/ablate_step.py --phase A --topk $k \
    > /tmp/ablate_A_topk${k}.log 2>&1
  log "ablate_A topk=$k rc=$?"
done
python - <<'EOF'
import json, os
path = "ABLATE_STEP_r05.json"
d = json.load(open(path)) if os.path.exists(path) else {"arms": []}
seen = {(a.get("tag"), a.get("fwd_bwd_ms")) for a in d["arms"]}
for k in (64, 32):
    try:
        for ln in open(f"/tmp/ablate_A_topk{k}.log"):
            if ln.strip().startswith("{"):
                a = json.loads(ln); a["tag"] = f"A_vm_topk{k}"
                if (a["tag"], a.get("fwd_bwd_ms")) not in seen:
                    d["arms"].append(a)
    except OSError:
        pass
json.dump(d, open(path, "w"), indent=1)
EOF
git add ABLATE_STEP_r05.json 2>/dev/null
git commit -q -m "Phase-A top-K split ablation arms (TPU)" 2>/dev/null

# serving attribution first (minutes, not hours): one traced frame names
# where the 9.4 s/frame goes (count pass vs per-bucket render) — the r5
# RENDER measurement landed at 0.107 fps with no per-bucket breakdown.
log "serving breakdown start"
TENSORF_RENDER_TRACE=1 timeout 2400 python scripts/bench_render.py \
  --frames 1 > /tmp/serving_breakdown_r05.log 2>&1
log "serving breakdown rc=$? -> /tmp/serving_breakdown_r05.log"
grep render-trace /tmp/serving_breakdown_r05.log \
  > SERVING_TRACE_r05.txt 2>/dev/null
git add SERVING_TRACE_r05.txt RENDER_r05.json 2>/dev/null
git commit -q -m "Serving per-bucket trace (TPU)" 2>/dev/null

for arm in strat unstrat; do
  log "arm=$arm seed=$SEED start"
  timeout 21600 python train.py --config "configs/synth_ab_${arm}.txt" \
    --seed "$SEED" --expname "ab_tpu_${arm}_s${SEED}" \
    --auto_resume 3 > "/tmp/ab_tpu_${arm}_s${SEED}.log" 2>&1
  log "arm=$arm rc=$?"
done

python - <<EOF
import json, re
out = {"seed": $SEED, "iters": 15000, "platform": "tpu", "arms": {}}
for arm in ("strat", "unstrat"):
    psnr = None
    try:
        for ln in open(f"/tmp/ab_tpu_{arm}_s$SEED.log"):
            m = re.search(r"test all psnr: ([0-9.]+)", ln)
            if m:
                psnr = float(m.group(1))
    except OSError:
        pass
    out["arms"][arm] = psnr
if all(v is not None for v in out["arms"].values()):
    out["delta_strat_minus_unstrat"] = round(
        out["arms"]["strat"] - out["arms"]["unstrat"], 3)
with open("AB_TPU_r05.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out))
EOF
log "done -> AB_TPU_r05.json"
