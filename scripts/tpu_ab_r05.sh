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
