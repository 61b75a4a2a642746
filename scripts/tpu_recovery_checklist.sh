#!/bin/bash
# Round-4 TPU measurement checklist, run once the axon tunnel answers
# again (driver: /tmp/on_recovery.sh probes scripts/probe_tunnel.py every
# 4 min and execs this script on the first success).
#
# Ordering is by evidence-per-minute (VERDICT r3 #2/#3 first, the long
# quality A/Bs last), so a short recovery window still lands the numbers
# the round needs:
#   1. bench.py            -> BENCH_SELF_r04 headline (VM/CP rays/s,
#                             roofline %%), ~15-30 min incl. compiles
#   2. bench_render.py     -> RENDER_r04 fps for the three drivers incl.
#                             the UNMEASURED late-r3 levers (group
#                             compaction, chord-capped lattices,
#                             probe-only counts), ~20-40 min
#   3. ablate_step.py A/C  -> roofline-gap attribution after the levers,
#                             ~10-20 min each
#   4. ablate_render.py    -> serving chunk economics re-measure
#   5. matched-seed 15k TPU quality A/B (VERDICT r3 #4), ~4 h per arm,
#      wedge-supervised via --auto_resume
#
# All stdout/stderr under /tmp/*_r04*; progress lines in /tmp/recovery.log.
set -u
cd /root/repo
log() { echo "$(date -u +%H:%M:%S) $*" >> /tmp/recovery.log; }

log "checklist start"
timeout 3600 python bench.py > /tmp/bench_r04.json 2> /tmp/bench_r04.err
log "bench rc=$?"
timeout 3600 python scripts/bench_render.py > /tmp/render_r04.log 2>&1
log "render rc=$?"
timeout 2400 python scripts/ablate_step.py --phase A > /tmp/ablate_A_r04.log 2>&1
log "ablate_A rc=$?"
timeout 2400 python scripts/ablate_step.py --phase C > /tmp/ablate_C_r04.log 2>&1
log "ablate_C rc=$?"
timeout 2400 python scripts/ablate_render.py > /tmp/ablate_render_r04.log 2>&1
log "ablate_render rc=$?"
# matched-seed quality A/B (VERDICT r3 #4); auto_resume supervises wedges
timeout 16000 python train.py --config configs/synth_ab_strat.txt \
  --auto_resume 3 > /tmp/ab_strat_tpu.log 2>&1
log "ab_strat rc=$?"
timeout 16000 python train.py --config configs/synth_ab_unstrat.txt \
  --auto_resume 3 > /tmp/ab_unstrat_tpu.log 2>&1
log "ab_unstrat rc=$?"
log "checklist done"
