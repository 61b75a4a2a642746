#!/bin/bash
# Outer TPU-wedge supervisor (round 5).  Layered recovery:
#   inner:  utils/watchdog.py — armed at reconstruction() entry (setup
#           phase included), exits 17 on a wedged device;
#   middle: train.py --auto_resume N — relaunches with --resume 1 up to
#           N times (each attempt burns one watchdog timeout if the
#           tunnel is still down);
#   outer:  THIS loop — after the middle layer gives up, probe the
#           device with a bounded tiny program every PROBE_S seconds and
#           relaunch (--resume 1 continues from the newest periodic
#           checkpoint; fresh start if none) only once the probe answers.
#
# Usage: nohup bash scripts/tpu_supervisor.sh configs/synth_full.txt \
#          /tmp/synth_full_r05.log > /tmp/tpu_supervisor.log 2>&1 &
# Stop:  touch /tmp/tpu_supervisor.stop   (checked between attempts)
set -u
CONFIG=${1:-configs/synth_full.txt}
RUNLOG=${2:-/tmp/synth_full_r05.log}
PROBE_S=${PROBE_S:-240}
STOP=/tmp/tpu_supervisor.stop
cd "$(dirname "$0")/.."

probe() {
  # device init through the tunnel alone is ~70-90s — bound well above it
  timeout 180 python - <<'EOF' >/dev/null 2>&1
from tensorf_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp
jax.device_get(jnp.ones((8, 8)).sum())
EOF
}

while true; do
  [ -e "$STOP" ] && { echo "[supervisor] stop file — exiting"; exit 0; }
  if probe; then
    echo "[supervisor] $(date -u +%H:%M:%S) device up — (re)launching"
    python train.py --config "$CONFIG" --resume 1 --auto_resume 3 \
      >> "$RUNLOG" 2>&1
    rc=$?
    echo "[supervisor] $(date -u +%H:%M:%S) trainer exited rc=$rc"
    if [ "$rc" -eq 0 ]; then
      echo "[supervisor] run complete"; exit 0
    fi
    # 17 = still wedged after inner retries; anything else is a real
    # error — surface it but keep trying (a transient tunnel error at
    # teardown must not end a 30k run)
  else
    echo "[supervisor] $(date -u +%H:%M:%S) device unreachable"
  fi
  sleep "$PROBE_S"
done
