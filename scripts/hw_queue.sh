#!/bin/bash
# Hardware validation queue (PERF_NOTES "Hardware validation queue"
# + round-4 revision). Run when the axon relay is back:
#   nohup bash scripts/hw_queue.sh > /tmp/hwq/driver.log 2>&1 &
# Serializes one TPU job at a time; -s KILL because a python blocked
# in the relay's native read ignores SIGTERM (zombie holds the claim).
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1
LOG=/tmp/hwq
mkdir -p $LOG
cd /root/repo

# Stop STARTING new steps after this instant so the device claim is
# free for the driver's round-end bench (override: HWQ_DEADLINE=<epoch>).
# Default: 4 h from queue start — a RELATIVE guard (the round-3 absolute
# date was stale on re-run and silently SKIPPED every step).
DEADLINE=${HWQ_DEADLINE:-$(( $(date +%s) + 4*3600 ))}

run() { # run <timeout_s> <name> <cmd...>
  local t=$1 name=$2; shift 2
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "=== $name SKIPPED (past deadline $(date -d @$DEADLINE +%H:%M))"
    return
  fi
  echo "=== $name start $(date +%H:%M:%S)"
  timeout -s KILL "$t" "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name rc=$? end $(date +%H:%M:%S)"
  sleep 5
}

# liveness gate. 900 s: a healthy relay can still take 90-300 s to
# establish a fresh process's device claim on the FIRST readback
# (measured 2026-08-19: 88.8 s and 292 s in back-to-back probes,
# 30 ms steady-state after) — 300 s here produced false "relay dead"
# aborts.
timeout -s KILL 900 python -u -c "
import jax, jax.numpy as jnp
print('RELAY_OK', float(jax.jit(lambda a: a.sum())(jnp.ones((8,128)))))
" > $LOG/00_liveness.log 2>&1 || { echo "relay dead; abort"; exit 3; }
echo "relay alive $(date)"

# demo-golden fixtures (CPU, generated once)
if [ ! -f /tmp/v2560_golden_it.npy ]; then
  JAX_PLATFORMS=cpu timeout 1200 python -u scripts/make_demo_golden.py \
    --width 2560 --height 1088 --ckpt /tmp/ref_rand_base.pt \
    --prefix /tmp/v2560 > $LOG/00b_golden_gen.log 2>&1
fi

run 3500 01_warp_ab      python -u scripts/tpu_warp_v2_ab.py
run 3500 02_route_matrix python -u scripts/tpu_route_matrix.py
run 2400 03_fusepair_chk python -u scripts/tpu_fusepair_ab.py --check-only
run 3500 04_attn_ab      python -u scripts/tpu_attn_ab.py --quick
run 3500 05_spatial      python -u scripts/tpu_spatial_check.py
run 3500 06_trace6       python -u scripts/tpu_trace6.py
run 3500 07_fast_qual    python -u scripts/tpu_fast_quality.py
run 3500 08_bench        python -u bench.py

echo "queue done $(date)"
