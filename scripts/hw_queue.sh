#!/bin/bash
# Hardware validation queue (PERF_NOTES "Hardware validation queue"
# + round-3 additions). Run when the axon relay is back:
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

run 2400 01_probe4      python -u scripts/pallas_probe4.py
run 3500 02_warp_v2_ab  python -u scripts/tpu_warp_v2_ab.py
run 3500 03_planar_ab   python -u scripts/tpu_planar_ab.py
run 2400 04_deconv      python -u scripts/tpu_deconv_check.py
run 3500 05_cond_ab     python -u scripts/tpu_cond_ab.py
run 3000 06_demo_golden python -u cli/demo_2x.py \
  --ckpt /tmp/ref_rand_base.pt --frame0 /tmp/vframe0.png \
  --frame1 /tmp/vframe1.png --out /tmp/verify_out.png --fp32
JAX_PLATFORMS=cpu python -u - > $LOG/06_psnr.log 2>&1 << 'EOF'
import numpy as np
from PIL import Image
g = np.load('/tmp/golden_it.npy')
o = np.asarray(Image.open('/tmp/verify_out.png'), np.float32) / 255.0
if g.ndim == 4: g = g[0]
if g.shape[0] == 3: g = g.transpose(1, 2, 0)
mse = float(np.mean((g - o) ** 2))
print('demo golden PSNR dB:', -10 * np.log10(mse))
EOF
# second-resolution demo golden (VERDICT r2 item 4): requires
# /tmp/golden_it_4k.npy from /tmp/make_golden_4k.py (CPU, ~10 min)
if [ -f /tmp/golden_it_4k.npy ]; then
run 3500 06b_demo_4k python -u cli/demo_2x.py \
  --ckpt /tmp/ref_rand_base.pt --frame0 /tmp/vframe4k_0.png \
  --frame1 /tmp/vframe4k_1.png --out /tmp/verify_out_4k.png --fp32
JAX_PLATFORMS=cpu python -u - > $LOG/06b_psnr.log 2>&1 << 'EOF'
import numpy as np
from PIL import Image
g = np.load('/tmp/golden_it_4k.npy')
o = np.asarray(Image.open('/tmp/verify_out_4k.png'), np.float32) / 255.0
mse = float(np.mean((g - o) ** 2))
print('demo 4K golden PSNR dB:', -10 * np.log10(mse))
EOF
fi
run 3500 07_attn_ab     python -u scripts/tpu_attn_ab.py
run 3000 08_argsrc      python -u scripts/tpu_argsrc_probe.py
run 3000 09_enc_same    python -u scripts/tpu_enc_same.py
run 3500 10_trace6      python -u scripts/tpu_trace6.py
run 3500 11_fast_qual   python -u scripts/tpu_fast_quality.py
run 3500 11b_overfit_fq python -u scripts/tpu_overfit_fastq.py
run 3500 12_bench       python -u bench.py

echo "queue done $(date)"
