#!/bin/bash
# Drains artifacts/TPU_QUEUE.md after the anchor supervisor exits:
#   1. export the final params npz (train_anchor does it at ANCHOR_STEPS;
#      if the run was cut short, export from the latest Orbax ckpt)
#   2. anchor EPE table -> EPE_r04.json
#   3. GRU in-model-gap micro
#   4. final bench.py short (fresh BENCH_LAST_GOOD + warm cache)
# Usage: bash artifacts/post_anchor_queue.sh <supervisor_pid>
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

SUP_PID=${1:-}
if [ -n "$SUP_PID" ]; then
  echo "waiting for supervisor $SUP_PID ..."
  while kill -0 "$SUP_PID" 2>/dev/null; do sleep 60; done
fi
sleep 90  # device grant settle

STEP=$(ls checkpoints/anchor_r3/ckpt | sort -n | tail -1)
echo "=== latest anchor step: $STEP ==="

# train_anchor's own completion export overwrites the COMMITTED r3 npz;
# claim it as the r4 anchor and restore the committed file
if ! git diff --quiet -- checkpoints/anchor_r3.npz 2>/dev/null; then
  mv checkpoints/anchor_r3.npz checkpoints/anchor_r4.npz
  git checkout -- checkpoints/anchor_r3.npz
  echo "claimed train_anchor's completion export as anchor_r4.npz"
fi
if [ ! -f checkpoints/anchor_r4.npz ]; then
  echo "=== exporting anchor_r4.npz from step $STEP ==="
  timeout 1800 python artifacts/export_anchor_npz.py \
    checkpoints/anchor_r3/ckpt checkpoints/anchor_r4.npz \
    > /tmp/export_r4.log 2>&1
  echo "export rc=$?"
fi
sleep 60

echo "=== EPE table (EPE_r04.json) ==="
ANCHOR_NPZ=/root/repo/checkpoints/anchor_r4.npz \
ANCHOR_STEPS_LABEL=$STEP \
EPE_OUT=/root/repo/EPE_r04.json \
timeout 5400 python artifacts/anchor_epe_table.py \
  > checkpoints/anchor_r4_epe_table.log 2>&1
echo "epe table rc=$?"
sleep 60

echo "=== GRU in-model-gap micro ==="
timeout 1200 python artifacts/micro_gru_inmodel_gap.py \
  > /tmp/gru_gap.log 2>&1
echo "gru micro rc=$?"; tail -2 /tmp/gru_gap.log
sleep 60

echo "=== final bench short ==="
BENCH_DEADLINE_S=2800 timeout 2900 python bench.py \
  > /tmp/bench_final.json 2>/tmp/bench_final_stderr.log
echo "bench rc=$?"; cat /tmp/bench_final.json
echo "=== queue done $(date -u +%H:%M:%S) ==="
