#!/bin/bash
# Round-4 anchor deepening, phase B: uint8-wire chunks (4x less upload
# per step than the f32 wire — the r3-measured wall rate of ~3.4 s/step
# at f32 was upload-bound on the degraded tunnel). The uint8 train graph
# was compiled in r3 and lives in the persistent cache. Resumes from the
# latest Orbax checkpoint; /tmp/anchor_stop stops between chunks.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
export ANCHOR_WIRE_UINT8=1
export ANCHOR_STEPS=15000
export PPM_CONV_IMPLICIT_PAD=1
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
for TARGET in 8000 9500 11000 12500 14000 15000; do
  echo "=== $(date -u +%H:%M:%S) chunk to step $TARGET ==="
  ANCHOR_MAX_STEPS=$TARGET timeout 5400 python artifacts/train_anchor.py \
    >> checkpoints/anchor_r4_train_chunks.log 2>&1
  echo "chunk exit: $? (target $TARGET) at $(date -u +%H:%M:%S)"
  if [ -f /tmp/anchor_stop ]; then echo "stop flag — exiting"; break; fi
  sleep 60
done
