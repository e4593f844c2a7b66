#!/bin/bash
# Round-4 anchor deepening (VERDICT r3 item 5): resume the standing
# accuracy anchor from step 5000 toward 15000 at the same reference
# hyperparameters. Same plan-B recipe as round 3: f32 wire (remote
# compile cache hit) with chunked restarts to bound the ~26 MB/step
# axon-client host-buffer growth; resumes from the latest Orbax
# checkpoint each chunk.
#
# PPM_CONV_IMPLICIT_PAD=1 keeps the round-3 conv lowering so the cached
# train-step graph is reused (the round-4 pad+VALID lowering is
# numerically identical — verified by artifacts/micro_padvalid_ab.py —
# but compiles a different HLO, which would cost a fresh 20-40 min
# remote compile on a degraded tunnel day).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
export ANCHOR_WIRE_UINT8=0
export ANCHOR_STEPS=15000
export PPM_CONV_IMPLICIT_PAD=1
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
for TARGET in 6500 8000 9500 11000 12500 14000 15000; do
  echo "=== $(date -u +%H:%M:%S) chunk to step $TARGET ==="
  ANCHOR_MAX_STEPS=$TARGET timeout 5400 python artifacts/train_anchor.py \
    >> checkpoints/anchor_r4_train_chunks.log 2>&1
  echo "chunk exit: $? (target $TARGET) at $(date -u +%H:%M:%S)"
  # stop early if the hard deadline file appeared (set by the driver of
  # this round to reclaim the chip for the final bench)
  if [ -f /tmp/anchor_stop ]; then echo "stop flag — exiting"; break; fi
  sleep 60  # let the device grant settle between processes
done
