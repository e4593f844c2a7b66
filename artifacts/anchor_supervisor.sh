#!/bin/bash
# Plan-B anchor supervisor: f32 wire (remote-compile-cache hit) with
# chunked restarts to bound the ~26 MB/step host leak. Resumes from the
# latest Orbax checkpoint each chunk.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
export ANCHOR_WIRE_UINT8=0
for TARGET in 5000 6500 8000; do
  echo "=== chunk to step $TARGET ==="
  ANCHOR_MAX_STEPS=$TARGET timeout 7200 python artifacts/train_anchor.py \
    >> checkpoints/anchor_r3_train_chunks.log 2>&1
  echo "chunk exit: $? (target $TARGET)"
  sleep 60  # let the device grant settle between processes
done
