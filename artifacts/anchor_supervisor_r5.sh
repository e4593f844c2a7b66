#!/bin/bash
# Round-5 anchor deepening (VERDICT r4 item 4): warm-restart from the
# committed 5k anchor_r3.npz and train ANCHOR_STEPS more (default
# 10000 -> effective 15k), recycle-proof:
#   * train_anchor.py exports checkpoints/anchor_r5.npz (+ .json
#     sidecar) every save_freq=1000 steps from INSIDE the loop — a
#     non-gitignored path, so even an end-of-round auto-commit
#     preserves the latest weights;
#   * chunked with auto-resume from Orbax state between chunks, so a
#     tunnel drop or kill loses at most one chunk's progress;
#   * /tmp/anchor_stop stops cleanly between chunks.
# ONE TPU process at a time — do not run anything else on the chip
# while this loop is live.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
export ANCHOR_WIRE_UINT8=1
export ANCHOR_STEPS=${ANCHOR_STEPS:-10000}
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
CHUNK=${ANCHOR_CHUNK:-2500}
TARGET=$CHUNK
while [ "$TARGET" -le "$ANCHOR_STEPS" ]; do
  echo "=== $(date -u +%H:%M:%S) chunk to run step $TARGET / $ANCHOR_STEPS ==="
  ANCHOR_MAX_STEPS=$TARGET timeout "${ANCHOR_CHUNK_TIMEOUT:-9000}" \
    python artifacts/train_anchor.py \
    >> checkpoints/anchor_r5_train_chunks.log 2>&1
  rc=$?
  echo "chunk exit: $rc (target $TARGET) at $(date -u +%H:%M:%S)"
  if [ -f /tmp/anchor_stop ]; then echo "stop flag — exiting"; break; fi
  # advance only when the chunk reached its target (otherwise retry it:
  # a tunnel drop mid-chunk resumes from the last Orbax save)
  LAST=$(python - <<'EOF'
import json, os
try:
    print(json.load(open("checkpoints/anchor_r5.json"))["run_steps"])
except Exception:
    print(0)
EOF
)
  if [ "$LAST" -ge "$TARGET" ]; then TARGET=$((TARGET + CHUNK)); fi
  sleep 30
done
echo "supervisor done at $(date -u +%H:%M:%S)"
