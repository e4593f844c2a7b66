"""Checkpoint save/restore via Orbax.

TPU-native replacement for the reference's torch.save of
{model, optimizer, scheduler, total_steps} (/root/reference/train.py:286-299)
and its strict-load + step resume (:176-195): async Orbax checkpointing of
the whole TrainState PyTree + step metadata, with a retention policy.
"""

from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, ckpt_dir: str, max_to_keep: int = 5, async_save: bool = True):
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True, enable_async_checkpointing=async_save
        )
        self.manager = ocp.CheckpointManager(self.ckpt_dir, options=options)

    def save(self, step: int, state: Any, metrics: dict | None = None):
        self.manager.save(
            step, args=ocp.args.StandardSave(state), metrics=metrics or {}
        )

    def restore(self, state_template: Any, step: int | None = None):
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            return None, None
        restored = self.manager.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )
        return restored, step

    def wait(self):
        self.manager.wait_until_finished()

    def close(self):
        self.manager.close()


def save_params(path: str, params: Any):
    """One-shot param save (eval-only checkpoints)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params)
    ckptr.wait_until_finished()


def load_params_npz(path: str) -> dict:
    """Flat 'a/b/c' (f16) npz -> nested f32 variables dict — the format
    written by cli/import_torch.py and artifacts/train_anchor.py."""
    import numpy as np

    flat = np.load(path)
    tree: dict = {}
    for k in flat.files:
        parts = k.split("/")
        d = tree
        for part in parts[:-1]:
            d = d.setdefault(part, {})
        d[parts[-1]] = flat[k].astype(np.float32)
    if "params" not in tree:
        tree = {"params": tree}
    return tree


def load_params(path: str, template: Any | None = None):
    if path.endswith(".npz"):
        return load_params_npz(path)
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(os.path.abspath(path), target=template)
    return ckptr.restore(os.path.abspath(path))
