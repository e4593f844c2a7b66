"""Training-run smoke at depth (reference recipe shape,
/root/reference/train.py:102-352): a real multi-step run on synthetic
data asserting (1) the loss/EPE actually improves, (2) a mid-run
checkpoint is written and a fresh train() call resumes from it, and
(3) the in-training eval hook fires and logs metrics — none of which the
2-step smoke can catch (LR schedule, logging cadence, resume wiring).
"""

import json
import os

import numpy as np
import pytest


def _read_jsonl(path):
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


@pytest.mark.slow
def test_training_run_depth(tmp_path):
    from ppmstereo_tpu.data.datasets import SyntheticStereoDataset
    from ppmstereo_tpu.data.loader import PrefetchLoader
    from ppmstereo_tpu.train.trainer import TrainConfig, train

    h, w = 32, 64
    cfg = TrainConfig(
        model_name="ppmstereo",
        num_steps=60,
        batch_size=1,
        lr=1e-3,
        sample_len=2,
        train_iters=2,
        crop_size=(h, w),
        mixed_precision=False,
        exp_dir=str(tmp_path),
        ckpt_after_steps=0,
        save_freq=40,
        eval_freq=30,
        num_workers=0,
        log_freq=1,
        model_kwargs={
            "use_cnet": False, "attention_type": None, "top_k": 2,
            "force_xla_attention": True,
        },
    )

    # tiny overfit-able stream: one synthetic scene repeated
    ds = SyntheticStereoDataset(num_seqs=1, sample_len=2, height=h, width=w)

    class _Loader:
        def __iter__(self):
            while True:
                s = ds[0]
                yield {
                    "left": s["img"][None, :, 0],
                    "right": s["img"][None, :, 1],
                    "disparity": s["disp"][None, :, 0],
                    "valid": s["valid"][None, :, 0],
                }

    state = train(cfg, loader=_Loader(), enable_eval=True)
    assert int(state.step) == 60

    records = _read_jsonl(os.path.join(tmp_path, "metrics.jsonl"))
    train_recs = [r for r in records if "epe" in r]
    assert len(train_recs) >= 50, len(train_recs)
    early = np.mean([r["epe"] for r in train_recs[:10]])
    late = np.mean([r["epe"] for r in train_recs[-10:]])
    assert late < 0.8 * early, f"no training progress: early {early} late {late}"

    # in-training eval fired at steps 30 and 60
    eval_recs = [r for r in records if any(k.startswith("eval/") for k in r)]
    assert len(eval_recs) >= 2, records[-5:]
    assert os.path.exists(os.path.join(tmp_path, "result_intrain_30.json"))

    # checkpoints at 40 and 60 exist; a new train() resumes from 60
    ckpts = os.listdir(os.path.join(tmp_path, "ckpt"))
    assert ckpts, "no checkpoints written"

    state2 = train(cfg, loader=_Loader(), max_steps=65, enable_eval=False)
    assert int(state2.step) == 65, "resume did not continue from the checkpoint"
