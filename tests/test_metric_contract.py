"""Golden METRIC parity: the full eval contract, end to end.

Round-1 parity pinned tensors; this pins the *numbers the paper reports*:
torch reference PPMStereo -> forward_batch_test sliding windows -> torch
eval_endpoint_error_sequence (EPE / temp-EPE / bad-px,
/root/reference/evaluation/utils/eval_utils.py:34-98) on a synthetic
sequence, reproduced by our zoo predictor + evaluator with the imported
weights. Catches window-stitch, abs/sign-convention and metric-
integration drift that tensor-level tests cannot.
"""

import importlib
import sys
from unittest import mock

import numpy as np
import pytest

import jax

from tests import reference_stubs

T_WIN = 4  # sliding-window kernel_size
N = 6  # sequence length -> windows [0:4), [2:6), stride 2
H, W = 64, 256
ITERS = 2


@pytest.mark.slow
def test_end_to_end_metric_contract():
    reference_stubs.install()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import torch

    ppm = importlib.import_module("models.core.ppmstereo")
    eval_utils = importlib.import_module("evaluation.utils.eval_utils")

    class _DummyFeature(torch.nn.Module):
        def __init__(self, *a, **kw):
            super().__init__()

        def forward(self, x):  # pragma: no cover
            raise RuntimeError("cnet disabled")

    torch.manual_seed(0)
    with mock.patch.object(ppm, "Feature", _DummyFeature):
        ref = ppm.PPMStereo(
            mixed_precision=False, num_frames=5, attention_type=None,
            use_3d_update_block=True, different_update_blocks=True,
            use_convex_3d=True,
        )
    ref.use_cnet = False
    ref.eval()
    with torch.no_grad():
        for blk in (ref.update_block16, ref.update_block08, ref.update_block04):
            blk.aggregator.beta.fill_(0.5)

    from ppmstereo_tpu.data.datasets import SyntheticStereoDataset

    ds = SyntheticStereoDataset(num_seqs=1, sample_len=N, height=H, width=W)
    sample = ds[0]
    video = sample["img"]  # (N, 2, H, W, 3)
    gt = np.abs(sample["disp"][:, 0])  # (N, H, W, 1)
    mask = sample["valid"][:, 0][..., None]

    # ---- torch side: forward_batch_test + reference metrics ----------
    tvid = torch.from_numpy(video).permute(0, 1, 4, 2, 3).contiguous()
    with mock.patch.object(torch.Tensor, "cuda", lambda self, *a, **kw: self), \
         torch.no_grad():
        preds = ref.forward_batch_test(
            {"stereo_video": tvid}, kernel_size=T_WIN, iters=ITERS
        )
    tpred = preds["disparity"]  # (N, 1, H, W), abs
    want = eval_utils.eval_endpoint_error_sequence(
        tpred.float(),
        torch.from_numpy(gt).permute(0, 3, 1, 2).contiguous(),
        torch.from_numpy(mask).permute(0, 3, 1, 2).contiguous(),
    )
    want = {k: float(v) for k, v in want.items()}

    # ---- our side: zoo predictor + evaluator metrics ------------------
    import jax.numpy as jnp

    from ppmstereo_tpu.evaluation.metrics import eval_endpoint_error_sequence
    from ppmstereo_tpu.models.zoo import model_zoo
    from ppmstereo_tpu.utils.ppm_mapping import ppmstereo_mapping
    from ppmstereo_tpu.utils.torch_import import import_by_mapping

    predictor = model_zoo(
        "PPMStereoModel", kernel_size=T_WIN, iters=ITERS,
        use_cnet=False, attention_type=None, mixed_precision=False,
        num_frames=5, top_k=5, force_xla_attention=True,
    )
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    new_inner, missing = import_by_mapping(
        sd, jax.device_get(predictor.params)["params"], ppmstereo_mapping(None)
    )
    assert not missing
    predictor.load_params({"params": new_inner})

    out = predictor({"stereo_video": video})
    got = eval_endpoint_error_sequence(
        jnp.asarray(out["disparity"]), jnp.asarray(gt), jnp.asarray(mask)
    )
    got = {k: float(v) for k, v in got.items()}

    # prediction-level stitching parity first (sharper diagnostics)
    ours = np.asarray(out["disparity"])[..., 0]
    theirs = tpred[:, 0].numpy()
    assert np.abs(ours - theirs).max() < 0.05, np.abs(ours - theirs).max()

    for k, v in want.items():
        assert k in got, f"metric {k} missing from our evaluator"
        assert abs(got[k] - v) < max(0.02 * abs(v), 1e-2), (k, got[k], v)
