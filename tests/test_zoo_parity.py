"""END-TO-END numerical parity for the non-flagship model families vs
the torch reference (same technique as test_reference_parity.py: build
the actual reference model on CPU with stubbed CUDA deps, import its
randomly-initialized state dict through the name mapping, compare full
forwards).

Families covered here:
  DynamicStereo   (/root/reference/models/core/dynamic_stereo.py:346-494)
  BiDAStereo      (/root/reference/models/core/bidastereo.py:185-353)
  StereoAnyVideo  (/root/reference/models/core/stereoanyvideo.py:204-338)
"""

import importlib
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests import reference_stubs

T = 5
H, W = 64, 256
ITERS = 2

DS_AT = "self_stereo_temporal_update_time_update_space"


def _install_reference():
    reference_stubs.install()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")


def _to_torch_video(x):
    import torch

    return torch.from_numpy(x).permute(0, 1, 4, 2, 3).contiguous()


def _check(got, want, max_abs=0.1, min_corr=0.998):
    got = np.asarray(got)
    assert got.shape == want.shape, (got.shape, want.shape)
    err = np.abs(got - want)
    corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert err.max() < max_abs, f"max abs err {err.max()} px (mean {err.mean()})"
    assert corr > min_corr, f"correlation {corr}"


# ---------------------------------------------------------------- DynamicStereo


@pytest.fixture(scope="module")
def reference_ds():
    _install_reference()
    ds = importlib.import_module("models.core.dynamic_stereo")
    import torch

    torch.manual_seed(0)
    model = ds.DynamicStereo(
        mixed_precision=False,
        num_frames=T,
        attention_type=DS_AT,
        use_3d_update_block=True,
        different_update_blocks=True,
    )
    model.eval()
    return model


@pytest.mark.slow
def test_dynamic_stereo_parity(reference_ds):
    """Shipped DynamicStereo config (models/dynamic_stereo_model.py:27-34):
    full SST attention + per-scale 3-D update blocks."""
    import torch

    from ppmstereo_tpu.models.dynamic_stereo import DynamicStereo, DynamicStereoConfig
    from ppmstereo_tpu.utils.torch_import import import_by_mapping
    from ppmstereo_tpu.utils.zoo_mappings import dynamicstereo_mapping, is_zoo_dead_key

    rng = np.random.default_rng(11)
    left = rng.uniform(0, 255, (1, T, H, W, 3)).astype(np.float32)
    right = rng.uniform(0, 255, (1, T, H, W, 3)).astype(np.float32)

    with torch.no_grad():
        disp = reference_ds(
            _to_torch_video(left), _to_torch_video(right), iters=ITERS, test_mode=True
        )
    want = disp.permute(0, 1, 3, 4, 2).numpy()  # (b, t, h, w, 1)

    cfg = DynamicStereoConfig(mixed_precision=False, num_frames=T, attention_type=DS_AT)
    model = DynamicStereo(cfg=cfg, iters=ITERS, test_mode=True)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(left), jnp.asarray(right))

    sd = {k: v.detach().numpy() for k, v in reference_ds.state_dict().items()}
    mapping = dynamicstereo_mapping(DS_AT)
    new_inner, missing = import_by_mapping(sd, params["params"], mapping)
    unmapped = sorted(k for k in set(sd) - set(mapping) if not is_zoo_dead_key(k, mapping))
    assert not missing, f"missing: {missing[:10]}"
    assert not unmapped, f"unmapped reference tensors: {unmapped[:10]}"

    got = model.apply({"params": new_inner}, jnp.asarray(left), jnp.asarray(right))
    _check(got, want)


# ----------------------------------------------------------------- BiDAStereo


def _install_fake_raft_model(flow_queue):
    """Register a fake models.raft_model whose RAFTModel pops precomputed
    1/4-res flows. The reference's real RAFTModel wraps the un-vendored
    third_party/RAFT submodule (raft_model.py:16-19), absent here; parity
    of the flow provider itself is covered by test_raft_parity."""
    import types

    import torch

    mod = types.ModuleType("models.raft_model")

    class RAFTModel(torch.nn.Module):
        def __init__(self):
            super().__init__()

        def forward(self, image1, image2):
            return torch.from_numpy(flow_queue.pop(0))

    mod.RAFTModel = RAFTModel
    sys.modules["models.raft_model"] = mod


@pytest.mark.slow
def test_bidastereo_parity():
    """BiDAStereo graph parity with injected (deterministic) RAFT flows:
    fw/bw feature warping, alternating-patch TFCL, bidirectional motion
    hidden state, shared update block, 3-scale cascade."""
    _install_reference()

    rng = np.random.default_rng(21)
    h4, w4 = H // 4, W // 4
    # queue order matches reference compute_flow (bidastereo.py:150-157):
    # per i: backward then forward
    flows_bw = rng.uniform(-2, 2, (T - 1, 1, 2, h4, w4)).astype(np.float32)
    flows_fw = rng.uniform(-2, 2, (T - 1, 1, 2, h4, w4)).astype(np.float32)
    queue = []
    for i in range(T - 1):
        queue.append(flows_bw[i])
        queue.append(flows_fw[i])
    _install_fake_raft_model(list(queue))

    import importlib

    bida = importlib.import_module("models.core.bidastereo")
    bida = importlib.reload(bida)  # pick up the fake raft_model
    import torch

    torch.manual_seed(0)
    ref = bida.BiDAStereo(mixed_precision=False)
    ref.eval()

    left = rng.uniform(0, 255, (1, T, H, W, 3)).astype(np.float32)
    right = rng.uniform(0, 255, (1, T, H, W, 3)).astype(np.float32)
    with torch.no_grad():
        disp = ref(_to_torch_video(left), _to_torch_video(right), iters=ITERS, test_mode=True)
    want = disp.permute(0, 1, 3, 4, 2).numpy()

    from ppmstereo_tpu.models.bidastereo import BiDAStereo, BiDAStereoConfig
    from ppmstereo_tpu.utils.torch_import import import_by_mapping
    from ppmstereo_tpu.utils.zoo_mappings import bidastereo_mapping, is_zoo_dead_key

    jf_fw = jnp.asarray(flows_fw.transpose(0, 1, 3, 4, 2).reshape(1, T - 1, h4, w4, 2))
    jf_bw = jnp.asarray(flows_bw.transpose(0, 1, 3, 4, 2).reshape(1, T - 1, h4, w4, 2))
    cfg = BiDAStereoConfig(mixed_precision=False)
    model = BiDAStereo(cfg=cfg, iters=ITERS, test_mode=True)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(left), jnp.asarray(right),
        flows=(jf_fw, jf_bw),
    )

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    mapping = bidastereo_mapping(include_raft=False)

    def bida_transform(name, w):
        from ppmstereo_tpu.utils.torch_import import convert_tensor

        if name.endswith("init_hidden_state"):
            # torch (1, 1, 48, 1, 1) -> flax (1, 1, 1, 1, 48)
            return np.transpose(w, (0, 1, 3, 4, 2))
        return convert_tensor(name, w)

    new_inner, missing = import_by_mapping(
        sd, params["params"], mapping, transform=bida_transform
    )
    unmapped = sorted(k for k in set(sd) - set(mapping) if not is_zoo_dead_key(k, mapping))
    assert not missing, f"missing: {missing[:10]}"
    assert not unmapped, f"unmapped reference tensors: {unmapped[:10]}"

    got = model.apply(
        {"params": new_inner}, jnp.asarray(left), jnp.asarray(right),
        flows=(jf_fw, jf_bw),
    )
    _check(got, want)


# ----------------------------------------------------------------------- RAFT


def test_raft_parity():
    """The frozen RAFT flow provider vs a faithful torch princeton-vl
    RAFT (tests/raft_torch_stub.py; official state-dict layout), incl.
    frozen-BatchNorm running-stat import and the corr tap ordering."""
    import torch

    from tests.raft_torch_stub import RAFT as TorchRAFT

    from ppmstereo_tpu.models.raft import RAFT, RAFTConfig
    from ppmstereo_tpu.utils.torch_import import import_by_mapping
    from ppmstereo_tpu.utils.zoo_mappings import is_zoo_dead_key, raft_mapping

    torch.manual_seed(0)
    ref = TorchRAFT()
    # give the cnet's BatchNorms non-trivial running stats so the
    # FrozenBatchNorm import path is actually exercised
    gen = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for mod in ref.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.copy_(torch.randn(mod.running_mean.shape, generator=gen) * 0.5)
                mod.running_var.copy_(torch.rand(mod.running_var.shape, generator=gen) + 0.5)
    ref.eval()

    rng = np.random.default_rng(31)
    # H/64 must be >= 2: the coarsest 2-D pyramid level degenerates to
    # one row below that and RAFT's grid normalization divides by zero
    h, w = 128, 192
    im1 = rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32)
    im2 = rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32)
    t1 = torch.from_numpy(im1).permute(0, 3, 1, 2).contiguous()
    t2 = torch.from_numpy(im2).permute(0, 3, 1, 2).contiguous()
    with torch.no_grad():
        _, flow_up = ref(t1, t2, iters=4, test_mode=True)
    want = flow_up.permute(0, 2, 3, 1).numpy()

    model = RAFT(cfg=RAFTConfig(), iters=4)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(im1), jnp.asarray(im2))
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    mapping = raft_mapping()
    new_inner, missing = import_by_mapping(sd, params["params"], mapping)
    unmapped = sorted(k for k in set(sd) - set(mapping) if not is_zoo_dead_key(k, mapping))
    assert not missing, f"missing: {missing[:10]}"
    assert not unmapped, f"unmapped torch tensors: {unmapped[:10]}"

    _, got = model.apply({"params": new_inner}, jnp.asarray(im1), jnp.asarray(im2))
    _check(np.asarray(got), want, max_abs=0.05, min_corr=0.999)
