"""Torch-golden parity for the auxiliary blocks that are dead in the
reference's shipped config but part of its API surface
(ppmtereo_update.py: RelPosEmb :372-397, Mlp :567-590,
SKMotionEncoder6_Deep_nopool_res_Mem_skflow :485-509)."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _reference_update_module():
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from tests.reference_stubs import install

    install()
    import importlib

    return importlib.import_module("models.core.ppmtereo_update")


def _t2j_conv(w):
    # torch conv (O, I, kh, kw) -> flax (kh, kw, I, O)
    return jnp.asarray(np.transpose(w.detach().numpy(), (2, 3, 1, 0)))


def test_mlp_matches_torch():
    import torch

    ref = _reference_update_module()
    m = ref.Mlp(32, hidden_features=48, out_features=16).eval()
    from ppmstereo_tpu.nn.attention import Mlp

    ours = Mlp(hidden_features=48, out_features=16)
    x = np.random.default_rng(0).standard_normal((2, 5, 32)).astype(np.float32)
    params = {
        "params": {
            "fc1": {
                "Dense_0": {
                    "kernel": jnp.asarray(m.fc1.weight.detach().numpy().T),
                    "bias": jnp.asarray(m.fc1.bias.detach().numpy()),
                }
            },
            "fc2": {
                "Dense_0": {
                    "kernel": jnp.asarray(m.fc2.weight.detach().numpy().T),
                    "bias": jnp.asarray(m.fc2.bias.detach().numpy()),
                }
            },
        }
    }
    got = ours.apply(params, jnp.asarray(x))
    with torch.no_grad():
        want = m(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_relposemb_matches_torch():
    import torch

    ref = _reference_update_module()
    m = ref.RelPosEmb(max_pos_size=8, dim_head=16).eval()
    from ppmstereo_tpu.nn.attention import RelPosEmb

    ours = RelPosEmb(max_pos_size=8, dim_head=16)
    q = np.random.default_rng(1).standard_normal((2, 3, 5, 7, 16)).astype(np.float32)
    params = {
        "params": {
            "rel_height": jnp.asarray(m.rel_height.weight.detach().numpy()),
            "rel_width": jnp.asarray(m.rel_width.weight.detach().numpy()),
        }
    }
    got = ours.apply(params, jnp.asarray(q))
    with torch.no_grad():
        want = m(torch.from_numpy(q)).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_sk_motion_encoder_matches_torch():
    import torch

    ref = _reference_update_module()
    m = ref.SKMotionEncoder6_Deep_nopool_res_Mem_skflow(
        cor_planes=36, k_conv=[1, 15]
    ).eval()
    from ppmstereo_tpu.nn.motion import SKMotionEncoder

    ours = SKMotionEncoder(cor_planes=36, k_conv=(1, 15))

    def _conv_p(c):
        return {
            "kernel": _t2j_conv(c.weight),
            "bias": jnp.asarray(c.bias.detach().numpy()),
        }

    def pc_params(t):
        return {
            "ffn1_a": {"Conv_0": _conv_p(t.ffn1[0])},
            "ffn1_b": {"Conv_0": _conv_p(t.ffn1[2])},
            "dws_0": {"Conv_0": _conv_p(t.conv_list[0])},
            "dws_1": {"Conv_0": _conv_p(t.conv_list[1])},
            "pw": {"Conv_0": _conv_p(t.pw)},
            "ffn2_a": {"Conv_0": _conv_p(t.ffn2[0])},
            "ffn2_b": {"Conv_0": _conv_p(t.ffn2[2])},
        }

    params = {
        "params": {
            "convc1": pc_params(m.convc1),
            "convc2": pc_params(m.convc2),
            "convf1": {"Conv_0": _conv_p(m.convf1)},
            "convf2": pc_params(m.convf2),
            "conv": pc_params(m.conv),
        }
    }
    rng = np.random.default_rng(2)
    flow = rng.standard_normal((1, 10, 12, 2)).astype(np.float32)
    corr = rng.standard_normal((1, 10, 12, 36)).astype(np.float32)
    got = ours.apply(params, jnp.asarray(flow), jnp.asarray(corr))
    with torch.no_grad():
        want = m(
            torch.from_numpy(np.transpose(flow, (0, 3, 1, 2))),
            torch.from_numpy(np.transpose(corr, (0, 3, 1, 2))),
        ).numpy()
    np.testing.assert_allclose(
        np.asarray(got), np.transpose(want, (0, 2, 3, 1)), rtol=1e-4, atol=1e-4
    )
