"""Round-4 bisection: with pad+VALID convs the GRU-in-scan is
Shardy-exact, but the full model still diverges. Isolate the
PPMUpdateLoop (the scanned refinement stage) under seq+space sharding,
then stub body ops to find the remaining trigger.

Run: python artifacts/shardy_bisect_loop_r4.py
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_use_shardy_partitioner", True)
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ppmstereo_tpu.models.ppm_stereo import PPMStereoConfig, PPMUpdateLoop
from ppmstereo_tpu.ops.corr import build_corr_pyramid
from ppmstereo_tpu.ops.geometry import coords_grid_x

CFG = PPMStereoConfig(
    mixed_precision=False, use_cnet=False, top_k=4, force_xla_attention=True,
)

b, t, c = 1, 4, 128
h = int(os.environ.get("BISECT_H", "16"))
w = int(os.environ.get("BISECT_W", "32"))
rng = np.random.default_rng(0)


def r(*shape):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32))


fmap1, fmap2 = r(b, t, h, w, 256), r(b, t, h, w, 256)
pyramid = build_corr_pyramid(
    fmap1.reshape(b * t, h, w, -1), fmap2.reshape(b * t, h, w, -1),
    CFG.corr_levels,
)
coords0 = coords_grid_x(b * t, h, w)
query_pe = r(b, t, h, w, c)
key_aug = r(b, t, h, w, 2 * c)
sim_score = r(b, t, t) * 0.1
flow = r(b, t, h, w, 2) * 0.5
net = jnp.tanh(r(b, t, h, w, 128))
inp = jax.nn.relu(r(b, t, h, w, 128))

ATT = os.environ.get("BISECT_ATT", "") or None

# body-op stubs (comma list in BISECT_STUB): play, corr, topk
STUBS = set(filter(None, os.environ.get("BISECT_STUB", "").split(",")))
if "play" in STUBS:
    def _zero_play(self, query_pe, key_aug, value, idx, score_norm):
        return jnp.zeros_like(query_pe)
    PPMUpdateLoop._play = _zero_play
if "corr" in STUBS:
    import ppmstereo_tpu.models.ppm_stereo as _ppm

    def _zero_corr(pyramid, coords_x, radius):
        bt, hh, ww = coords_x.shape
        return jnp.zeros((bt, hh, ww, 36), pyramid[0].dtype)
    _ppm.corr_lookup = _zero_corr
if "topk" in STUBS:
    _orig_topk = jax.lax.top_k

    def _fixed_topk(x, k):
        v, _ = _orig_topk(x, k)
        idx = jnp.broadcast_to(jnp.arange(k), x.shape[:-1] + (k,))
        return v, idx
    jax.lax.top_k = _fixed_topk

loop = PPMUpdateLoop(cfg=CFG, iters=2, interp_scale=1, collect_preds=False,
                     attention_type=ATT)
mh = None


def init_and_apply():
    global mh
    variables = loop.init(
        jax.random.PRNGKey(0), pyramid, coords0, query_pe, key_aug,
        sim_score, flow, net, inp, jnp.zeros((b, t, h, w, 64)),
    )
    return variables


params = init_and_apply()
mh = jnp.zeros((b, t, h, w, 64))

args = (pyramid, coords0, query_pe, key_aug, sim_score, flow, net, inp, mh)


def f(params, *args):
    out = loop.apply(params, *args)
    # (flow, flow_out, net, motion_hidden, preds, uncs, unc_last)
    return {"flow": out[0], "flow_out": out[1], "net": out[2],
            "mh": out[3], "unc": out[6]}


ref = jax.jit(f)(params, *args)

devs = np.asarray(jax.devices()[:4]).reshape(2, 2)
mesh = Mesh(devs, axis_names=("seq", "space"))
rep = NamedSharding(mesh, P())


def spec_for(x, name):
    # video tensors (b,t,h,w,c): t->seq, h->space. sim/strive (b,t,t):
    # axis1 -> seq. pyramid entries (b*t, h, w, ...): t folded in axis0.
    if name == "coords0":
        return P(None, "space")  # (b*t, h, w) with t=4 folded? keep h->space
    if name == "pyramid":
        return P("seq", "space")
    if name == "sim":
        return P(None, "seq")
    return P(None, "seq", "space")


in_sh = (
    jax.tree_util.tree_map(lambda _: rep, params),
    [NamedSharding(mesh, spec_for(None, "pyramid")) for _ in pyramid],
    NamedSharding(mesh, spec_for(None, "coords0")),
    NamedSharding(mesh, P(None, "seq", "space")),
    NamedSharding(mesh, P(None, "seq", "space")),
    NamedSharding(mesh, spec_for(None, "sim")),
    NamedSharding(mesh, P(None, "seq", "space")),
    NamedSharding(mesh, P(None, "seq", "space")),
    NamedSharding(mesh, P(None, "seq", "space")),
    NamedSharding(mesh, P(None, "seq", "space")),
)

with mesh:
    fn = jax.jit(f, in_shardings=in_sh)
    placed = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), (params, *args), in_sh,
        is_leaf=lambda x: isinstance(x, jnp.ndarray),
    )
    out = fn(*placed)
for kname in ref:
    err = float(np.abs(np.asarray(out[kname]) - np.asarray(ref[kname])).max())
    print(f"  {kname:10s} max|err| = {err:.3e}  "
          f"{'ok' if err < 1e-4 else 'MISCOMPILE'}")
