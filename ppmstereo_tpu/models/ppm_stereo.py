"""PPMStereo: pick-and-play memory video stereo, TPU-native.

Re-design of /root/reference/models/core/ppmstereo.py (PPMStereo). Same
computation graph — cascaded 1/16 -> 1/8 -> 1/4 RAFT-style refinement with
an SST attention block, a quality-assessed top-k frame memory ("pick") and
cross-frame attention aggregation ("play") — but structured for XLA:

  * all tensors are (B, T, H, W, C) channels-last; 2-D convs fold (B, T)
    into batch implicitly, 3-D convs see T — no layout shuffles;
  * the refinement loop is a lifted `nn.scan` (compiled once per stage,
    not unrolled 20x); heads/masks ride the carry so nothing per-iteration
    is stacked unless training collects it;
  * the pick is shape-static: `jax.lax.top_k` + gathers instead of
    argsort + masked_select (same selected set; the play attention is
    permutation-invariant over keys paired with their scores);
  * the play step batches target frames into fused flash-attention calls
    (the reference launches T separate flash-attn kernels per iteration,
    ppmstereo.py:517-552), chunking the frame axis when the gathered
    memory bank would not fit comfortably in HBM;
  * intermediate full-resolution upsampling only happens when training
    collects per-iteration predictions; inference upsamples once per
    stage (the reference pays it every iteration, ppmstereo.py:573-587).

Disparity sign conventions, stage-boundary negations and the uncertainty
path match the reference exactly (ppmstereo.py:601-810).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ppmstereo_tpu.kernels.play_attention import play_attention
from ppmstereo_tpu.nn.attention import temporal_positional_encoding
from ppmstereo_tpu.nn.convnext import ContextNet
from ppmstereo_tpu.nn.sst import SSTBlock
from ppmstereo_tpu.nn.encoder import BasicEncoder
from ppmstereo_tpu.nn.motion import AttentionQK
from ppmstereo_tpu.nn.update import SequenceUpdateBlock3D
from ppmstereo_tpu.ops.corr import build_corr_pyramid, corr_lookup
from ppmstereo_tpu.ops.geometry import (
    adaptive_max_pool2d,
    avg_pool2d,
    coords_grid_x,
    cosine_similarity_matrix,
    interp_ac_false,
    interp_bilinear,
)
from ppmstereo_tpu.ops.upsample import convex_upsample_2d, convex_upsample_3d

# Gathered-memory footprint (elements) above which the play step processes
# target frames in chunks instead of one batched gather+attention.
# 1.5e9 bf16 elements ~= 3 GB — fits v5e HBM with room for the rest of the
# window graph; chunking only engages for 720p 20-frame windows.
# Reference chunk budget: 1.5e9 gathered-bank elements (~3 GB bf16)
# empirically fits the 720p/k20 pick alongside the rest of the window's
# live set on a 16 GiB v5e. Other HBM sizes scale linearly from it via
# _play_chunk_budget() below.
_PLAY_CHUNK_BUDGET_16G = 1_500_000_000

# device-kind -> HBM GiB, for runtimes whose memory_stats() is None
# (e.g. the axon tunnel backend)
_DEVICE_HBM_GIB = {
    "v5 lite": 16, "v5e": 16, "v5litepod": 16,
    "v4": 32, "v3": 32, "v2": 16,
    "v5p": 95, "v5": 95,
    "v6 lite": 32, "v6e": 32, "trillium": 32,
}


def _play_chunk_budget() -> int:
    """Gathered-bank element budget for chunking the play pick, derived
    from the local device's HBM: PPM_CHUNK_BUDGET_ELEMS env override >
    memory_stats()['bytes_limit'] > device-kind table > 16 GiB default.
    Cached after first resolution (called during every trace)."""
    global _PLAY_CHUNK_BUDGET_CACHE
    if _PLAY_CHUNK_BUDGET_CACHE is not None:
        return _PLAY_CHUNK_BUDGET_CACHE
    import os

    budget = None
    env = os.environ.get("PPM_CHUNK_BUDGET_ELEMS")
    if env:
        budget = int(float(env))
    if budget is None:
        try:
            d = jax.devices()[0]
            stats = d.memory_stats()
            if stats and stats.get("bytes_limit"):
                gib = stats["bytes_limit"] / 2**30
            else:
                kind = getattr(d, "device_kind", "").lower()
                gib = next(
                    (v for pat, v in _DEVICE_HBM_GIB.items() if pat in kind),
                    16,
                )
            budget = int(_PLAY_CHUNK_BUDGET_16G * gib / 16)
        except Exception:
            budget = _PLAY_CHUNK_BUDGET_16G
    _PLAY_CHUNK_BUDGET_CACHE = budget
    return budget


_PLAY_CHUNK_BUDGET_CACHE: int | None = None


def _chunk_sizes(t: int, max_rows: int) -> list[int]:
    """Split t rows into the fewest chunks of at most max_rows, with
    sizes differing by at most 1 (so at most two compiled shapes and no
    near-empty straggler)."""
    n = -(-t // max_rows)
    base, extra = divmod(t, n)
    return [base + 1] * extra + [base] * (n - extra)


_AMBIENT_MESH_WARNED = False


def _ambient_mesh_axis(name: str) -> str | None:
    """The ambient (context-manager) mesh's axis `name`, or None when
    there is no mesh / no such axis / the axis has size 1. Lets model
    code emit sharding hints only when tracing under `with mesh:`."""
    # public path first: reflects jax.sharding.set_mesh/use_abstract_mesh
    # scopes (but NOT the legacy `with mesh:` manager as of jax 0.9)
    try:
        m = jax.sharding.get_abstract_mesh()
        if not m.empty and name in m.axis_names:
            return name if m.shape[name] > 1 else None
    except Exception:
        pass
    try:
        from jax._src.mesh import thread_resources

        m = thread_resources.env.physical_mesh
        if m.empty or name not in m.axis_names or m.shape[name] == 1:
            return None
        return name
    except Exception:
        # A JAX upgrade moving the private thread_resources would
        # silently disable the bank-replication hint and reintroduce
        # ~15x per-iteration ICI traffic (comm_model.py) — warn LOUDLY
        # once instead of failing silently.
        global _AMBIENT_MESH_WARNED
        if not _AMBIENT_MESH_WARNED:
            _AMBIENT_MESH_WARNED = True
            import warnings

            warnings.warn(
                "ppmstereo_tpu: jax._src.mesh.thread_resources is gone in "
                "this JAX version — the memory-bank replication sharding "
                "hint is DISABLED under `with mesh:` scopes (expect ~15x "
                "per-iteration ICI traffic on seq-sharded windows). Use "
                "jax.sharding.set_mesh(...) scopes instead, or update "
                "_ambient_mesh_axis.",
                RuntimeWarning,
                stacklevel=2,
            )
        return None


def _ambient_mesh():
    """The ambient physical Mesh (from `with mesh:` / set_mesh scopes),
    or None. Companion to _ambient_mesh_axis for code that needs the
    Mesh object itself (shard_map)."""
    try:
        m = jax.sharding.get_mesh()
        if m is not None and not m.empty:
            return m
    except Exception:
        pass
    try:
        from jax._src.mesh import thread_resources

        m = thread_resources.env.physical_mesh
        return None if m.empty else m
    except Exception:
        return None


def _tiny_row_shards(h: int) -> bool:
    """Whether sharding `h` rows over the ambient `space` axis would
    produce local shards <= the largest chained-conv halo — the residual
    Shardy danger region (round 4 bisection: chained convs in a scan
    body miscompile when a space shard of the coarsest feature map is
    not larger than one conv's halo; parallel/mesh.py docstring has the
    history). Stages inside the region replicate their rows instead
    (see PPMUpdateLoop.__call__) so the DEFAULT Shardy partitioner is
    exact at every shape and no GSPMD fallback exists (round 5)."""
    import os

    if os.environ.get("PPM_TINY_SHARD_MITIGATION", "1") != "1":
        return False
    if _ambient_mesh_axis("space") is None:
        return False
    m = _ambient_mesh()
    n = m.shape.get("space", 1) if m is not None else 1
    from ppmstereo_tpu.parallel.mesh import _MAX_CHAINED_H_HALO

    return n > 1 and h // n <= _MAX_CHAINED_H_HALO


def _pin_rows_replicated(x, h_axis: int):
    """with_sharding_constraint pinning the spatial axes (`h_axis` and
    the W axis right after it) replicated, every other axis left
    unconstrained. Used by the tiny-row-shard Shardy mitigation
    (_tiny_row_shards): W must be pinned along with H — with H
    replicated and W free, Shardy re-shards W over the idle `space`
    devices and the chained 1x15 GRU convs (W halo 7) hit the same
    tiny-shard miscompile on the other axis."""
    from jax.sharding import PartitionSpec

    U = PartitionSpec.UNCONSTRAINED
    spec = PartitionSpec(
        *[None if i in (h_axis, h_axis + 1) else U for i in range(x.ndim)]
    )
    return jax.lax.with_sharding_constraint(x, spec)


def _replicate_bank_over_seq(x, replicate_rows: bool = False):
    """Memory-bank sharding hint for a (B, T, H, W, C) K/V bank under a
    seq(+space)-sharded window: replicate the frame axis T (ONE bf16
    all-gather of the bank over the `seq` ICI ring) while rows stay
    sharded over `space`.

    Without the hint, XLA partitions the pick's one-hot selection einsum
    (contraction over T) by all-reducing the full (b, t, k, h, w, c)
    selected output in the dot's f32 accumulator — 6.1 GB/iteration at
    the 720p/k20 protocol vs ~0.4 GB/iteration for the bank gather
    (measured: artifacts/comm_model.py, BENCH_NOTES "Sharded-window
    scaling model"). This is SURVEY.md §2.10 item 2 — "all-gather of
    picked memory keys/values over ICI" — realized as a gather of the
    compact per-frame bank instead of the k-times-larger picked
    expansion. No-op (and numerically exact either way — the selection
    has one nonzero term per output) outside a seq-sharded mesh."""
    from jax.sharding import PartitionSpec

    seq = _ambient_mesh_axis("seq")
    if seq is None:
        return x
    space = _ambient_mesh_axis("space")
    U = PartitionSpec.UNCONSTRAINED
    # replicate_rows: the caller's stage is inside the tiny-row-shard
    # Shardy danger region (_tiny_row_shards) — pin H replicated too so
    # the bank never re-shards rows onto shards <= the conv halo
    row_spec = None if replicate_rows else (space if space else U)
    spec = PartitionSpec(U, None, row_spec, U, U)
    return jax.lax.with_sharding_constraint(x, spec)


@dataclass(frozen=True)
class PPMStereoConfig:
    """Shipped configuration of the reference
    (train.py:425-447 defaults; models/ppm_stereo_model.py:27-33)."""

    hidden_dim: int = 128
    context_dim: int = 128
    dim: int = 256
    num_frames: int = 5
    attention_type: str = "self_stereo_temporal_update_time_update_space"
    sst_depth: int = 4
    use_cnet: bool = True
    use_convex_3d: bool = True
    different_update_blocks: bool = True
    top_k: int = 5
    corr_levels: int = 4
    corr_radius: int = 4
    mixed_precision: bool = True
    force_xla_attention: bool = False
    # PPMStereo_VDA variant (reference ppmstereo_VDA.py): features from a
    # MultiLevelEncoder fused with frozen VideoDepthAnything maps
    use_vfm: bool = False
    vfm_encoder: str = "vits"
    # rematerialize each scanned refinement iteration on the backward pass
    # (activation memory: O(1) iterations instead of O(iters) — the
    # jax.checkpoint analog of the reference's 48GB-GPU requirement)
    remat: bool = True
    # Under a space-sharded mesh, run the play attention as a RING over
    # the `space` axis (parallel/ring_attention.py): the picked K/V stay
    # sharded and the query blocks circulate with online-softmax state —
    # ~2x fewer ICI bytes than all-gathering the k-times-larger picked
    # K/V, and the hops overlap with block compute. Same softmax up to
    # f32 merge reassociation (tests/test_ring_attention.py). No-op
    # without an ambient space>1 mesh; falls back to the gather path
    # when the window batch is data-sharded or shapes don't divide the
    # mesh. DEFAULT ON since round 5 (VERDICT r4 item 5): exactness is
    # pinned under the default Shardy partitioner, the Pallas carry
    # kernel runs at 1.05x batch-kernel throughput on real TPU at
    # production ring shapes (BENCH_NOTES "Ring play attention"), and
    # the comm model projects -52% ICI bytes/iter vs the gather.
    # ENGAGES ONLY WITH unroll_refinement_loop=True: the full model
    # with shard_map inside its scanned loop miscompiles under Shardy
    # (round-5 bisection, see _play and
    # artifacts/shardy_shardmap_scan_repro.py); the unrolled loop is
    # numerically identical and ring-exact, costing compile time only.
    # Set False to force the all-gather path everywhere.
    ring_attention: bool = True
    # Unroll the refinement loop as a Python loop instead of nn.scan.
    # Parameters and numerics are identical; compile time grows with
    # `iters`. Exists because the Shardy partitioner (JAX 0.9 default)
    # miscompiles lax.scan bodies whose operands are sharded on two mesh
    # axes at once (O(1)-wrong values; minimal upstream repro in
    # artifacts/shardy_repro.py) — the unrolled model is exact under
    # Shardy (tests/test_sharding.py::test_seq_space_sharded_unrolled_
    # forward_exact_under_shardy). Default False: single-axis meshes are
    # Shardy-exact with the scan, and multi-axis meshes pin the classic
    # GSPMD partitioner (parallel/mesh.py) which compiles the scan
    # correctly.
    unroll_refinement_loop: bool = False

    @property
    def dtype(self):
        return jnp.bfloat16 if self.mixed_precision else jnp.float32


def _resize_video(x: jax.Array, hw: tuple[int, int]) -> jax.Array:
    """align_corners=True bilinear on (B, T, H, W, C)."""
    return interp_bilinear(x, hw)


def _interp_ac_false(x: jax.Array, scale: int) -> jax.Array:
    """torch F.interpolate(mode='bilinear', align_corners=False) upsample by
    an integer factor on (..., H, W, C) — the uncertainty-map resize
    (ppmstereo.py:578)."""
    h, w = x.shape[-3], x.shape[-2]
    return interp_ac_false(x, (h * scale, w * scale))


def _upsample_flow(cfg: PPMStereoConfig, flow, mask):
    """Stage-final convex upsample (rate 4)."""
    if cfg.use_convex_3d:
        return convex_upsample_3d(flow, mask, rate=4)
    b, t, h, w, _ = flow.shape
    up = convex_upsample_2d(
        flow.reshape(b * t, h, w, 2), mask.reshape(b * t, h, w, -1), rate=4
    )
    return up.reshape(b, t, 4 * h, 4 * w, 2)


class PPMUpdateLoop(nn.Module):
    """One cascade stage: `iters` scanned pick-and-play iterations
    (reference forward_update_block, ppmstereo.py:426-594)."""

    cfg: PPMStereoConfig
    iters: int
    interp_scale: int
    collect_preds: bool
    attention_type: str | None = None

    def setup(self):
        self.update_block = SequenceUpdateBlock3D(
            hidden_dim=self.cfg.hidden_dim,
            cor_planes=self.cfg.corr_levels * (2 * self.cfg.corr_radius + 1),
            mask_size=4,
            use_convex_3d=self.cfg.use_convex_3d,
            attention_type=self.attention_type,
            dtype=self.cfg.dtype,
        )

    def init_motion_hidden_state(self, inp):
        return self.update_block.init_motion_hidden_state(inp)

    def _play(self, query_pe, key_aug, value, idx, score_norm):
        """Gather the picked memory frames and attend.

        query_pe: (B,T,H,W,C); key_aug: (B,T,H,W,2C); value: (B,T,H,W,C);
        idx: (b,t,k) picked frame indices per target row; score_norm:
        (b,t,k). Returns (B,T,H,W,C).
        """
        cfg = self.cfg
        b, t, h, w, c = query_pe.shape
        k = min(cfg.top_k, t)  # clips shorter than top_k pick every frame
        scale = c**-0.5 * math.log(2 * c, 12000)
        # ring-attention engagement, decided once for both the chunking
        # bypass and the attention dispatch below. Falls back to the
        # gather path (always exact) when:
        #   * the refinement loop is SCANNED (round-5 finding: the full
        #     model with shard_map inside its nn.scan returns O(1e-1)-
        #     wrong values under the default Shardy partitioner, while
        #     the identical unrolled model is exact to 1e-6 and the
        #     isolated scanned loop is too — the trigger needs the full
        #     cascade; boundary documented in
        #     artifacts/shardy_shardmap_scan_repro.py. The unrolled
        #     loop is numerically identical to the scan, so ring users
        #     set cfg.unroll_refinement_loop=True and pay compile time
        #     only);
        #   * the window batch is data-sharded (shard_map would need a
        #     data spec; windows batch rarely with space sharding);
        #   * this stage's H does not divide `space` (e.g. 720p 1/16:
        #     H=46 at space=4) or T does not divide `seq` (odd tail
        #     windows) — shard_map requires even shards.
        ring_mesh = None
        if (
            cfg.ring_attention
            and cfg.unroll_refinement_loop
            and _ambient_mesh_axis("space")
        ):
            ring_mesh = _ambient_mesh()
            if ring_mesh is not None:
                n_space = ring_mesh.shape.get("space", 1)
                n_seq = ring_mesh.shape.get("seq", 1)
                if (
                    (ring_mesh.shape.get("data", 1) > 1 and b > 1)
                    or h % n_space != 0
                    or t % n_seq != 0
                ):
                    ring_mesh = None
        # under a seq-sharded mesh: gather the compact per-frame bank
        # once (value each iteration; key_aug is hinted loop-invariantly
        # in __call__) so the pick below is local compute
        value = _replicate_bank_over_seq(
            value, replicate_rows=_tiny_row_shards(h)
        )

        def rows(q_r, idx_r, sc_r):
            # q_r: (B,R,H,W,C); idx_r: (b,R,k); sc_r: (b,R,k)
            r = q_r.shape[1]
            # gather picked frames via a one-hot contraction over the tiny
            # frame axis — an MXU matmul instead of a TPU-hostile gather
            onehot = jax.nn.one_hot(idx_r, t, dtype=key_aug.dtype)  # (b,r,k,t)

            def gather(x):
                # one-hot selection: exactly ONE nonzero term per output,
                # so operand-dtype accumulation is EXACT. The bank
                # operand is hinted t-replicated under a seq-sharded mesh
                # (_replicate_bank_over_seq), making this contraction
                # local compute; preferred_element_type=x.dtype removes
                # the f32 accumulator+convert pair so the attention's
                # required kv all-gather over `space` moves bf16, not f32
                # (halves the dominant per-iteration ICI bytes —
                # artifacts/comm_model.py).
                return jnp.einsum(
                    "brkt,bthwc->brkhwc", onehot, x,
                    preferred_element_type=x.dtype,
                )

            sel_key = gather(key_aug)
            sel_val = gather(value)
            modw = sc_r[:, :, :, None, None, None].astype(sel_key.dtype)
            sel_key = sel_key[..., :c] * modw + sel_key[..., c:]

            if ring_mesh is not None:
                from ppmstereo_tpu.parallel.ring_attention import (
                    ring_play_attention,
                )

                return ring_play_attention(
                    q_r.astype(jnp.bfloat16),
                    sel_key.astype(jnp.bfloat16),
                    sel_val.astype(jnp.bfloat16),
                    scale, ring_mesh,
                )

            q_tok = q_r.reshape(b * r, h * w, c).astype(jnp.bfloat16)
            k_tok = sel_key.reshape(b * r, k * h * w, c).astype(jnp.bfloat16)
            v_tok = sel_val.reshape(b * r, k * h * w, c).astype(jnp.bfloat16)
            out = play_attention(
                q_tok, k_tok, v_tok, scale, force_xla=cfg.force_xla_attention
            )
            return out.reshape(b, r, h, w, c)

        chunk_budget = _play_chunk_budget()
        bank_elems = b * t * k * h * w * 2 * c
        # ring mode: the gathered bank stays sharded over space (and r
        # over seq) — per-device memory is already 1/n of bank_elems, and
        # r-chunking would break the seq-axis divisibility shard_map
        # needs, so the ring path always runs unchunked
        if bank_elems <= chunk_budget or ring_mesh is not None:
            return rows(query_pe, idx, score_norm).astype(cfg.dtype)

        # chunk the target-frame axis to bound the gathered bank size;
        # balanced sizes (20 rows at budget 19 -> 10+10, not 19+1; 7 at
        # budget 3 -> 3+2+2): a near-empty straggler would compile an
        # extra grid shape and run a mostly-padded kernel
        rows_per = max(1, chunk_budget // max(b * k * h * w * 2 * c, 1))
        outs = []
        s = 0
        for size in _chunk_sizes(t, rows_per):
            e = s + size
            outs.append(rows(query_pe[:, s:e], idx[:, s:e], score_norm[:, s:e]))
            s = e
        return jnp.concatenate(outs, axis=1).astype(cfg.dtype)

    def __call__(
        self, pyramid, coords0, query_pe, key_aug, sim_score,
        flow, net, inp, motion_hidden,
    ):
        cfg = self.cfg
        b, t, h, w, _ = flow.shape

        # Residual-Shardy-bug mitigation (round 5, VERDICT r4 item 6):
        # when this stage's rows sharded over `space` would give local
        # shards <= the largest chained-conv halo, constrain every row-
        # carrying input to ROW-REPLICATED for the stage. Shardy then
        # partitions the scanned body on the seq axis only — exact at
        # every shape (the miscompile needs 2-axis sharding with tiny H
        # shards) — and the old classic-GSPMD pin in make_mesh is gone.
        # Cost: one row all-gather at stage entry, negligible at the
        # coarse shapes the region contains (e.g. 4 rows x W/16);
        # adequate shapes (720p: 46 rows at 1/16) are unaffected.
        rows_replicated = _tiny_row_shards(h)
        if rows_replicated:
            pyramid = [_pin_rows_replicated(p, 1) for p in pyramid]
            coords0 = _pin_rows_replicated(coords0, 1)
            query_pe = _pin_rows_replicated(query_pe, 2)
            flow = _pin_rows_replicated(flow, 2)
            net = _pin_rows_replicated(net, 2)
            inp = _pin_rows_replicated(inp, 2)
            motion_hidden = _pin_rows_replicated(motion_hidden, 2)

        # loop-invariant: replicate the key bank over `seq` once, outside
        # the scan (see _replicate_bank_over_seq)
        key_aug = _replicate_bank_over_seq(
            key_aug, replicate_rows=rows_replicated
        )

        mask_ch = (27 if cfg.use_convex_3d else 9) * 16
        mask0 = jnp.zeros((b, t, h, w, mask_ch), cfg.dtype)
        unc0 = jnp.zeros((b, t, h, w, 1), cfg.dtype)
        strive = jnp.ones((b, t, t), jnp.float32)

        def step(module, carry, _):
            if self.collect_preds:
                flow, net, motion_hidden, strive, _, _ = carry
            else:
                flow, net, motion_hidden, strive, _ = carry
            if rows_replicated:
                # re-pin the carry each iteration: without this, Shardy
                # propagates shardings from the (unconstrained) loop
                # outputs back into the scan carry, re-introducing the
                # 2-axis-sharded tiny-row-shard body the mitigation
                # exists to avoid
                flow = _pin_rows_replicated(flow, 2)
                net = _pin_rows_replicated(net, 2)
                motion_hidden = _pin_rows_replicated(motion_hidden, 2)

            # 1. pyramid lookup around current disparity (f32)
            coords_x = coords0 + flow[..., 0].reshape(b * t, h, w)
            corrs = corr_lookup(pyramid, coords_x, cfg.corr_radius)
            corrs = corrs.reshape(b, t, h, w, -1).astype(cfg.dtype)

            # 2. motion features + recurrent state + value
            motion, motion_hidden, value = module.update_block.get_motion_and_value(
                flow.astype(cfg.dtype), corrs, motion_hidden
            )

            # 3. quality scores (QAM)
            uncertainty = module.update_block.get_uncertainty(
                jnp.concatenate([net, value], axis=-1)
            )
            unc32 = uncertainty.astype(jnp.float32)
            penalty = jnp.exp(-strive / (jnp.sum(strive, -1, keepdims=True) + t))
            frame_conf = jnp.mean(unc32, axis=(2, 3, 4))  # (b, t) per candidate
            frame_score = penalty * sim_score + frame_conf[:, None, :]

            # 4. pick top-k frames per target row, bump usage counters
            sel_score, idx = jax.lax.top_k(frame_score, min(cfg.top_k, t))
            picked = jnp.sum(jax.nn.one_hot(idx, t, dtype=strive.dtype), axis=-2)
            strive = strive + picked
            # normalize by the mean over (batch, k) per target row
            # (the reference's scalar .mean() over its (b,1,k) slice,
            # ppmstereo.py:533)
            score_norm = sel_score / jnp.mean(sel_score, axis=(0, 2), keepdims=True)

            # 5. play: attend over the picked memory
            hidden_states = module._play(query_pe, key_aug, value, idx, score_norm)
            beta = module.update_block.aggregator.beta.astype(cfg.dtype)
            motion_global = motion + beta * hidden_states

            # 6. GRU update + heads. Inference consumes only the final
            # mask (post-scan, from the final net) — skip the 432-ch
            # mask head inside the scan there.
            net, mask, delta = module.update_block(
                net, inp, motion, motion_global, compute_mask=self.collect_preds
            )
            flow = flow + delta.astype(jnp.float32)

            if not self.collect_preds:
                return (flow, net, motion_hidden, strive, uncertainty), None
            carry = (flow, net, motion_hidden, strive, mask, uncertainty)

            flow_up = _upsample_flow(cfg, flow, mask)
            unc_up = _interp_ac_false(unc32, 4 * self.interp_scale)
            if self.interp_scale > 1:
                oh = self.interp_scale * flow_up.shape[2]
                ow = self.interp_scale * flow_up.shape[3]
                flow_up = self.interp_scale * _resize_video(flow_up, (oh, ow))
            return carry, (flow_up[..., :1], unc_up)

        body = step
        if cfg.remat and self.collect_preds:
            # only training needs the backward pass; prevent_cse is safe
            # inside scan
            body = nn.remat(step, prevent_cse=False)
        if cfg.unroll_refinement_loop:
            # Shardy-safe unrolled loop: numerically identical to the
            # scan (same body, same params), no lax.scan primitive
            def scan(module, init, _):
                carry, ys = init, []
                for _ in range(self.iters):
                    carry, y = body(module, carry, None)
                    ys.append(y)
                if ys and ys[0] is not None:
                    ys = jax.tree_util.tree_map(lambda *a: jnp.stack(a), *ys)
                else:
                    ys = None
                return carry, ys
        else:
            scan = nn.scan(
                body,
                variable_broadcast="params",
                split_rngs={"params": False},
                length=self.iters,
            )
        if self.collect_preds:
            init = (flow, net, motion_hidden, strive, mask0, unc0)
            carry, ys = scan(self, init, None)
            flow, net, motion_hidden, _, mask_last, unc_last = carry
        else:
            init = (flow, net, motion_hidden, strive, unc0)
            carry, ys = scan(self, init, None)
            flow, net, motion_hidden, _, unc_last = carry
            # identical to the last in-scan mask: it is a pure function
            # of the final GRU state
            mask_last = self.update_block.get_mask(net)

        flow_out = _upsample_flow(cfg, flow, mask_last)
        preds, uncs = ys if self.collect_preds else (None, None)
        return flow, flow_out, net, motion_hidden, preds, uncs, unc_last


class PPMStereo(nn.Module):
    """Full forward graph over (B, T, H, W, 3) [0,255] stereo clips.

    `iters` and `test_mode` are Python-static (two compiled graphs:
    train collects per-iteration predictions, eval does not).
    """

    cfg: PPMStereoConfig = PPMStereoConfig()
    iters: int = 10
    test_mode: bool = False

    def setup(self):
        cfg = self.cfg
        if not cfg.different_update_blocks:
            raise NotImplementedError(
                "shared update blocks across scales are not supported; the "
                "shipped reference config uses different_update_blocks=True"
            )
        if cfg.use_vfm:
            from ppmstereo_tpu.nn.encoder import MultiLevelEncoderVFM
            from ppmstereo_tpu.nn.vda.video_depth import VideoDepthAnything

            self.fnet = MultiLevelEncoderVFM(
                output_dim=cfg.dim, norm_fn="instance", dtype=cfg.dtype
            )
            self.backbone = VideoDepthAnything(
                encoder=cfg.vfm_encoder, dtype=cfg.dtype
            )
        else:
            self.fnet = BasicEncoder(output_dim=cfg.dim, norm_fn="instance", dtype=cfg.dtype)
        if cfg.use_cnet:
            self.cnet = ContextNet("tiny", output_dim=cfg.dim, dtype=cfg.dtype)
        self.att = [
            AttentionQK(dim_head=cfg.context_dim, dtype=cfg.dtype) for _ in range(3)
        ]
        self.sst = SSTBlock(
            dim=cfg.dim, depth=cfg.sst_depth, num_frames=cfg.num_frames,
            attention_type=cfg.attention_type, dtype=cfg.dtype,
        )

        collect = not self.test_mode
        self.loop16 = PPMUpdateLoop(
            cfg=cfg, iters=max(self.iters // 2, 1), interp_scale=4,
            collect_preds=collect,
            attention_type=cfg.attention_type, name="update_block16",
        )
        self.loop08 = PPMUpdateLoop(
            cfg=cfg, iters=max(self.iters // 2, 1), interp_scale=2,
            collect_preds=collect, name="update_block08",
        )
        self.loop04 = PPMUpdateLoop(
            cfg=cfg, iters=self.iters, interp_scale=1,
            collect_preds=collect, name="update_block04",
        )

    # ------------------------------------------------------------- QAM sim
    def compute_qk_similarity(self, query, key):
        """Cosine similarity of pooled per-frame descriptors
        (reference ppmstereo.py:397-423): (B,T,H,W,C) -> (b,t,t)."""
        b, t, h, w, _ = query.shape
        oh, ow = max(h // 4, 1), max(w // 4, 1)
        qp = adaptive_max_pool2d(query.astype(jnp.float32), (oh, ow))
        kp = adaptive_max_pool2d(key.astype(jnp.float32), (oh, ow))
        qv = jnp.mean(qp, axis=-1).reshape(b, t, oh * ow)
        kv = jnp.mean(kp, axis=-1).reshape(b, t, oh * ow)
        return cosine_similarity_matrix(qv, kv)

    def _vfm_features(self, raw1, raw2, images_norm):
        """PPMStereo_VDA feature path (reference ppmstereo_VDA.py:617-623):
        frozen VideoDepthAnything fusion pyramid + MultiLevelEncoderVFM.
        Returns (fmap1, fmap2, {"f16": (f1,f2), "f8": (f1,f2)})."""
        from ppmstereo_tpu.nn.vda.video_depth import (
            imagenet_normalize,
            interp_ac_false_to,
        )

        b, t, h, w, _ = raw1.shape
        both_raw = jnp.concatenate([raw1, raw2], axis=0)
        nh, nw = (h // 14) * 14, (w // 14) * 14
        vda_in = interp_ac_false_to(
            imagenet_normalize(both_raw).astype(self.cfg.dtype), (nh, nw)
        )
        paths = self.backbone.fusion_features(vda_in, t)
        paths = tuple(jax.lax.stop_gradient(p) for p in paths)
        # resize the fusion pyramid to exact 1/4 .. 1/32 grids
        sizes = [(h // s, w // s) for s in (4, 8, 16, 32)]
        vfm = [
            interp_ac_false_to(p.reshape(2 * b * t, *p.shape[2:]), sz)
            for p, sz in zip(paths, sizes)
        ]
        frames = images_norm.reshape(2 * b * t, h, w, 3)
        f4, f8, f16 = self.fnet(frames, vfm)

        def split_tb(x):
            x = x.reshape(2 * b, t, *x.shape[1:])
            return x[:b], x[b:]

        fmap1, fmap2 = split_tb(f4)
        f1_8, f2_8 = split_tb(f8)
        f1_16, f2_16 = split_tb(f16)
        return fmap1, fmap2, {"f16": (f1_16, f2_16), "f8": (f1_8, f2_8)}

    def _stage_inputs(self, stage, fmap1, fmap2, inp):
        """Correlation pyramid + q/k (+ temporal PE augmentation)."""
        cfg = self.cfg
        b, t, h, w, _ = fmap1.shape
        c = cfg.context_dim

        pyramid = build_corr_pyramid(
            fmap1.reshape(b * t, h, w, -1),
            fmap2.reshape(b * t, h, w, -1),
            cfg.corr_levels,
        )
        coords0 = coords_grid_x(b * t, h, w)

        query, key = self.att[stage](inp)
        sim_score = self.compute_qk_similarity(query, key)

        te = jnp.asarray(
            temporal_positional_encoding(t, c, normalize=True, scale=1.0),
            dtype=cfg.dtype,
        )
        te_b = te[None, :, None, None, :]
        key_aug = jnp.concatenate([key, jnp.broadcast_to(te_b, key.shape)], axis=-1)
        query_pe = query + te_b
        return pyramid, coords0, query_pe, key_aug, sim_score

    def encode_frames(self, image1, image2):
        """Per-frame feature extraction (fnet + cnet), split out so the
        sliding-window driver can CACHE features for frames shared by
        overlapping windows: the encoders are strictly per-frame (2-D
        convs + instance/layer norms over the folded (B, T) batch), so a
        frame's features are identical in whichever window it appears —
        recomputing them per window (as the reference does,
        ppmstereo.py:601-624) wastes ~overlap/kernel of the encoder
        FLOPs. Returns the dict consumed by __call__(feats=...). Not
        supported for use_vfm (the VDA pyramid stays single-graph)."""
        cfg = self.cfg
        if cfg.use_vfm:
            raise ValueError("encode_frames does not support use_vfm")
        b = image1.shape[0]
        image1 = (2.0 * (image1 / 255.0) - 1.0).astype(cfg.dtype)
        image2 = (2.0 * (image2 / 255.0) - 1.0).astype(cfg.dtype)
        both = jnp.concatenate([image1, image2], axis=0)
        fmaps = self.fnet(both)
        feats = {"fmap1": fmaps[:b], "fmap2": fmaps[b:]}
        if cfg.use_cnet:
            cnet4, cnet8, cnet16 = self.cnet(image1)
            feats.update(cnet4=cnet4, cnet8=cnet8, cnet16=cnet16)
        return feats

    # --------------------------------------------------------------- forward
    def __call__(self, image1, image2, flow_init=None, feats=None):
        """image1/image2: (B, T, H, W, 3) in [0, 255].

        feats: optional precomputed per-frame features from
        encode_frames (possibly concatenated across windows by the
        encoder-caching sliding-window driver); when given, fnet/cnet are
        skipped and the forward is otherwise identical.

        flow_init: optional (B, T, H, W, 1) full-resolution SIGNED x-flow
        (negative disparity) warm start. When given, the 1/16 and 1/8
        stages AND the SST block are skipped and only the 1/4 loop runs —
        the coherent version of the reference's flow_init contract (its
        own branch dead-ends on undefined state, ppmstereo.py:690-766;
        DynamicStereo's working branch has the same skip-to-1/4 shape,
        dynamic_stereo.py:406-408). Used by warm-start sliding-window
        inference; zero-init remains the strict-parity default.

        test_mode=True  -> (disparity (B,T,H,W,1), uncertainty (B,T,H,W,1))
        test_mode=False -> (predictions (n_total_iters, B, T, H, W, 1),
                            uncertainties (n_total_iters, B, T, H, W, 1))
        """
        cfg = self.cfg
        dtype = cfg.dtype
        b = image1.shape[0]

        cnet4 = cnet8 = cnet16 = None
        if feats is not None:
            if cfg.use_vfm:
                raise ValueError("feats= does not support use_vfm")
            fmap1, fmap2 = feats["fmap1"], feats["fmap2"]
            if cfg.use_cnet:
                cnet4, cnet8, cnet16 = (
                    feats["cnet4"], feats["cnet8"], feats["cnet16"]
                )
            vfm16 = None
        else:
            raw1, raw2 = image1, image2
            image1 = (2.0 * (image1 / 255.0) - 1.0).astype(dtype)
            image2 = (2.0 * (image2 / 255.0) - 1.0).astype(dtype)

            both = jnp.concatenate([image1, image2], axis=0)
            if cfg.use_vfm:
                fmap1, fmap2, vfm16 = self._vfm_features(raw1, raw2, both)
            else:
                fmaps = self.fnet(both)
                fmap1, fmap2 = fmaps[:b], fmaps[b:]
                vfm16 = None
            if cfg.use_cnet:
                cnet4, cnet8, cnet16 = self.cnet(image1)

        hdim = cfg.hidden_dim
        net = fmap1[..., :hdim]
        inp = fmap1[..., hdim:]
        if cfg.use_cnet:
            net = (net + cnet4[..., :hdim]) / 2.0
            inp = (inp + cnet4[..., hdim:]) / 2.0
        net = jnp.tanh(net)
        inp = nn.relu(inp)

        t = fmap1.shape[1]
        h4, w4 = fmap1.shape[2], fmap1.shape[3]

        if flow_init is not None:
            # warm start: resize the full-res x-flow to the 1/4 grid and
            # run only the final stage with the full iteration budget
            fi = jnp.concatenate(
                [flow_init.astype(jnp.float32), jnp.zeros_like(flow_init)], axis=-1
            )
            flow4 = (h4 / fi.shape[2]) * _resize_video(fi, (h4, w4))
            # only the 1/16 block owns init_conv weights (the later stages
            # inherit the hidden state in the cold cascade) — bootstrap
            # from it at the 1/4 grid
            mh4 = self.loop16.init_motion_hidden_state(inp)
            stage_in = self._stage_inputs(2, fmap1, fmap2, inp)
            _, flow_out4, net, mh4, p, u, unc_last = self.loop04(
                *stage_in, flow4, net, inp, mh4
            )
            if self.test_mode:
                disparity = flow_out4[..., :1]
                uncertainty = _interp_ac_false(unc_last.astype(jnp.float32), 4)
                return disparity, uncertainty
            return p, u

        if cfg.use_vfm:
            f1_16, f2_16 = vfm16["f16"]
            f1_8, f2_8 = vfm16["f8"]
        else:
            f1_16 = avg_pool2d(fmap1, 4, 4)
            f2_16 = avg_pool2d(fmap2, 4, 4)
        f1_16, f2_16 = self.sst(f1_16, f2_16)

        net16 = f1_16[..., :hdim]
        inp16 = f1_16[..., hdim:]
        if cfg.use_cnet:
            net16 = (net16 + cnet16[..., :hdim]) / 2.0
            inp16 = (inp16 + cnet16[..., hdim:]) / 2.0
        net16 = jnp.tanh(net16)
        inp16 = nn.relu(inp16)

        if not cfg.use_vfm:
            f1_8 = (avg_pool2d(fmap1, 2, 2) + _resize_video(f1_16, (h4 // 2, w4 // 2))) / 2.0
            f2_8 = (avg_pool2d(fmap2, 2, 2) + _resize_video(f2_16, (h4 // 2, w4 // 2))) / 2.0

        net8 = f1_8[..., :hdim]
        inp8 = f1_8[..., hdim:]
        if cfg.use_cnet:
            net8 = (net8 + cnet8[..., :hdim]) / 2.0
            inp8 = (inp8 + cnet8[..., hdim:]) / 2.0
        net8 = jnp.tanh(net8)
        inp8 = nn.relu(inp8)

        all_preds, all_uncs = [], []

        # ---- stage 1/16
        flow16 = jnp.zeros((b, t, h4 // 4, w4 // 4, 2), jnp.float32)
        mh16 = self.loop16.init_motion_hidden_state(inp16)
        stage_in = self._stage_inputs(0, f1_16, f2_16, inp16)
        _, flow_out16, net16, mh16, p, u, _ = self.loop16(
            *stage_in, flow16, net16, inp16, mh16
        )
        if p is not None:
            all_preds.append(p)
            all_uncs.append(u)

        # ---- stage 1/8
        h8, w8 = h4 // 2, w4 // 2
        flow8 = -(h8 / flow_out16.shape[2]) * _resize_video(flow_out16, (h8, w8))
        mh8 = _resize_video(mh16, (h8, w8))
        net8 = (net8 + _resize_video(net16, (h8, w8))) / 2.0
        stage_in = self._stage_inputs(1, f1_8, f2_8, inp8)
        _, flow_out8, net8, mh8, p, u, _ = self.loop08(
            *stage_in, flow8, net8, inp8, mh8
        )
        if p is not None:
            all_preds.append(p)
            all_uncs.append(u)

        # ---- stage 1/4
        flow4 = -(h4 / flow_out8.shape[2]) * _resize_video(flow_out8, (h4, w4))
        mh4 = _resize_video(mh8, (h4, w4))
        net = (net + _resize_video(net8, (h4, w4))) / 2.0
        stage_in = self._stage_inputs(2, fmap1, fmap2, inp)
        _, flow_out4, net, mh4, p, u, unc_last = self.loop04(
            *stage_in, flow4, net, inp, mh4
        )
        if p is not None:
            all_preds.append(p)
            all_uncs.append(u)

        if self.test_mode:
            disparity = flow_out4[..., :1]
            uncertainty = _interp_ac_false(unc_last.astype(jnp.float32), 4)
            return disparity, uncertainty

        predictions = jnp.concatenate(all_preds, axis=0)
        uncertainties = jnp.concatenate(all_uncs, axis=0)
        return predictions, uncertainties
