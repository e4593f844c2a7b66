"""Device mesh construction for the video-stereo workload.

The reference's only parallelism is NCCL data-parallel DDP
(/root/reference/train.py:493-500). Here parallelism is mesh-based
(SPMD via jit + shardings; XLA inserts the collectives):

  axes:
    data   — batch (clips) data parallelism; gradient psum over ICI/DCN.
    seq    — the frame (T) axis of a clip and its PPM memory bank.
             The play attention's picked-memory gathers become
             all-gathers of tiny K/V blocks over ICI (SURVEY.md §2.10).
    space  — H rows of the feature maps for >720p inputs. The 1-D
             epipolar correlation is row-independent (corr volume never
             mixes rows), so this axis is collective-free on the cost
             volume; convs need halo exchanges, which XLA emits.

Any axis of size 1 is legal; `make_mesh(data=N)` is plain DP.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np
from jax.sharding import Mesh


@dataclass(frozen=True)
class MeshSpec:
    data: int = 1
    seq: int = 1
    space: int = 1

    @property
    def size(self) -> int:
        return self.data * self.seq * self.space


# Largest chained-conv halo at the coarsest (1/16) refinement stage: the
# motion encoder's 7x7 conv (nn/motion.py convf1). The empirical Shardy
# danger region is local H shards <= this (see shardy_safe_shapes).
_MAX_CHAINED_H_HALO = 3


def shardy_safe_shapes(
    spec: "MeshSpec", image_hw: tuple[int, int] | None = None
) -> bool:
    """Whether the default Shardy partitioner is exact for this mesh and
    input shape — the empirically-mapped safe region (round 4).

    History: round 3 found Shardy miscompiling the scanned refinement
    loop under 2-axis sharding (O(1)-wrong values). Round-4 bisection
    (artifacts/shardy_probe_r4.py, shardy_bisect_loop_r4.py) narrowed it
    to TWO independent triggers:

      1. implicitly-padded convolutions inside a lax.scan body — FIXED
         for this codebase by lowering every Conv as explicit jnp.pad +
         VALID (nn/common.py), which partitions exactly;
      2. CHAINED convolutions in a scan body when a space-axis shard of
         the coarsest feature map is not larger than a single conv's
         halo (e.g. 1/16-scale H of 4 rows over space=2 -> 2-row local
         shards vs the 7x7 conv's halo of 3). Single convs are exact
         even there; chains are not. The safe region is
         (H/16)/space > 3, i.e. image height > 64*space: 720p at
         space=4 (46//4 = 11 rows) is comfortably safe; 128-px toy
         clips at space=4 (8//4 = 2) are not.

    With (1) fixed, the full scan-based model is Shardy-exact at every
    adequate shape (tests/test_sharding.py::
    test_seq_space_sharded_forward_exact_under_shardy). For shapes
    inside region (2) — and conservatively whenever the caller does NOT
    provide image_hw for a multi-axis mesh, or when the
    PPM_CONV_IMPLICIT_PAD=1 escape hatch disables fix (1) — make_mesh
    falls back to classic GSPMD, which compiles every tested shape
    correctly."""
    if sum(s > 1 for s in (spec.data, spec.seq, spec.space)) <= 1:
        return True  # single-axis shardings are exact under Shardy
    from ppmstereo_tpu.nn.common import _IMPLICIT_PAD

    if _IMPLICIT_PAD:
        return False  # trigger (1) is back: every multi-axis shape unsafe
    if spec.space <= 1:
        return True
    if image_hw is None:
        # unknown shape: be conservative — correctness beats the
        # deprecation warning. Callers that know their input size pass
        # it and stay on Shardy.
        return False
    h16 = max(image_hw[0] // 16, 1)
    return h16 // spec.space > _MAX_CHAINED_H_HALO


def _disable_shardy_partitioner():
    """Pin the classic GSPMD partitioner — the LEGACY fallback, now only
    engaged for shapes inside the residual Shardy danger region (see
    shardy_safe_shapes): tiny space-axis shards of the coarsest feature
    map with chained convs in the scanned loop. GSPMD is deprecated
    upstream but compiles those shapes correctly
    (tests/test_sharding.py); production shapes stay on Shardy.
    """
    try:
        jax.config.update("jax_use_shardy_partitioner", False)
    except Exception:
        # LOUD canary: if the flag is gone, the workaround no longer
        # applies and the partitioner that miscompiled the scanned loop
        # may be back on. tests/test_sharding.py asserts exact seq+space
        # parity and will catch a regression — do not silence this.
        # Escape hatch if that day comes before upstream fixes land:
        # build models with cfg.unroll_refinement_loop=True (Shardy-exact).
        import warnings

        warnings.warn(
            "jax_use_shardy_partitioner flag no longer exists: the Shardy "
            "miscompile workaround (parallel/mesh.py) is inert. Run "
            "tests/test_sharding.py before trusting multi-axis meshes, "
            "or set PPMStereoConfig.unroll_refinement_loop=True.",
            RuntimeWarning,
            stacklevel=2,
        )


def make_mesh(
    spec: MeshSpec | None = None,
    devices=None,
    image_hw: tuple[int, int] | None = None,
) -> Mesh:
    """Build the (data, seq, space) mesh.

    image_hw: the input image (H, W) this mesh will shard, when known.
    Multi-axis meshes stay on the default Shardy partitioner (exact for
    all adequate shapes since the round-4 explicit-padding fix,
    nn/common.py); shapes inside the residual Shardy danger region
    (shardy_safe_shapes) fall back to classic GSPMD with a warning.
    Callers that know their input size should pass it."""
    if spec is not None and not shardy_safe_shapes(spec, image_hw):
        import warnings

        why = (
            f"image H={image_hw[0]}: 1/16-scale space shards are <= the "
            f"max chained-conv halo ({_MAX_CHAINED_H_HALO})"
            if image_hw is not None
            else "image_hw not provided (or PPM_CONV_IMPLICIT_PAD=1)"
        )
        warnings.warn(
            f"mesh {spec}, {why} — inside (or possibly inside) the "
            "residual Shardy danger region; pinning the classic GSPMD "
            "partitioner for correctness (see "
            "parallel/mesh.py::shardy_safe_shapes). Pass image_hw to "
            "make_mesh to stay on the default partitioner at safe "
            "shapes.",
            RuntimeWarning,
            stacklevel=2,
        )
        _disable_shardy_partitioner()
    devices = devices if devices is not None else jax.devices()
    if spec is None:
        spec = MeshSpec(data=len(devices))
    if spec.size > len(devices):
        raise ValueError(f"mesh {spec} needs {spec.size} devices, have {len(devices)}")
    devs = np.asarray(devices[: spec.size]).reshape(spec.data, spec.seq, spec.space)
    return Mesh(devs, axis_names=("data", "seq", "space"))
