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


def _disable_shardy_partitioner():
    """Work around a Shardy partitioner miscompile (JAX 0.9 default),
    applied to MULTI-AXIS meshes only.

    Root cause (round-3 bisection, minimal upstream repro in
    artifacts/shardy_repro.py): Shardy miscompiles a lax.scan whose body
    contains a K-tap SAME convolution when the conv operand is sharded on
    TWO mesh axes at once (O(1)-wrong values; trigger is cost-model
    dependent — appears at 128 channels, not at 16). Single-axis
    shardings are exact, and the same model with the loop unrolled to a
    Python loop is exact under Shardy
    (PPMStereoConfig.unroll_refinement_loop). Classic GSPMD is deprecated
    but compiles the scan correctly on every tested shape
    (tests/test_sharding.py); revisit when Shardy fixes land.
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


def make_mesh(spec: MeshSpec | None = None, devices=None) -> Mesh:
    if spec is not None and sum(s > 1 for s in (spec.data, spec.seq, spec.space)) > 1:
        # single-axis meshes (plain DP, seq-only, space-only) are exact
        # under Shardy and keep the supported default partitioner; only
        # multi-axis shardings hit the scan miscompile
        _disable_shardy_partitioner()
    devices = devices if devices is not None else jax.devices()
    if spec is None:
        spec = MeshSpec(data=len(devices))
    if spec.size > len(devices):
        raise ValueError(f"mesh {spec} needs {spec.size} devices, have {len(devices)}")
    devs = np.asarray(devices[: spec.size]).reshape(spec.data, spec.seq, spec.space)
    return Mesh(devs, axis_names=("data", "seq", "space"))
