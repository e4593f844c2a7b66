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
# motion encoder's 7x7 conv (nn/motion.py convf1). Stages whose local
# space-axis row shards would be <= this replicate their rows instead
# (models/ppm_stereo.py::_tiny_row_shards) so the DEFAULT Shardy
# partitioner is exact at every shape.
_MAX_CHAINED_H_HALO = 3


def make_mesh(
    spec: MeshSpec | None = None,
    devices=None,
    image_hw: tuple[int, int] | None = None,
) -> Mesh:
    """Build the (data, seq, space) mesh.

    Always uses the DEFAULT (Shardy) partitioner. History: round 3 found
    Shardy miscompiling the scanned refinement loop under 2-axis
    sharding; round-4 bisection (artifacts/shardy_probe_r4.py,
    shardy_bisect_loop_r4.py) isolated two triggers — (1) implicitly-
    padded convs in scan bodies, fixed by the explicit pad+VALID conv
    lowering (nn/common.py); (2) chained convs when a space shard of
    the coarsest feature map is <= one conv's halo. Round 5 closed (2)
    inside the MODEL: stages in the danger region pin their rows
    replicated (models/ppm_stereo.py::_tiny_row_shards), which is exact
    under Shardy at every tested shape with images >= 64 px
    (tests/test_sharding.py, tests/test_distributed_2proc.py) — so the
    old classic-GSPMD fallback and its deprecation exposure are gone.
    Residual boundary: images BELOW 64 px (1/16 scales of <= 2 rows)
    keep an O(1e-3) Shardy inexactness in the encoder/SST chains that
    row pins measurably do not remove (2026-08-21 diagnostic, constant
    1.77e-3 across loop-only/loop+image pin variants at 32x64; exact
    under GSPMD). No real workload space-shards sub-64px rows; tests
    use >= 64 px for space-sharded configs.

    image_hw: accepted for API compatibility (callers pass the input
    (H, W) this mesh will shard); no longer changes partitioner choice.

    NOTE: the model's sharding hints — including the tiny-row-shard
    mitigation — read the AMBIENT mesh at trace time, so sharded
    graphs must be TRACED inside `with mesh:` (or jax.sharding.set_mesh
    scope). Every framework entry point (SlidingWindowPredictor,
    trainer, streaming, the CLIs) already does; custom callers jitting
    the raw model with in_shardings must do the same.
    """
    from ppmstereo_tpu.nn.common import _IMPLICIT_PAD

    if (
        _IMPLICIT_PAD
        and spec is not None
        and sum(s > 1 for s in (spec.data, spec.seq, spec.space)) > 1
    ):
        import warnings

        warnings.warn(
            "PPM_CONV_IMPLICIT_PAD=1 with a multi-axis mesh: implicitly "
            "padded convs in scan bodies are a known Shardy miscompile "
            "trigger (round-4 bisection) and the classic-GSPMD fallback "
            "was removed in round 5. Unset PPM_CONV_IMPLICIT_PAD for "
            "multi-axis sharding.",
            RuntimeWarning,
            stacklevel=2,
        )
    devices = devices if devices is not None else jax.devices()
    if spec is None:
        spec = MeshSpec(data=len(devices))
    if spec.size > len(devices):
        raise ValueError(f"mesh {spec} needs {spec.size} devices, have {len(devices)}")
    devs = np.asarray(devices[: spec.size]).reshape(spec.data, spec.seq, spec.space)
    return Mesh(devs, axis_names=("data", "seq", "space"))
