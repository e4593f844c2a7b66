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


def make_mesh(spec: MeshSpec | None = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if spec is None:
        spec = MeshSpec(data=len(devices))
    if spec.size > len(devices):
        raise ValueError(f"mesh {spec} needs {spec.size} devices, have {len(devices)}")
    devs = np.asarray(devices[: spec.size]).reshape(spec.data, spec.seq, spec.space)
    return Mesh(devs, axis_names=("data", "seq", "space"))
