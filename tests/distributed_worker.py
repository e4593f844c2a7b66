"""Worker for the 2-process jax.distributed test (SURVEY.md §4's
multi-host CPU idiom — the fake-backend analog of the reference's DDP,
/root/reference/train.py:493-500).

Each process owns 4 virtual CPU devices (8 global). It runs:
  1. one mesh-sharded train step on a globally-sharded batch
     (jax.make_array_from_process_local_data feeding local clip shards);
  2. distributed evaluation (per-host sequence shards +
     process_allgather metric reduction).
Process 0 dumps {"loss": ..., "metrics": {...}} as JSON for the driver
to compare against a single-process run of the identical computation.
"""

import json
import os
import sys


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    out_path = sys.argv[4]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 4 * nproc

    import numpy as np

    from tests.distributed_common import (
        build_eval_predictor_and_dataset,
        build_train_setup,
        GLOBAL_BATCH,
    )

    from ppmstereo_tpu.evaluation.distributed import evaluate_distributed
    from ppmstereo_tpu.parallel.mesh import MeshSpec, make_mesh
    from ppmstereo_tpu.parallel.sharding import batch_sharding, replicate

    mesh = make_mesh(MeshSpec(data=4 * nproc))

    # ---- 1. sharded train step over a global batch --------------------
    model, state, batch_np = build_train_setup()
    specs = batch_sharding(mesh)
    local = slice(pid * GLOBAL_BATCH // nproc, (pid + 1) * GLOBAL_BATCH // nproc)
    gbatch = {
        k: jax.make_array_from_process_local_data(specs[k], v[local])
        for k, v in batch_np.items()
    }
    state = jax.device_put(state, replicate(mesh))

    from ppmstereo_tpu.train.step import jit_train_step

    step = jit_train_step(model, mesh, specs, replicate(mesh))
    state, metrics = step(state, gbatch)
    loss = float(jax.device_get(metrics["loss"]))

    # ---- 2. distributed evaluation ------------------------------------
    predictor, dataset = build_eval_predictor_and_dataset()
    eval_metrics = evaluate_distributed(None, predictor, dataset, mesh)

    # ---- 3. multi-host parallel window streaming -----------------------
    # (BASELINE config #5: windows sharded over the data axis across
    # processes; every host stitches the full video)
    from tests.distributed_common import build_parallel_window_setup

    from ppmstereo_tpu.parallel.streaming import ParallelWindowPredictor

    window_fn, video = build_parallel_window_setup(mesh)
    from tests.distributed_common import T as KERNEL_T

    ppred = ParallelWindowPredictor(window_fn, mesh, kernel_size=KERNEL_T)
    pout = ppred(video)

    # ---- 4. FULLY-COMPOSED config #5: 100-frame video, windows
    # pipelined over `data` ACROSS the two processes while each window
    # is itself sharded over seq x space ---------------------------------
    from tests.distributed_common import (
        COMPOSED_H,
        COMPOSED_KERNEL,
        COMPOSED_W,
        build_composed_window_setup,
    )

    mesh_c = make_mesh(
        MeshSpec(data=nproc, seq=2, space=2),
        image_hw=(COMPOSED_H, COMPOSED_W),
    )
    window_fn_c, video_c = build_composed_window_setup(mesh_c)
    ppred_c = ParallelWindowPredictor(
        window_fn_c, mesh_c, kernel_size=COMPOSED_KERNEL
    )
    pout_c = ppred_c(video_c)

    if pid == 0:
        np.save(out_path + ".pwin.npy", pout["disparity"])
        np.save(out_path + ".pwin100.npy", pout_c["disparity"])
        with open(out_path, "w") as f:
            json.dump(
                {
                    "loss": loss,
                    "eval": {k: float(v) for k, v in eval_metrics.items()},
                    "process_count": jax.process_count(),
                },
                f,
            )


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
