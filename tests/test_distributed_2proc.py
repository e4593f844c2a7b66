"""2-process jax.distributed correctness: the sharded train step, the
distributed evaluator AND the parallel window predictor (multi-host
streaming, BASELINE config #5) produce the same numbers as a single
process.

The reference never tests multi-node (DDP is launched, never verified —
/root/reference/train.py:493-500); this is the CPU fake-backend
verification SURVEY.md §4 calls for. Two subprocesses each own 4 virtual
CPU devices; the driver computes the single-process golden on its own
8-device mesh and compares.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_train_and_eval(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = _free_port()
    out = tmp_path / "proc0.json"

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(repo, "tests", "distributed_worker.py"),
             str(pid), "2", str(port), str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=1200)
        outs.append(stdout.decode(errors="replace"))
    for p, text in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{text[-3000:]}"
    assert out.exists(), outs[0][-2000:]
    dist = json.loads(out.read_text())
    assert dist["process_count"] == 2

    # ---- single-process golden (8 local devices, same computation) ----
    from tests.distributed_common import build_eval_predictor_and_dataset, build_train_setup

    import jax

    from ppmstereo_tpu.evaluation.distributed import evaluate_distributed
    from ppmstereo_tpu.parallel.mesh import MeshSpec, make_mesh
    from ppmstereo_tpu.parallel.sharding import batch_sharding, replicate, shard_batch
    from ppmstereo_tpu.train.step import jit_train_step

    mesh = make_mesh(MeshSpec(data=8))
    model, state, batch_np = build_train_setup()
    gbatch = shard_batch(mesh, batch_np)
    state = jax.device_put(state, replicate(mesh))
    step = jit_train_step(model, mesh, batch_sharding(mesh), replicate(mesh))
    _, metrics = step(state, gbatch)
    want_loss = float(jax.device_get(metrics["loss"]))

    predictor, dataset = build_eval_predictor_and_dataset()
    want_eval = evaluate_distributed(None, predictor, dataset, mesh)

    assert abs(dist["loss"] - want_loss) < 1e-3 * max(1.0, abs(want_loss)), (
        dist["loss"], want_loss,
    )
    for k, v in want_eval.items():
        if k == "fps":
            continue
        assert k in dist["eval"], k
        assert abs(dist["eval"][k] - float(v)) < 1e-3 * max(1.0, abs(float(v))), (
            k, dist["eval"][k], float(v),
        )

    # ---- parallel window predictor (multi-host streaming) vs the
    # SEQUENTIAL sliding-window driver (golden) ----
    from tests.distributed_common import T, build_parallel_window_setup

    from ppmstereo_tpu.models.inference import SlidingWindowPredictor

    window_fn, video = build_parallel_window_setup()
    seq_pred = SlidingWindowPredictor(window_fn, kernel_size=T)
    want_disp = seq_pred(video)["disparity"]
    got_disp = np.load(str(out) + ".pwin.npy")
    assert got_disp.shape == want_disp.shape
    np.testing.assert_allclose(got_disp, want_disp, rtol=1e-4, atol=1e-4)

    # ---- FULLY-COMPOSED config #5 (100 frames, windows over `data`
    # across processes, each window sharded seq x space) vs the
    # sequential driver ----
    from tests.distributed_common import (
        COMPOSED_KERNEL,
        build_composed_window_setup,
    )

    window_fn_c, video_c = build_composed_window_setup()
    want_c = SlidingWindowPredictor(
        window_fn_c, kernel_size=COMPOSED_KERNEL
    )(video_c)["disparity"]
    got_c = np.load(str(out) + ".pwin100.npy")
    assert got_c.shape == want_c.shape and len(got_c) == len(video_c)
    np.testing.assert_allclose(got_c, want_c, rtol=1e-4, atol=1e-4)
