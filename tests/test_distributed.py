"""Multi-process entry test (SURVEY.md §2.3): jax.distributed.initialize
actually executes — a real 2-process CPU rendezvous (4 fake devices each),
one sharded train step over the global 8-device mesh, loss equal to the
single-process unsharded step (VERDICT r3 missing #4: the initialize()
branch had never run anywhere)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_sharded_step_matches_unsharded():
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            PYTHONPATH=REPO,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
        )
        env.pop("PALLAS_AXON_POOL_IPS", None)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "_dist_worker.py")],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("2-process rendezvous timed out")
        assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    # both processes agree (the all-reduce actually crossed processes)
    assert {o["process"] for o in outs} == {0, 1}
    assert outs[0]["loss"] == pytest.approx(outs[1]["loss"], rel=1e-6)
    assert outs[0]["params_checksum"] == pytest.approx(
        outs[1]["params_checksum"], rel=1e-6)

    # and match the single-process unsharded reference on the same batch
    from tpu_unsup_pc import training
    from tpu_unsup_pc.configs import presets

    cfg = presets.get("tiny").replace(
        batch_size=8, mesh_shape=(8,), num_views=2, pc_num_points=64)
    rng = np.random.default_rng(0)
    V, H = cfg.num_views, cfg.image_size
    batch = {
        "image": rng.uniform(size=(8, V, H, H, 3)).astype(np.float32),
        "mask": (rng.uniform(size=(8, V, H, H)) > 0.5).astype(np.float32),
        "azimuth": rng.uniform(0, 6.28, size=(8, V)).astype(np.float32),
        "elevation": rng.uniform(-0.3, 0.9, size=(8, V)).astype(np.float32),
    }
    state = training.init_state(cfg)
    _, metrics = training.train_step(cfg, state, batch)
    assert outs[0]["loss"] == pytest.approx(float(metrics["loss"]),
                                            rel=2e-4)
