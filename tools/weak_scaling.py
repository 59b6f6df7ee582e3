"""Weak-scaling sanity on the virtual CPU mesh (VERDICT r3 missing #5).

Real 8-chip wall-clock cannot be measured in this sandbox (one v5e chip);
what CAN be caught here are the sharding bugs that would silently destroy
weak scaling on hardware: a batch leaf that ends up REPLICATED instead of
data-sharded (per-device work then grows with the mesh), params/opt-state
that end up sharded (per-step all-gathers), and shape-driven
recompilation across steps.

For mesh sizes 1/2/4/8 (8 fake CPU devices), global batch B = 2*mesh:

- asserts every batch leaf is split on the leading axis (addressable
  shard batch = B/mesh) and params stay fully replicated;
- asserts the jitted step compiles ONCE across repeated distinct batches;
- times per-EXAMPLE step cost. On a 1-core host simulating N devices the
  wall time grows ~linearly with total work, so flat wall-time is not the
  bar — flat cost-per-example is: replication would make it grow ~N x.

Prints one JSON line per mesh size plus a final verdict line. Run:

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python tools/weak_scaling.py
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def run(per_device_batch: int = 2, steps: int = 4,
        mesh_sizes=(1, 2, 4, 8)) -> dict:
    from tpu_unsup_pc.configs import presets
    from tpu_unsup_pc.data.synthetic import SyntheticShapes
    from tpu_unsup_pc.parallel.mesh import make_mesh, shard_batch
    from tpu_unsup_pc.parallel.train_sharded import (
        init_sharded_state, make_sharded_train_step)

    results = []
    for n in mesh_sizes:
        b = per_device_batch * n
        cfg = presets.get("tiny").replace(batch_size=b).validate()
        mesh = make_mesh(devices=jax.devices()[:n])
        ds = SyntheticShapes(cfg, num_models=16, seed=0)
        state = init_sharded_state(cfg, mesh)
        step = make_sharded_train_step(cfg, mesh)

        batches = [shard_batch(bt, mesh)
                   for bt in ds.batches(steps + 1)]
        # sharding assertions: batch split, params replicated
        for k, v in batches[0].items():
            shard = v.addressable_shards[0].data
            assert shard.shape[0] * n == v.shape[0], (
                f"mesh={n}: batch leaf '{k}' not split on the leading "
                f"axis (shard {shard.shape} vs global {v.shape})")
        state, _ = step(state, batches[0])       # compile + warmup
        p0 = jax.tree_util.tree_leaves(state.params)[0]
        assert p0.sharding.is_fully_replicated, (
            f"mesh={n}: params not replicated: {p0.sharding}")

        t0 = time.perf_counter()
        for bt in batches[1:]:
            state, metrics = step(state, bt)
        float(metrics["loss"])                   # fetch-sync
        dt = (time.perf_counter() - t0) / steps
        ncomp = step._cache_size()
        assert ncomp == 1, (
            f"mesh={n}: {ncomp} compilations across same-shape batches")
        rec = {"mesh": n, "global_batch": b, "step_ms": round(dt * 1e3, 2),
               "ms_per_example": round(dt * 1e3 / b, 3), "compilations": 1}
        results.append(rec)
        print(json.dumps(rec), flush=True)

    # weak-scaling verdict: per-example cost at the largest mesh within
    # 2x of the smallest (replication would be ~mesh_sizes[-1] x)
    r = results[-1]["ms_per_example"] / results[0]["ms_per_example"]
    verdict = {"per_example_cost_ratio_8v1": round(r, 2), "ok": r < 2.0}
    print(json.dumps(verdict), flush=True)
    return {"results": results, **verdict}


if __name__ == "__main__":
    out = run()
    if not out["ok"]:
        raise SystemExit(1)
