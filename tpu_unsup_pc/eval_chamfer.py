"""Chamfer evaluation (SURVEY.md §3.3, L5): Chamfer-L1 between predicted and
GT clouds — the parity metric [BASELINE.json:2] — with the optional global
rotation alignment the unknown-pose setting needs (the canonical frame a
pose-free model learns is arbitrary up to a rotation; the reference aligns
before scoring [SURVEY §2 "Prediction / eval"]).

    python -m tpu_unsup_pc.eval_chamfer --pred preds.npz [--align]
"""

from __future__ import annotations

import argparse
import functools
import json

import numpy as np

import jax
import jax.numpy as jnp

from tpu_unsup_pc.ops.chamfer import chamfer_l1
from tpu_unsup_pc.ops.quaternion import (quat_from_euler, quat_multiply,
                                         quat_rotate)


@functools.partial(jax.jit, static_argnames=("n_az", "n_el", "n_roll"))
def _align_rotation(pred, gt, n_az: int = 24, n_el: int = 7,
                    n_roll: int = 8):
    """Grid search over the FULL SO(3) gauge — azimuth x elevation x
    in-plane roll — minimizing chamfer of a subsampled cloud, then a finer
    local grid composed around the coarse argmin. A pose-free model's
    canonical frame is arbitrary up to any rotation, including roll; the
    old azimuth x elevation grid scored rolled frames pessimistically
    (VERDICT r2 weak #8). Everything is vmapped over candidates — two
    batched computations, no data-dependent control flow."""
    sub_p = pred[:: max(1, pred.shape[0] // 512)]
    sub_g = gt[:: max(1, gt.shape[0] // 512)]

    def score(q):
        return chamfer_l1(quat_rotate(q, sub_p), sub_g, chunk=128)

    az = jnp.linspace(0, 2 * jnp.pi, n_az, endpoint=False)
    el = jnp.linspace(-jnp.pi / 2, jnp.pi / 2, n_el)
    rl = jnp.linspace(0, 2 * jnp.pi, n_roll, endpoint=False)
    azg, elg, rlg = jnp.meshgrid(az, el, rl, indexing="ij")
    quats = quat_from_euler(azg.ravel(), elg.ravel(), rlg.ravel())
    best = quats[jnp.argmin(jax.vmap(score)(quats))]

    # refine: half-grid-step Euler perturbations composed onto the winner
    da = jnp.linspace(-jnp.pi / n_az, jnp.pi / n_az, 5)
    de = jnp.linspace(-jnp.pi / (2 * (n_el - 1)),
                      jnp.pi / (2 * (n_el - 1)), 3)
    dr = jnp.linspace(-jnp.pi / n_roll, jnp.pi / n_roll, 5)
    dag, deg, drg = jnp.meshgrid(da, de, dr, indexing="ij")
    dq = quat_from_euler(dag.ravel(), deg.ravel(), drg.ravel())
    cand = quat_multiply(dq, best[None])
    best = cand[jnp.argmin(jax.vmap(score)(cand))]
    return quat_rotate(best, pred)


def evaluate(pred_points: np.ndarray, gt_points: np.ndarray,
             align: bool = False, batch: int = 32) -> dict:
    """(M, N, 3) preds vs (M, G, 3) GT -> chamfer stats. Models are
    evaluated in vmapped device batches (one computation per `batch`
    models), so a full ShapeNet test split doesn't pay a host-Python
    round trip per model."""
    score = jax.jit(jax.vmap(lambda p, g: chamfer_l1(p, g)))
    align_b = jax.jit(jax.vmap(_align_rotation))
    ds = []
    for i in range(0, len(pred_points), batch):
        p = jnp.asarray(pred_points[i:i + batch])
        g = jnp.asarray(gt_points[i:i + batch])
        if align:
            p = align_b(p, g)
        ds.append(np.asarray(score(p, g)))
    ds = np.concatenate(ds)
    return {"chamfer_l1_mean": float(ds.mean()),
            "chamfer_l1_median": float(np.median(ds)),
            "chamfer_l1_std": float(ds.std()),
            "num_models": int(len(ds)),
            "aligned": bool(align)}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pred", default="preds.npz")
    p.add_argument("--gt", default=None,
                   help="npz with gt_points; defaults to --pred's own")
    p.add_argument("--align", action="store_true",
                   help="global rotation alignment (unknown-pose eval)")
    p.add_argument("--out", default=None, help="write stats JSON here")
    args = p.parse_args(argv)

    with np.load(args.pred) as z:
        pred = z["pred_points"]
        if pred.ndim == 4:      # --all-views dump (M, V, N, 3): score the
            pred = pred[:, 0]   # canonical view-0 cloud per model
        gt = z["gt_points"] if args.gt is None else None
    if gt is None and args.gt is not None:
        with np.load(args.gt) as z:
            gt = z["gt_points"]
    stats = evaluate(pred, gt, align=args.align)
    line = json.dumps(stats)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return stats


if __name__ == "__main__":
    main()
