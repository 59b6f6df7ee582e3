"""Per-OBJECT model-selection ensemble for the unknown-pose setting.

Motivation (measured, round 4): the two shipped pose lineages —
`runs/pose_recipe/sharp_s5` (test 9.88deg/0.898) and `runs/c3rgb_sharp`
(9.99deg/0.880) — fail on partly different objects: the per-object oracle
best-of-two is 0.922 Acc@30 (+0.024 over the better single model). This
tool tries to capture that headroom with an UNSUPERVISED selector: per
object, render each model's predicted cloud into every view at its own
predicted poses and score the cross-view sil(+RGB) SSE against the
observed images; the model that explains the object's views better
supplies that object's poses.

Why per-OBJECT, not per-view: each model learns poses relative to its own
arbitrary canonical frame (eval_pose.py docstring). Mixing per-view poses
across models breaks that shared gauge and corrupts every relative-pose
pair; per-object selection keeps all of an object's views in one model's
frame, so the relative-pose metric stays well defined.

The selector sees only images/masks (no GT poses) — it is test-time model
selection with the same evidence training's teacher selection uses
(SURVEY.md §3.2 min-loss selection [B:9], extended across checkpoints).

    PYTHONPATH=/root/repo:$PYTHONPATH python tools/pose_ensemble.py \
        --model recipe=runs/pose_recipe/sharp_s5/ckpt/best_params.npz \
        --model sharp=runs/c3rgb_sharp/best_params.npz \
        --out runs/ensemble
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

import jax.numpy as jnp

from tpu_unsup_pc import training
from tpu_unsup_pc.configs import presets
from tpu_unsup_pc.data import make_dataset
from tpu_unsup_pc.eval_pose import evaluate_pose
from tpu_unsup_pc.refine import refine_quats_multi
from tpu_unsup_pc.utils.checkpoint import load_params_npz


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", action="append", dest="models", required=True,
                   help="NAME=params.npz (repeatable; >=2 for an ensemble)")
    p.add_argument("--preset", default="c3_synth")
    p.add_argument("--set", action="append", dest="overrides",
                   default=["use_pallas=True", "predict_rgb=True"])
    p.add_argument("--split", default="test")
    p.add_argument("--num-models", type=int, default=64)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--rgb-w", type=float, default=1.0,
                   help="weight of masked RGB SSE in the selector score "
                        "(color discriminates silhouette-flip basins)")
    p.add_argument("--sigma", type=float, default=None,
                   help="render sigma for scoring (default cfg.sigma_end — "
                        "what the clouds were trained to look like)")
    p.add_argument("--out", default="runs/ensemble")
    return p.parse_args(argv)


def score_model(cfg, params_npz, dataset, n, batch_size, rgb_w, sigma):
    """Per-object cross-view SSE + per-view student poses for one model.

    Returns (poses (n, V, 4), scores (n,)). Score = sum over (source view,
    target view != source) pairs of sil+rgb SSE of the source's decoded
    cloud rendered at the model's predicted pose for the target view —
    the training loss's evidence term, evaluated at test time.
    """
    state, step = load_params_npz(cfg, params_npz)
    print(f"  {params_npz}: step-{step} params")
    poses, scores = [], []
    for i in range(0, n, batch_size):
        idx = np.arange(i, min(i + batch_size, n))
        batch = dataset.get_batch(idx)
        images = jnp.asarray(batch["image"])          # (B, V, H, W, 3)
        masks = jnp.asarray(batch["mask"])            # (B, V, H, W)
        out = training.predict_step(cfg, state, images)
        student = out.pose.student                    # (B, V, 4)
        B, V = student.shape[:2]
        src_w = 1.0 - jnp.eye(V, dtype=jnp.float32)   # cross-view evidence
        rgb = out.cloud.rgb
        _, sse = refine_quats_multi(
            cfg, out.cloud.points, student[:, :, None, :], masks, src_w,
            None, rgb, images if rgb is not None else None,
            steps=0, sigma=sigma, rgb_w=rgb_w)        # sse (B, V, 1)
        poses.append(np.asarray(student))
        scores.append(np.asarray(sse)[:, :, 0].sum(axis=1))
    return np.concatenate(poses), np.concatenate(scores)


def main(argv=None):
    args = parse_args(argv)
    cfg = presets.apply_overrides(presets.get(args.preset), args.overrides)
    dataset = make_dataset(cfg, split=args.split,
                           num_models=args.num_models)
    n = min(args.num_models, len(dataset))
    # one batched fetch (ADVICE r4): n unit-batch get_batch calls re-enter
    # device code per call — needlessly slow through the TPU tunnel
    gt = dataset.get_batch(np.arange(n))
    gt_az = np.asarray(gt["azimuth"])
    gt_el = np.asarray(gt["elevation"])

    names, all_poses, all_scores, per_model = [], [], [], {}
    for spec in args.models:
        name, _, path = spec.partition("=")
        assert path, f"--model needs NAME=PATH, got {spec!r}"
        print(f"scoring {name}:")
        poses, scores = score_model(cfg, path, dataset, n, args.batch_size,
                                    args.rgb_w, args.sigma)
        stats = evaluate_pose(poses, gt_az, gt_el)
        print(f"  {name}: acc30={stats['pose_acc_30deg']:.3f} "
              f"median={stats['pose_err_median_deg']:.2f}deg "
              f"mean_score={scores.mean():.1f}")
        names.append(name)
        all_poses.append(poses)
        all_scores.append(scores)
        per_model[name] = {"params": path, **stats,
                           "mean_score": float(scores.mean())}

    scores = np.stack(all_scores)                      # (M_models, n)
    poses = np.stack(all_poses)                        # (M_models, n, V, 4)
    pick = scores.argmin(axis=0)                       # (n,)
    merged = poses[pick, np.arange(n)]                 # (n, V, 4)
    ens = evaluate_pose(merged, gt_az, gt_el)

    # oracle upper bound (uses GT — diagnostic only, never the headline)
    per_obj_acc = np.stack([
        (np.asarray(_angles(p, gt_az, gt_el)) < 30).mean(axis=1)
        for p in all_poses])
    oracle_pick = per_obj_acc.argmax(axis=0)
    oracle = evaluate_pose(poses[oracle_pick, np.arange(n)], gt_az, gt_el)

    picks = {nm: int((pick == i).sum()) for i, nm in enumerate(names)}
    agree = int((pick == oracle_pick).sum())
    print(f"ensemble: acc30={ens['pose_acc_30deg']:.3f} "
          f"median={ens['pose_err_median_deg']:.2f}deg picks={picks}")
    print(f"oracle best-of-{len(names)}: acc30={oracle['pose_acc_30deg']:.3f}"
          f" (selector matches oracle pick on {agree}/{n} objects)")

    os.makedirs(args.out, exist_ok=True)
    np.savez_compressed(
        os.path.join(args.out, f"{args.split}_preds.npz"),
        pred_pose=merged, gt_azimuth=gt_az, gt_elevation=gt_el,
        pick=pick, scores=scores)
    with open(os.path.join(args.out, f"summary_{args.split}.json"),
              "w") as f:
        json.dump({"models": per_model, "ensemble": ens, "oracle": oracle,
                   "picks": picks, "selector_oracle_agreement": agree,
                   "rgb_w": args.rgb_w, "num_objects": n}, f, indent=2)
    print(f"wrote {args.out}/summary_{args.split}.json")


def _angles(pred, az, el):
    from tpu_unsup_pc.ops.quaternion import (quat_angle_between,
                                             quat_conjugate, quat_from_euler,
                                             quat_multiply)
    q_pred = jnp.asarray(pred)
    q_gt = quat_from_euler(jnp.asarray(az), jnp.asarray(el))
    V = pred.shape[1]
    iu, ju = np.triu_indices(V, k=1)
    rel_p = quat_multiply(q_pred[:, iu], quat_conjugate(q_pred[:, ju]))
    rel_g = quat_multiply(q_gt[:, iu], quat_conjugate(q_gt[:, ju]))
    return np.degrees(np.asarray(quat_angle_between(rel_p, rel_g)))


if __name__ == "__main__":
    main()
