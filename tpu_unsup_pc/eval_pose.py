"""Pose-accuracy evaluation for the unknown-pose setting (SURVEY.md §2
"Prediction / eval"): median angular error and Acc@30 of predicted camera
rotations.

The pose regressor learns poses relative to an ARBITRARY canonical frame
(the model invents its own object frame up to a global rotation), so
absolute quaternion error is meaningless. The frame-invariant metric is the
RELATIVE rotation between two views of the same object:

    q_rel = q_i * conj(q_j)   — the global canonical rotation cancels.

Every ordered view pair contributes one angle between predicted and GT
relative rotations.

    python -m tpu_unsup_pc.predict --preset c3_synth --all-views \
        --ckpt-dir ckpt --out preds.npz
    python -m tpu_unsup_pc.eval_pose --pred preds.npz
"""

from __future__ import annotations

import argparse
import json

import numpy as np

import jax.numpy as jnp

from tpu_unsup_pc.ops.quaternion import (quat_angle_between, quat_conjugate,
                                         quat_from_euler, quat_multiply)


def evaluate_pose(pred_pose: np.ndarray, gt_azimuth: np.ndarray,
                  gt_elevation: np.ndarray) -> dict:
    """(M, V, 4) predicted quats + (M, V) GT az/el -> relative-pose stats."""
    M, V = pred_pose.shape[:2]
    assert V >= 2, "relative-pose eval needs >= 2 views per model"
    q_pred = jnp.asarray(pred_pose)
    q_gt = quat_from_euler(jnp.asarray(gt_azimuth),
                           jnp.asarray(gt_elevation))
    # all ordered pairs i<j at once (one device dispatch, not V^2 — the
    # per-pair loop cost tens of seconds through the TPU tunnel)
    iu, ju = np.triu_indices(V, k=1)
    rel_p = quat_multiply(q_pred[:, iu], quat_conjugate(q_pred[:, ju]))
    rel_g = quat_multiply(q_gt[:, iu], quat_conjugate(q_gt[:, ju]))
    ang = np.degrees(np.asarray(quat_angle_between(rel_p, rel_g)).ravel())
    return {"pose_err_median_deg": float(np.median(ang)),
            "pose_err_mean_deg": float(ang.mean()),
            "pose_acc_30deg": float((ang < 30.0).mean()),
            "num_pairs": int(ang.size)}


def evaluate_state_poses(cfg, state, images, azimuth, elevation,
                         chunk: int = 16) -> dict:
    """In-process pose eval of a TrainState: student relative-pose stats
    plus each candidate head's median (diagnostic for ensemble health).
    images (M,V,H,W,3), azimuth/elevation (M,V) numpy arrays."""
    from tpu_unsup_pc import training
    students, cands = [], []
    for i in range(0, images.shape[0], chunk):
        out = training.predict_step(cfg, state,
                                    jnp.asarray(images[i:i + chunk]))
        students.append(np.asarray(out.pose.student))
        cands.append(np.asarray(out.pose.candidates))
    student = np.concatenate(students)                  # (M,V,4)
    cand = np.concatenate(cands)                        # (M,V,K,4)
    res = evaluate_pose(student, azimuth, elevation)
    per_head = [evaluate_pose(cand[:, :, k], azimuth, elevation)
                ["pose_err_median_deg"] for k in range(cand.shape[2])]
    res["head_med_deg"] = [round(h, 1) for h in per_head]
    res["best_head_med_deg"] = min(per_head)
    return res


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pred", default="preds.npz",
                   help="npz from predict --all-views (pred_pose + gt az/el)")
    p.add_argument("--key", default="pred_pose",
                   help="which pose array to score: pred_pose (raw "
                        "student), pred_pose_refined (test-time refined, "
                        "min-SSE init) or pred_pose_refined_student — the "
                        "refined arrays exist when predict ran with "
                        "--refine-steps")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)
    with np.load(args.pred) as z:
        if args.key not in z:
            raise SystemExit(f"no {args.key} in file — run predict with a "
                             "predict_pose preset and --all-views" +
                             ("" if args.key == "pred_pose" else
                              " and --refine-steps"))
        if z[args.key].ndim != 3:
            raise SystemExit(f"{args.key} must be (M, V, 4) — rerun "
                             "predict with --all-views")
        stats = evaluate_pose(z[args.key], z["gt_azimuth"],
                              z["gt_elevation"])
        stats["pose_key"] = args.key
    line = json.dumps(stats)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return stats


if __name__ == "__main__":
    main()
