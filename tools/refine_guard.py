"""Trust-region guard for test-time pose refinement (post-hoc, from a
predict.py npz that carries both raw and refined poses).

Motivation (measured on runs/c3rgb_refine_sweep, val split of the RGB
phase-4 model): refinement halves the median error (10.3 -> 5.6 deg) but
walks ~5-9% of views across a silhouette-flip basin boundary, dropping
Acc@30 from 0.933 to 0.84-0.88. Those walks are LARGE moves — a genuine
within-basin polish moves a pose by a few degrees, a basin hop moves it
by tens. So gate per view: accept the refined pose only if it stayed
within --guard-deg of its raw seed, else keep the seed.

    python tools/refine_guard.py --pred val_preds.npz \
        --raw-key pred_pose --refined-key pred_pose_refined_student \
        --sweep 5,10,15,20,30,45,60
"""
from __future__ import annotations

import argparse
import json

import numpy as np

from tpu_unsup_pc.eval_pose import evaluate_pose
from tpu_unsup_pc.refine import guard_poses


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pred", required=True)
    p.add_argument("--raw-key", default="pred_pose")
    p.add_argument("--refined-key", default="pred_pose_refined_student")
    p.add_argument("--sweep", default="5,10,15,20,30,45,60",
                   help="comma-separated guard thresholds in degrees")
    p.add_argument("--out", default=None,
                   help="write guarded poses (best-Acc threshold) back to "
                        "this npz under key pred_pose_guarded")
    args = p.parse_args(argv)

    z = dict(np.load(args.pred))
    raw, refined = z[args.raw_key], z[args.refined_key]
    az, el = z["gt_azimuth"], z["gt_elevation"]

    rows = []
    for t in [float(s) for s in args.sweep.split(",")]:
        guarded, frac = guard_poses(raw, refined, t)
        res = evaluate_pose(guarded, az, el)
        res.update(guard_deg=t, refined_frac=round(frac, 4))
        rows.append(res)
        print(json.dumps(res))
    for label, key in [("raw", args.raw_key), ("refined", args.refined_key)]:
        res = evaluate_pose(z[key], az, el)
        res["guard_deg"] = label
        print(json.dumps(res))

    if args.out:
        # best threshold = max Acc@30, median as tiebreak
        best = max(rows, key=lambda r: (r["pose_acc_30deg"],
                                        -r["pose_err_median_deg"]))
        guarded, _ = guard_poses(raw, refined, best["guard_deg"])
        z["pred_pose_guarded"] = guarded
        np.savez(args.out, **z)
        print(f"wrote {args.out} (guard_deg={best['guard_deg']})")


if __name__ == "__main__":
    main()
