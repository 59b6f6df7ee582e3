"""Best-checkpoint selection over a finished unknown-pose run (VERDICT r2
weak #4: the c3 run degraded past its in-train peak and the final
checkpoint was shipped unselected).

Evaluates every retained checkpoint's relative-pose metrics on a VALIDATION
split (unseen shapes — an unbiased selector), picks the best by val
Acc@30, reports that checkpoint's HELD-OUT TEST metrics, and exports its
params as a durable npz.

    python tools/pose_select.py --preset c3_synth \
        --ckpt-dir runs/c3_phase2/ckpt --out-dir runs/c3_best
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="c3_synth")
    p.add_argument("--ckpt-dir", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--models", type=int, default=64)
    p.add_argument("--steps", type=int, nargs="*", default=None,
                   help="checkpoint steps to score (default: all retained)")
    args = p.parse_args(argv)

    from tpu_unsup_pc.configs import presets
    from tpu_unsup_pc.data import make_dataset
    from tpu_unsup_pc.eval_pose import evaluate_state_poses
    from tpu_unsup_pc.utils.checkpoint import (CheckpointManager,
                                               save_params_npz)

    cfg = presets.get(args.preset)
    mgr = CheckpointManager(args.ckpt_dir)
    steps = args.steps or sorted(
        int(d) for d in os.listdir(args.ckpt_dir) if d.isdigit())
    print(f"scoring checkpoints: {steps}")

    splits = {}
    for split in ("val", "test"):
        ds = make_dataset(cfg, split=split, num_models=args.models)
        splits[split] = (ds.images, ds.azimuth, ds.elevation)

    rows, best = [], None
    for step in steps:
        state, _ = mgr.restore_latest(cfg, step=step)
        row = {"step": step}
        for split, (imgs, az, el) in splits.items():
            r = evaluate_state_poses(cfg, state, imgs, az, el)
            row[split] = {k: r[k] for k in
                          ("pose_err_median_deg", "pose_acc_30deg",
                           "best_head_med_deg")}
        rows.append(row)
        print(json.dumps(row), flush=True)
        if best is None or (row["val"]["pose_acc_30deg"]
                            > best[0]["val"]["pose_acc_30deg"]):
            best = (row, state)

    os.makedirs(args.out_dir, exist_ok=True)
    save_params_npz(best[1], os.path.join(args.out_dir, "best_params.npz"))
    record = {"selected_step": best[0]["step"],
              "selector": "val pose_acc_30deg",
              "val": best[0]["val"], "test": best[0]["test"],
              "all": rows}
    with open(os.path.join(args.out_dir, "selection.json"), "w") as f:
        json.dump(record, f, indent=1)
    print(f"selected step {best[0]['step']}: "
          f"val acc30={best[0]['val']['pose_acc_30deg']:.3f}, "
          f"TEST acc30={best[0]['test']['pose_acc_30deg']:.3f} "
          f"median={best[0]['test']['pose_err_median_deg']:.1f}deg")


if __name__ == "__main__":
    main()
