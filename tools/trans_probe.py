"""Translation-head probe: does the pose ensemble's evidence-selected
distance offset track the GT camera distance?

The unknown-pose branch never sees GT distances (models/losses.py renders
candidates at cfg.camera_distance + trans_offset), so if the selected
candidate's offset CORRELATES with the held-out views' true jittered
distances, the head has genuinely learned translation from silhouette
evidence alone — the capability VERDICT r2 weak #7 asked to prove.

Selection mirrors eval-time refinement (refine.refine_output_poses with
steps=0): each candidate head (and the student at zero offset) is scored
by cross-view silhouette SSE at its OWN predicted distance; the min-SSE
head's offset is the prediction for that view.

Prints ONE JSON line:
  {"corr": Pearson r(selected offset, gt_distance - camera_distance),
   "mae_dist": mean |predicted - gt| distance (selected head),
   "mae_const": mean |camera_distance - gt| (no-translation baseline),
   "offset_std": spread of selected offsets, "n_views": count}

Usage:
  python tools/trans_probe.py --preset c3_synth --params-npz P.npz \
      --set synth_dist_jitter=0.1 --set predict_translation=True \
      --num-models 64 --split test
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="c3_synth")
    p.add_argument("--params-npz", required=True)
    p.add_argument("--num-models", type=int, default=64)
    p.add_argument("--split", default="test")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--sigma", type=float, default=None,
                   help="render sigma for SSE scoring (default sigma_end)")
    p.add_argument("--set", action="append", dest="overrides", default=[],
                   metavar="KEY=VALUE")
    args = p.parse_args()

    import jax.numpy as jnp

    from tpu_unsup_pc import training
    from tpu_unsup_pc.configs.presets import apply_overrides, get
    from tpu_unsup_pc.data import make_dataset
    from tpu_unsup_pc.refine import refine_output_poses
    from tpu_unsup_pc.utils.checkpoint import load_params_npz

    cfg = apply_overrides(get(args.preset), args.overrides).validate()
    assert cfg.predict_pose and cfg.predict_translation, (
        "probe needs predict_pose=True and predict_translation=True")
    assert cfg.synth_dist_jitter > 0, (
        "probe needs synth_dist_jitter > 0 — with fixed distances there "
        "is no translation signal to measure")
    state, _ = load_params_npz(cfg, args.params_npz)
    ds = make_dataset(cfg, split=args.split, num_models=args.num_models)

    K = cfg.pose_candidates
    sel_off, gt_dist = [], []
    n = min(args.num_models, len(ds))
    for i in range(0, n, args.batch_size):
        idx = np.arange(i, min(i + args.batch_size, n))
        batch = ds.get_batch(idx)
        out = training.predict_step(cfg, state, jnp.asarray(batch["image"]))
        ref = refine_output_poses(
            cfg, out, jnp.asarray(batch["mask"]), steps=0,
            sigma=args.sigma, mode="cross")
        # candidates 0..K-1 carry offsets, init K is the student (offset 0)
        sse = np.asarray(ref["refined_sse"])[..., :K]        # (B,V,K)
        off = np.asarray(out.pose.trans_offset)              # (B,V,K)
        best = np.argmin(sse, axis=-1)
        sel_off.append(np.take_along_axis(off, best[..., None],
                                          axis=-1)[..., 0])
        gt_dist.append(batch["distance"])
    sel_off = np.concatenate(sel_off).ravel()
    gt_dist = np.concatenate(gt_dist).ravel()
    gt_off = gt_dist - cfg.camera_distance
    corr = float(np.corrcoef(sel_off, gt_off)[0, 1])
    print(json.dumps({
        "corr": round(corr, 4),
        "mae_dist": round(float(np.mean(np.abs(sel_off - gt_off))), 4),
        "mae_const": round(float(np.mean(np.abs(gt_off))), 4),
        "offset_std": round(float(np.std(sel_off)), 4),
        "gt_off_std": round(float(np.std(gt_off)), 4),
        "n_views": int(sel_off.size),
    }))


if __name__ == "__main__":
    main()
