"""Prediction dump (SURVEY.md §3.3, L5): run the trained model over an eval
set and save predicted point clouds (+ pose, + rgb) to npz for
eval_chamfer.

    python -m tpu_unsup_pc.predict --preset c1_synth --ckpt-dir checkpoints \
        --out preds.npz
"""

from __future__ import annotations

import argparse
import os

import numpy as np

import jax.numpy as jnp

from tpu_unsup_pc import training
from tpu_unsup_pc.configs import presets
from tpu_unsup_pc.data import make_dataset
from tpu_unsup_pc.utils.checkpoint import CheckpointManager


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="c1_synth", choices=presets.names())
    p.add_argument("--ckpt-dir", default=None,
                   help="defaults to the preset's cfg.ckpt_dir")
    p.add_argument("--out", default="preds.npz")
    p.add_argument("--num-models", type=int, default=64)
    p.add_argument("--split", default="test")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--dataset", default=None,
                   choices=("synthetic", "shapenet", "tub"))
    p.add_argument("--data-dir", default=None)
    p.add_argument("--all-views", action="store_true",
                   help="encode every view (for relative-pose eval), not "
                        "just view 0")
    p.add_argument("--mesh", type=int, default=None,
                   help="shard prediction batches over an N-device mesh "
                        "(BASELINE config 5)")
    p.add_argument("--refine-steps", type=int, default=0,
                   help="test-time pose refinement: gradient steps per "
                        "view against its own mask through the renderer "
                        "(unknown-pose presets only; adds pred_pose_refined"
                        "/_refined_student arrays — see refine.py)")
    p.add_argument("--refine-lr", type=float, default=0.03)
    p.add_argument("--refine-sigma", type=float, default=None,
                   help="render sigma during refinement "
                        "(default: cfg.sigma_end)")
    p.add_argument("--refine-sigma-end", type=float, default=None,
                   help="anneal refinement sigma linearly to this value "
                        "(default: constant at --refine-sigma)")
    p.add_argument("--refine-rgb-weight", type=float, default=1.0,
                   help="weight of masked color SSE in the refinement/"
                        "selection evidence (RGB models only; color is "
                        "flip-discriminative where silhouettes are not; "
                        "0 disables RGB evidence)")
    p.add_argument("--refine-guard-deg", type=float, default=15.0,
                   help="trust-region gate: adds pred_pose_guarded = "
                        "refined student where it moved <= this many "
                        "degrees from the raw student, else raw (keeps "
                        "the within-basin median gain without the flip-"
                        "basin walks; val-select per model — 15 for "
                        "c3rgb_phase4, 10 for c3rgb_sharp, see "
                        "refine.guard_poses + docs/pose_training.md). "
                        "0 disables")
    p.add_argument("--refine-mode", default="cross",
                   choices=("cross", "self"),
                   help="evidence for refinement/selection: cross = other "
                        "views' clouds into this view's mask (detects "
                        "symmetry flips; needs --all-views), self = own "
                        "cloud only")
    p.add_argument("--poses-only", action="store_true",
                   help="omit point clouds (pred_points/pred_rgb/gt_points) "
                        "from the output npz — the distillation pose dump "
                        "over a large train split only needs the pose "
                        "arrays, not ~500MB of clouds")
    p.add_argument("--params-npz", default=None,
                   help="load params from a tools/export_params.py .npz "
                        "instead of an orbax checkpoint (the durable "
                        "committed artifacts under runs/)")
    p.add_argument("--set", action="append", dest="overrides", default=[],
                   metavar="KEY=VALUE",
                   help="override any Config field (repeatable, same "
                        "syntax as train.py --set); must match the "
                        "checkpoint's training config for fields that "
                        "change the param structure, e.g. predict_scale")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    cfg = presets.apply_overrides(presets.get(args.preset), args.overrides)
    if args.dataset is not None:
        cfg = cfg.replace(dataset=args.dataset)
    if args.data_dir is not None:
        cfg = cfg.replace(data_dir=args.data_dir)
    ds_kwargs = {"num_models": args.num_models} \
        if cfg.dataset == "synthetic" else {}
    dataset = make_dataset(cfg, split=args.split, **ds_kwargs)

    if args.params_npz is not None:
        from tpu_unsup_pc.utils.checkpoint import load_params_npz
        state, step = load_params_npz(cfg, args.params_npz)
    else:
        ckpt_dir = cfg.ckpt_dir if args.ckpt_dir is None else args.ckpt_dir
        ckpt = CheckpointManager(ckpt_dir)
        state, step = ckpt.restore_latest(cfg)
        if state is None:
            raise SystemExit(f"no checkpoint found in {ckpt_dir}")
    print(f"predicting with step-{step} checkpoint")

    step_fn = None
    if args.mesh is not None and args.mesh > 1:
        import jax
        from tpu_unsup_pc.parallel import (make_mesh, batch_sharding,
                                           make_sharded_predict_step)
        from tpu_unsup_pc.parallel.mesh import replicate
        cfg = cfg.replace(mesh_shape=(args.mesh,))
        mesh = make_mesh(cfg)
        state = jax.device_put(state, replicate(mesh))
        sharded = make_sharded_predict_step(cfg, mesh)
        bsh = batch_sharding(mesh)

        def step_fn(images):
            return sharded(state, jax.device_put(images, bsh))
        assert args.batch_size % args.mesh == 0, (args.batch_size,
                                                  args.mesh)
        print(f"predicting over a {mesh.devices.shape} mesh")

    n = min(args.num_models, len(dataset))
    preds, poses, rgbs, azs, els = [], [], [], [], []
    dists, offs = [], []
    ref_best, ref_student = [], []
    for i in range(0, n, args.batch_size):
        idx = np.arange(i, min(i + args.batch_size, n))
        batch = dataset.get_batch(idx)
        images = batch["image"] if args.all_views else batch["image"][:, 0]
        masks = batch["mask"] if args.all_views else batch["mask"][:, 0]
        if step_fn is not None:
            # pad the tail batch to the full (mesh-divisible) size, trim
            # the outputs back after
            pad = args.batch_size - images.shape[0]
            if pad:
                images = np.concatenate(
                    [images, np.repeat(images[-1:], pad, axis=0)])
            out = step_fn(jnp.asarray(images))
            if pad:
                out = jax.tree_util.tree_map(lambda x: x[:-pad], out)
        else:
            out = training.predict_step(cfg, state, jnp.asarray(images))
        preds.append(np.asarray(out.cloud.points))
        if out.cloud.rgb is not None:
            rgbs.append(np.asarray(out.cloud.rgb))
        if out.pose is not None:
            poses.append(np.asarray(out.pose.student))
            azs.append(batch["azimuth"])
            els.append(batch["elevation"])
            if "distance" in batch:
                dists.append(batch["distance"])
            if out.pose.trans_offset is not None:
                offs.append(np.asarray(out.pose.trans_offset))
            if args.refine_steps > 0:
                from tpu_unsup_pc.refine import refine_output_poses
                ref = refine_output_poses(
                    cfg, out, jnp.asarray(masks),
                    (jnp.asarray(images)
                     if out.cloud.rgb is not None
                     and args.refine_rgb_weight > 0 else None),
                    steps=args.refine_steps,
                    lr=args.refine_lr, sigma=args.refine_sigma,
                    sigma_end=args.refine_sigma_end,
                    mode=args.refine_mode if args.all_views else "self",
                    rgb_w=args.refine_rgb_weight)
                ref_best.append(np.asarray(ref["refined_best"]))
                ref_student.append(np.asarray(ref["refined_student"]))
    arrays = {}
    if not args.poses_only:
        arrays["pred_points"] = np.concatenate(preds)
        if rgbs:
            arrays["pred_rgb"] = np.concatenate(rgbs)
    if poses:
        arrays["pred_pose"] = np.concatenate(poses)
        arrays["gt_azimuth"] = np.concatenate(azs)
        arrays["gt_elevation"] = np.concatenate(els)
        if dists:
            arrays["gt_distance"] = np.concatenate(dists)
        if offs:
            # per-candidate distance offsets (B, V, K): head selection is
            # evidence-based — see tools/trans_probe.py
            arrays["pred_trans_offset"] = np.concatenate(offs)
    if ref_best:
        arrays["pred_pose_refined"] = np.concatenate(ref_best)
        arrays["pred_pose_refined_student"] = np.concatenate(ref_student)
        if args.refine_guard_deg > 0:
            from tpu_unsup_pc.refine import guard_poses
            guarded, frac = guard_poses(arrays["pred_pose"],
                                        arrays["pred_pose_refined_student"],
                                        args.refine_guard_deg)
            arrays["pred_pose_guarded"] = np.asarray(guarded)
            print(f"guard {args.refine_guard_deg:g}deg: accepted "
                  f"{frac:.1%} of refinements")
    if hasattr(dataset, "gt_points") and not args.poses_only:
        arrays["gt_points"] = dataset.gt_points[:n]
    out_dir = os.path.dirname(os.path.abspath(args.out))
    os.makedirs(out_dir, exist_ok=True)  # don't lose an hour of TPU
    np.savez_compressed(args.out, **arrays)
    print(f"wrote {args.out}: " +
          ", ".join(f"{k} {v.shape}" for k, v in arrays.items()))


if __name__ == "__main__":
    main()
