"""Training entry point (SURVEY.md §2 "Train loop", §3.1; L5).

    python -m tpu_unsup_pc.train --preset c1_synth --steps 2000
    python -m tpu_unsup_pc.train --preset c5_rgb_sharded --mesh 8

One jitted (optionally mesh-sharded) train step; host work is only batch
prefetch, metric logging, and async checkpointing. Resume-by-default from
--ckpt-dir (SURVEY §5)."""

from __future__ import annotations

import argparse
import json
import math
import os

import numpy as np

import jax
import jax.numpy as jnp

from tpu_unsup_pc import training
from tpu_unsup_pc.configs import presets
from tpu_unsup_pc.data import make_dataset
from tpu_unsup_pc.parallel import (make_mesh, make_sharded_train_step,
                                   shard_batch)
from tpu_unsup_pc.parallel.mesh import maybe_init_distributed, replicate
from tpu_unsup_pc.utils.checkpoint import CheckpointManager
from tpu_unsup_pc.utils.metrics import (MetricsLogger, ThroughputMeter,
                                        maybe_profile)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="c1_synth", choices=presets.names())
    p.add_argument("--steps", type=int, default=None,
                   help="override cfg.max_steps")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--data-dir", default=None)
    p.add_argument("--dataset", default=None,
                   choices=("synthetic", "shapenet", "tub"),
                   help="override cfg.dataset (tub = native mmap loader)")
    p.add_argument("--ckpt-dir", default=None)
    p.add_argument("--log-dir", default="logs")
    p.add_argument("--mesh", type=int, default=None,
                   help="data-parallel mesh size (devices)")
    p.add_argument("--num-models", type=int, default=256,
                   help="synthetic dataset size")
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--init-partial", action="store_true",
                   help="with --init-params-npz: load params by name and "
                        "leave params absent from the npz at fresh init "
                        "(warm-start a model that grew a head, e.g. "
                        "predict_translation on pose-phase params)")
    p.add_argument("--init-params-npz", default=None,
                   help="warm-start fine-tune: initialize params from a "
                        "save_params_npz export (fresh optimizer state, "
                        "step counter reset to 0). The sigma anneal "
                        "restarts with the step counter — pin it with "
                        "--set sigma_start=/sigma_end= when the source "
                        "run trained past the anneal. Ignored when an "
                        "orbax checkpoint exists in --ckpt-dir (resume "
                        "wins); use a fresh --ckpt-dir for a new branch")
    p.add_argument("--eval-every", type=int, default=0,
                   help="validation-loss cadence in steps (0 = off); uses "
                        "a held-out split at the fixed fine sigma")
    p.add_argument("--eval-batches", type=int, default=4)
    p.add_argument("--pose-eval-every", type=int, default=0,
                   help="relative-pose eval cadence in steps (0 = off); "
                        "predict_pose presets on datasets that expose "
                        "images/azimuth/elevation arrays (synthetic)")
    p.add_argument("--pose-eval-models", type=int, default=64)
    p.add_argument("--pose-eval-split", default="train",
                   choices=("train", "val", "test"),
                   help="dataset split for the in-train pose eval; use "
                        "'val' (unseen shapes) when the eval drives "
                        "best-checkpoint selection")
    p.add_argument("--best-ckpt-metric", default=None,
                   choices=("pose_acc_30deg", "val_loss"),
                   help="track this eval metric and export the best "
                        "state's params to <ckpt-dir>/best_params.npz "
                        "whenever it improves (VERDICT r2: the c3 run "
                        "degraded past its in-train peak with no "
                        "selection mechanism)")
    p.add_argument("--trace-dir", default=None,
                   help="jax.profiler trace output dir")
    p.add_argument("--tensorboard", action="store_true")
    p.add_argument("--use-pallas", action="store_true",
                   help="fused Pallas splat kernel")
    p.add_argument("--set", action="append", dest="overrides", default=[],
                   metavar="KEY=VALUE",
                   help="override any Config field (repeatable); values "
                        "parse as JSON, falling back to string")
    p.add_argument("--ckpt-keep", type=int, default=3,
                   help="checkpoints retained (raise for runs monitored "
                        "at a coarser cadence than ckpt_every*keep steps)")
    p.add_argument("--host-data", action="store_true",
                   help="disable the device-resident dataset fast path "
                        "(synthetic, single-chip): by default the whole "
                        "synthetic dataset lives in HBM and batches are "
                        "gathered on-device, so the per-step host->device "
                        "transfer is 8 indices instead of ~3MB of images "
                        "(the axon tunnel makes per-step transfers cost "
                        "100-300ms)")
    return p.parse_args(argv)


def build_config(args):
    cfg = presets.get(args.preset)
    over = {}
    if args.steps is not None:
        over["max_steps"] = args.steps
    if args.batch_size is not None:
        over["batch_size"] = args.batch_size
    if args.data_dir is not None:
        over["data_dir"] = args.data_dir
    if args.dataset is not None:
        over["dataset"] = args.dataset
    if args.ckpt_dir is not None:
        over["ckpt_dir"] = args.ckpt_dir
    if args.mesh is not None:
        over["mesh_shape"] = (args.mesh,)
    if args.use_pallas:
        over["use_pallas"] = True
    return presets.apply_overrides(cfg.replace(**over), args.overrides)


def main(argv=None):
    args = parse_args(argv)
    maybe_init_distributed()
    cfg = build_config(args)
    n_mesh = int(math.prod(cfg.mesh_shape))
    n_dev = len(jax.devices())
    if n_mesh > n_dev:
        print(f"warning: preset wants a {n_mesh}-chip mesh, only {n_dev} "
              f"device(s) visible — clamping")
        n_mesh = n_dev
        cfg = cfg.replace(mesh_shape=(n_mesh,))
    assert cfg.batch_size % n_mesh == 0, (cfg.batch_size, n_mesh)

    ds_kwargs = {"num_models": args.num_models} \
        if cfg.dataset == "synthetic" else {}
    dataset = make_dataset(cfg, **ds_kwargs)

    ckpt = CheckpointManager(cfg.ckpt_dir, max_to_keep=args.ckpt_keep)
    logger = MetricsLogger(args.log_dir, use_tensorboard=args.tensorboard)
    # durable record of the resolved config — runs are bit-deterministic
    # given (config, seed, data path), so this is what makes a trajectory
    # replayable later (the round-2 c3 recipe had to be recovered from
    # session logs)
    if args.log_dir:
        os.makedirs(args.log_dir, exist_ok=True)
        with open(os.path.join(args.log_dir, "config.json"), "w") as f:
            f.write(cfg.to_json())

    state, start = (None, None)
    if not args.no_resume:
        state, start = ckpt.restore_latest(cfg)
    if state is not None:
        print(f"resumed from step {start}")
    elif args.init_params_npz is not None:
        from tpu_unsup_pc.utils.checkpoint import load_params_npz
        state, src_step = load_params_npz(cfg, args.init_params_npz,
                                          partial=args.init_partial)
        state, start = state.replace(step=0), 0
        print(f"warm-started params from {args.init_params_npz} "
              f"(exported at step {src_step}); fresh optimizer, step 0")
    else:
        state, start = training.init_state(cfg), 0
        print(f"initialized fresh state ({_param_count(state):,} params)")

    mesh = None
    if n_mesh > 1:
        mesh = make_mesh(cfg)
        state = jax.device_put(state, replicate(mesh))
        step_fn = make_sharded_train_step(cfg, mesh)
        print(f"mesh: {mesh.devices.shape} over {mesh.axis_names}")
    else:
        def step_fn(state, batch):
            return training.train_step(cfg, state, batch)

    eval_fn, val_dataset = None, None
    if args.eval_every > 0:
        val_dataset = make_dataset(cfg, split="val", **ds_kwargs)
        if mesh is not None:
            from tpu_unsup_pc.parallel import make_sharded_eval_step
            _ev = make_sharded_eval_step(cfg, mesh)

            def eval_fn(state, batch):
                return _ev(state, shard_batch(batch, mesh))
        else:
            def eval_fn(state, batch):
                return training.eval_step(cfg, state, batch)

    pose_eval = None
    if args.pose_eval_every > 0 and cfg.predict_pose:
        from tpu_unsup_pc.eval_pose import evaluate_state_poses
        if args.pose_eval_split == "train":
            pose_ds = dataset
        else:  # unseen shapes: an unbiased best-checkpoint selector
            pose_ds = make_dataset(
                cfg, split=args.pose_eval_split,
                **{"num_models": args.pose_eval_models}
                if cfg.dataset == "synthetic" else {})
        # every in-repo dataset implements eval_arrays (bounded
        # materialization); a future backend without it must degrade
        # LOUDLY — losing best-checkpoint selection silently costs ~2x
        # on the pose metric (VERDICT r3 weak #4)
        assert hasattr(pose_ds, "eval_arrays"), (
            f"--pose-eval-every: dataset {type(pose_ds).__name__} has no "
            "eval_arrays(n) accessor; in-train pose eval (and "
            "--best-ckpt-metric pose_acc_30deg) cannot run")
        _imgs, _az, _el = pose_ds.eval_arrays(args.pose_eval_models)

        def pose_eval(state):
            r = evaluate_state_poses(cfg, state, _imgs, _az, _el)
            return {"pose_err_median_deg": r["pose_err_median_deg"],
                    "pose_acc_30deg": r["pose_acc_30deg"],
                    "pose_best_head_med_deg": r["best_head_med_deg"]}

    if args.best_ckpt_metric == "pose_acc_30deg" and pose_eval is None:
        raise SystemExit(
            "--best-ckpt-metric pose_acc_30deg needs a running pose eval: "
            "pass --pose-eval-every N on a predict_pose preset")
    if args.best_ckpt_metric == "val_loss" and args.eval_every <= 0:
        raise SystemExit(
            "--best-ckpt-metric val_loss needs --eval-every N")
    # best-checkpoint selection (--best-ckpt-metric): export params as a
    # durable npz whenever the tracked eval metric improves. A resumed run
    # re-seeds the tracker from best.json so a post-resume eval can't
    # clobber best_params.npz with a worse state.
    best = {"value": None}
    if args.best_ckpt_metric and not args.no_resume and start:
        _bj = os.path.join(cfg.ckpt_dir, "best.json")
        if os.path.exists(_bj):
            with open(_bj) as f:
                _prev = json.load(f)
            if _prev.get("metric") == args.best_ckpt_metric:
                best.update(value=_prev["value"], step=_prev["step"])
                print(f"restored best {args.best_ckpt_metric}="
                      f"{_prev['value']:.4g} (step {_prev['step']})",
                      flush=True)

    def track_best(value, step, state):
        hb = args.best_ckpt_metric != "val_loss"   # higher-is-better?
        prev = best["value"]
        if prev is not None and (value <= prev if hb else value >= prev):
            return
        best.update(value=value, step=step)
        from tpu_unsup_pc.utils.checkpoint import save_params_npz
        save_params_npz(state, os.path.join(cfg.ckpt_dir,
                                            "best_params.npz"))
        with open(os.path.join(cfg.ckpt_dir, "best.json"), "w") as f:
            json.dump({"metric": args.best_ckpt_metric,
                       "value": float(value), "step": int(step)}, f)
        print(f"[step {step}] new best {args.best_ckpt_metric}="
              f"{value:.4g} -> best_params.npz", flush=True)

    n_steps = cfg.max_steps - start
    ppv = (cfg.batch_size * (cfg.source_views or cfg.num_views)
           * cfg.num_views * cfg.pc_num_points)
    meter = ThroughputMeter(ppv, n_chips=n_mesh)

    # device-resident dataset fast path: gather the batch in HBM inside
    # the jitted step; the host sends only batch_size int32 indices
    device_data = (not args.host_data and mesh is None
                   and hasattr(dataset, "images"))
    if device_data:
        import functools

        host_data = {
            "image": dataset.images, "mask": dataset.masks,
            "azimuth": dataset.azimuth, "elevation": dataset.elevation}
        if getattr(dataset, "has_distance", False):
            host_data["distance"] = dataset.distance
        if getattr(dataset, "has_quat", False):
            host_data["quat"] = dataset.quat
        data_dev = jax.device_put(host_data)

        @functools.partial(jax.jit, donate_argnums=(1,))
        def _device_step(data, state, idx):
            batch = jax.tree_util.tree_map(lambda a: a[idx], data)
            return training.train_step(cfg, state, batch)

        idx_rng = np.random.default_rng(cfg.seed + 0x5eed)
        n_models = len(dataset)
        if start:
            # fast-forward past the draws a fresh run would have consumed,
            # so a resumed run continues the same index sequence instead of
            # replaying it from the beginning
            idx_rng.integers(0, n_models, size=(start, cfg.batch_size))

        def batches_iter():
            for _ in range(n_steps):
                yield idx_rng.integers(0, n_models, size=cfg.batch_size)

    else:
        def batches_iter():
            return dataset.batches(steps=n_steps)

    with maybe_profile(args.trace_dir):
        meter.start()
        for i, batch in enumerate(batches_iter()):
            if device_data:
                state, metrics = _device_step(data_dev, state,
                                              jnp.asarray(batch))
            else:
                if mesh is not None:
                    batch = shard_batch(batch, mesh)
                else:
                    batch = jax.device_put(batch)
                state, metrics = step_fn(state, batch)
            meter.step()
            step = start + i + 1
            if (step % cfg.log_every == 0 or step == start + 1
                    or step == cfg.max_steps):
                metrics = {k: float(v) for k, v in metrics.items()}
                metrics["points_views_per_sec_per_chip"] = meter.rate(
                    sync_on=metrics_sync(state))
                logger.log(step, metrics)
                meter.start()
            if eval_fn is not None and step % args.eval_every == 0:
                vals = [eval_fn(state, val_dataset.sample_batch())
                        for _ in range(args.eval_batches)]
                val = {f"val_{k}": float(np.mean([float(m[k])
                                                  for m in vals]))
                       for k in vals[0]}
                logger.log(step, val)
                if args.best_ckpt_metric == "val_loss":
                    track_best(val["val_loss"], step, state)
            if pose_eval is not None and step % args.pose_eval_every == 0:
                pm = pose_eval(state)
                logger.log(step, pm)
                if args.best_ckpt_metric == "pose_acc_30deg":
                    track_best(pm["pose_acc_30deg"], step, state)
            if step % cfg.ckpt_every == 0 or step == cfg.max_steps:
                ckpt.save(state, cfg)
    ckpt.wait()
    ckpt.close()  # tear down the async-save thread pool explicitly
    logger.close()
    print("done")
    return state


def metrics_sync(state):
    return jax.tree_util.tree_leaves(state.params)[0]


def _param_count(state):
    return sum(int(np.prod(p.shape))
               for p in jax.tree_util.tree_leaves(state.params))


if __name__ == "__main__":
    main()
