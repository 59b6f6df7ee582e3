"""End-to-end step-time attribution (VERDICT r2 weak #3: the e2e-vs-
projector-bench gap was unattributed). Times the full train step and its
components separately on-device, so the non-projector time decomposes into
nets / render / optimizer / dispatch instead of one opaque number.

    python tools/e2e_profile.py --preset c1_synth [--trace-dir /tmp/tr]

Components (all jitted, block_until_ready-timed, best-of-N):
  full           train_step (fwd + bwd + optimizer), device-resident batch
  loss_grad      value_and_grad(loss_and_metrics) only (no optimizer)
  model_fwd      encoder+decoder forward
  model_fwd_bwd  encoder+decoder forward + backward (cheap scalar head)
  render_grad    fused render+MSE VALUE_AND_grad alone at the same pair
                 shapes — value_and_grad, not grad: under grad-only XLA
                 dead-code-eliminates the forward kernel (the custom VJP
                 rematerializes in-kernel), which is NOT what training
                 executes; the r3 "loss_glue" mis-attribution came from
                 exactly that (see docs/profile_r3.md addendum)
  optimizer      apply_gradients alone
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _sync(out):
    """True device sync: fetch one scalar element of the first output leaf.
    (block_until_ready through the axon tunnel returns before the program
    finishes — measured 0.3ms for a 150ms step; a host fetch of a value
    data-dependent on the program cannot lie.)"""
    import jax
    import jax.numpy as jnp
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.ravel(leaf)[0])


def _time(fn, *args, iters=20, warmup=2):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="c1_synth")
    p.add_argument("--use-pallas", action="store_true", default=True)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--set", action="append", default=[], dest="overrides",
                   metavar="KEY=VALUE",
                   help="config overrides, e.g. --set predict_rgb=True "
                        "(same syntax as train.py)")
    p.add_argument("--trace-dir", default=None,
                   help="also capture a jax.profiler trace of 5 full steps")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from tpu_unsup_pc import training
    from tpu_unsup_pc.configs import presets
    from tpu_unsup_pc.models.losses import _gt_cameras
    from tpu_unsup_pc.ops.project import render_sse_fused

    cfg = presets.get(args.preset).replace(use_pallas=args.use_pallas)
    cfg = presets.apply_overrides(cfg, args.overrides)
    B, V, N = cfg.batch_size, cfg.num_views, cfg.pc_num_points
    S = cfg.source_views or V
    rng = np.random.default_rng(0)
    H = cfg.image_size
    batch = jax.device_put({
        "image": jnp.asarray(rng.uniform(size=(B, V, H, H, 3)), jnp.float32),
        "mask": jnp.asarray(rng.uniform(size=(B, V, H, H)) > 0.5,
                            jnp.float32),
        "azimuth": jnp.asarray(rng.uniform(0, 6.28, (B, V)), jnp.float32),
        "elevation": jnp.asarray(rng.uniform(-0.3, 0.9, (B, V)),
                                 jnp.float32)})
    state = training.init_state(cfg)
    res = {}

    # full step (no donation so the same state can be reused per iter —
    # donation saves an alloc, not host time; difference is in the noise)
    full_step = jax.jit(lambda s, b: training.train_step.__wrapped__(
        cfg, s, b))
    res["full"] = _time(full_step, state, batch, iters=args.iters)

    lg = jax.jit(lambda p_, b: jax.value_and_grad(
        training.loss_and_metrics, argnums=1, has_aux=True)(
            cfg, p_, b, jnp.asarray(0)))
    res["loss_grad"] = _time(lg, state.params, batch, iters=args.iters)

    model = training.make_model(cfg)
    fwd = jax.jit(lambda p_, im: model.apply({"params": p_}, im))
    res["model_fwd"] = _time(fwd, state.params, batch["image"],
                             iters=args.iters)

    fwd_bwd = jax.jit(jax.grad(lambda p_, im: jnp.sum(
        model.apply({"params": p_}, im).cloud.points)))
    res["model_fwd_bwd"] = _time(fwd_bwd, state.params, batch["image"],
                                 iters=args.iters)

    cams = _gt_cameras(cfg, batch)
    pts = jnp.asarray(rng.uniform(-0.4, 0.4, (B, S, N, 3)), jnp.float32)
    sig = jnp.full((B, S), 1.0, jnp.float32)

    # Pair shapes exactly as the loss drives them: the pose ensemble
    # renders K candidates per (source, target) pair — quats (B, V, K, 4)
    # — while known pose has K=1. The candidate axis multiplies the
    # kernel's flat pair count P = B*S*V*K.
    K = cfg.pose_candidates if cfg.predict_pose else 1
    if cfg.predict_pose:
        q = rng.normal(size=(B, V, K, 4)).astype(np.float32)
        quats = jnp.asarray(q / np.linalg.norm(q, axis=-1, keepdims=True))
        dists = jnp.full((B, V, K), cfg.camera_distance, jnp.float32)
    else:
        quats = cams.quat[:, :, None]
        dists = cams.distance[:, :, None]

    # Time the SAME fused kernel the loss path uses — the RGB variant for
    # predict_rgb presets (r3 fix: timing the sil-only kernel at c5 shapes
    # misattributed the RGB kernel's extra cost to "loss_glue"), and for
    # the pose ensemble the NO-ct two-kernel RGB op (argmin-dependent
    # cotangents exclude the ct one-pass kernel — render_kernel.py
    # contract; the gate for VERDICT r4 missing #5 is this share).
    if cfg.predict_rgb:
        from tpu_unsup_pc.ops.project import render_sse_rgb_fused
        cols = jnp.asarray(rng.uniform(0, 1, (B, S, N, 3)), jnp.float32)
        if cfg.predict_pose:
            def render_loss(pts_, cols_):
                sse = render_sse_rgb_fused(
                    pts_, cols_, quats, dists, sig, batch["mask"],
                    batch["image"], cfg)          # no ct -> two-kernel
                return jnp.mean(sse)
        else:
            # ct routes through the one-pass kernel exactly like the
            # known-pose c5 loss (loss written as sum(ct * sse))
            ct = jnp.full((B, S, V, 1, 2), 0.1, jnp.float32)

            def render_loss(pts_, cols_):
                sse = render_sse_rgb_fused(
                    pts_, cols_, quats, dists, sig, batch["mask"],
                    batch["image"], cfg, ct=ct)
                return jnp.sum(sse * ct)

        render_args = (pts, cols)
    else:
        def render_loss(pts_):
            sse = render_sse_fused(pts_, quats, dists, sig,
                                   batch["mask"], cfg)
            return jnp.mean(sse)

        render_args = (pts,)

    if cfg.use_pallas:
        rg = jax.jit(jax.value_and_grad(render_loss))
        res["render_grad"] = _time(rg, *render_args, iters=args.iters)

    _, example_grads = jax.jit(lambda p_, b: jax.value_and_grad(
        training.loss_and_metrics, argnums=1, has_aux=True)(
            cfg, p_, b, jnp.asarray(0)))(state.params, batch)
    opt = jax.jit(lambda s, g: s.apply_gradients(grads=g))
    res["optimizer"] = _time(opt, state, example_grads, iters=args.iters)

    if args.trace_dir:
        with jax.profiler.trace(args.trace_dir):
            s = state
            for _ in range(5):
                s, m = full_step(s, batch)
            jax.block_until_ready(s.params)

    ppv = B * S * V * N
    # MFU from the kernels' own matmul cost model (single source:
    # render_kernel.fused_*_train_flops; peak assumption documented at
    # bench.V5E_PEAK_FLOPS / BASELINE.md). kernel_mfu divides by the
    # render_grad time (the fused-kernel launch alone), e2e_mfu by the
    # full step — the product of kernel share and kernel MFU.
    mfu = {}
    if cfg.use_pallas and "render_grad" in res:
        import bench
        from tpu_unsup_pc.ops.pallas.render_kernel import (
            auto_band, fused_mse_train_flops, fused_rgb_mse_train_flops)
        from tpu_unsup_pc.ops.splat import static_gauss_radius
        P_pairs = B * S * V * K
        n_pad = N + ((-N) % cfg.point_chunk)
        if cfg.predict_rgb:
            mode = "twokernel" if not cfg.pallas_onepass else (
                "onepass2" if cfg.predict_pose else "onepass_ct")
            flops = fused_rgb_mse_train_flops(P_pairs, n_pad,
                                              cfg.vox_size, mode)
        else:
            radius = static_gauss_radius(max(cfg.sigma_start,
                                             cfg.sigma_end))
            band = cfg.pallas_band if cfg.pallas_band > 0 else (
                auto_band(radius)
                if cfg.pallas_band < 0 and cfg.vox_size >= 192 else 0)
            flops = fused_mse_train_flops(P_pairs, n_pad, cfg.vox_size,
                                          band)
        mfu = {"kernel_tflops": round(flops / res["render_grad"] / 1e12, 2),
               "kernel_mfu": round(flops / res["render_grad"]
                                   / bench.V5E_PEAK_FLOPS, 4),
               "e2e_mfu": round(flops / res["full"]
                                / bench.V5E_PEAK_FLOPS, 4)}
    report = {
        "preset": args.preset, "shapes": {"B": B, "S": S, "V": V, "K": K,
                                          "N": N, "D": cfg.vox_size},
        "ms": {k: round(v * 1e3, 3) for k, v in res.items()},
        "e2e_points_views_per_sec": round(ppv / res["full"], 1),
        **mfu,
        "attribution_ms": {
            "render": round(res.get("render_grad", float("nan")) * 1e3, 3),
            "nets_bwd": round(res["model_fwd_bwd"] * 1e3, 3),
            "optimizer": round(res["optimizer"] * 1e3, 3),
            "loss_glue": round((res["loss_grad"] - res["model_fwd_bwd"]
                                - res.get("render_grad", 0.0)) * 1e3, 3),
            "step_overhead": round((res["full"] - res["loss_grad"]
                                    - res["optimizer"]) * 1e3, 3),
        },
    }
    line = json.dumps(report, indent=1)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
