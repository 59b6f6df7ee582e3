"""Headline benchmark (BASELINE.json:2): points*views/sec/chip for the
differentiable projector, forward + backward (splat -> smooth -> project ->
MSE -> grad w.r.t. points), at BASELINE config-1 shapes (64^3 grid, 2k
points, batchxviews = 8x5).

Baseline: the reference is unmeasurable (empty mount, SURVEY.md §0/§6), so
per BASELINE.md the stand-in is the frozen torch-CPU oracle at identical
shapes. vs_baseline = our_throughput / oracle_throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

B, V, N, D = 8, 5, 2000, 64
SIGMA = 1.0
ITERS = 20
REPEATS = 3       # best-of-3 timed loops (VERDICT r4 weak #3: on a shared
                  # tunnel a single loop can't distinguish contention from
                  # regression; the JSON reports best + worst + cv)
ORACLE_ITERS = 3  # best-of-3 (the stand-in baseline shouldn't be noisy)

# v5e per-chip MXU peak for the MFU denominator (documented in BASELINE.md):
# 197 TFLOP/s at bf16 / default-precision matmul inputs — the mode the
# fused kernels run in (f32 operands, default dot precision). MFU counts
# the kernels' own matmul cost model (fused_mse_train_flops), not VPU exps.
V5E_PEAK_FLOPS = 197e12

# Pinned stand-in baseline (VERDICT r2 weak #2: the live oracle re-measure
# drifts with host load on the 1-core machine, making vs_baseline
# incomparable across rounds). This is the round-1 best-of-3 measurement
# of the frozen torch-CPU oracle at the shapes above, recorded in
# BASELINE.md and BASELINE.json ("oracle_standin_points_views_per_sec").
# vs_baseline uses this constant; the live re-measure is reported
# separately as oracle_live / vs_oracle_live.
PINNED_ORACLE = 43000.0


def bench_jax(use_pallas: bool = True) -> dict:
    """Time the projector fwd+bwd exactly as the train loop drives it: all
    B*V pairs flattened through project_pointclouds_batched (Pallas fused
    splat kernel when available)."""
    import jax
    import jax.numpy as jnp
    from tpu_unsup_pc.configs import presets
    from tpu_unsup_pc.models.losses import _gt_cameras, _render_pairs
    from tpu_unsup_pc.ops.project import (fused_render_available,
                                          render_sse_fused)

    cfg = presets.get("c1_synth").replace(use_pallas=use_pallas)
    rng = np.random.default_rng(0)
    points = jnp.asarray(rng.uniform(-0.4, 0.4, size=(B, N, 3)), jnp.float32)
    masks = jnp.asarray(rng.uniform(size=(B, V, cfg.vox_size, cfg.vox_size))
                        > 0.5, jnp.float32)
    batch = {"azimuth": jnp.asarray(rng.uniform(0, 6.28, (B, V)),
                                    jnp.float32),
             "elevation": jnp.asarray(rng.uniform(-0.3, 0.9, (B, V)),
                                      jnp.float32)}
    cams = _gt_cameras(cfg, batch)

    def loss_fn(pts):
        # all-pairs multi-view consistency, exactly like compute_loss:
        # every per-view cloud renders into every view -> B*V*V pairs
        if fused_render_available(cfg, has_rgb=False):
            # training fast path: fused render+MSE (sil never leaves VMEM)
            src = jnp.broadcast_to(pts[:, None], (B, V, N, 3))
            sse = render_sse_fused(
                src, cams.quat[:, :, None], cams.distance[:, :, None],
                jnp.full((B, V), SIGMA, jnp.float32), masks, cfg)[..., 0]
            return jnp.mean(sse) / (cfg.vox_size ** 2)
        P = B * V * V
        pts_f = jnp.broadcast_to(pts[:, None, None], (B, V, V, N, 3)
                                 ).reshape(P, N, 3)
        sigma_f = jnp.full((P,), SIGMA, jnp.float32)
        quat_f = jnp.broadcast_to(cams.quat[:, None], (B, V, V, 4)
                                  ).reshape(P, 4)
        dist_f = jnp.broadcast_to(cams.distance[:, None], (B, V, V)
                                  ).reshape(P)
        sils, _ = _render_pairs(cfg, pts_f, None, sigma_f, quat_f, dist_f)
        sils = sils.reshape(B, V, V, *sils.shape[-2:])
        return jnp.mean((sils - masks[:, None]) ** 2)

    step = jax.jit(jax.grad(loss_fn))
    # sync by fetching a scalar: through the axon tunnel,
    # block_until_ready can return before the program finishes when
    # nothing has been fetched yet (see CLAUDE.md timing note)
    float(step(points)[0, 0, 0])              # compile + warm
    dts = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            g = step(points)
        float(g[0, 0, 0])
        dts.append((time.perf_counter() - t0) / ITERS)
    best, worst = min(dts), max(dts)
    cv = float(np.std(dts) / np.mean(dts))
    n_chips = 1  # bench runs on the single real chip
    # rate of (point, view)-pair renders: B*V^2 pairs per step (all-pairs
    # loss, same as training); the oracle renders B*V pairs — both are
    # rates of the identical projector op, so the ratio is fair
    rate = lambda dt: (B * V * V * N) / dt / n_chips  # noqa: E731
    out = {"value": rate(best), "value_worst": rate(worst),
           "cv": round(cv, 4)}
    if use_pallas and fused_render_available(cfg, has_rgb=False):
        # MFU from the kernels' own matmul cost model (single source:
        # render_kernel.fused_mse_train_flops); N pads to the chunk size
        from tpu_unsup_pc.ops.pallas.render_kernel import \
            fused_mse_train_flops
        n_pad = N + ((-N) % cfg.point_chunk)
        flops = fused_mse_train_flops(B * V * V, n_pad, cfg.vox_size)
        out["tflops"] = round(flops / best / 1e12, 2)
        out["mfu"] = round(flops / best / V5E_PEAK_FLOPS, 4)
    return out


def bench_oracle() -> float:
    import torch
    from oracle import torch_oracle as O

    rng = np.random.default_rng(0)
    points = torch.tensor(rng.uniform(-0.4, 0.4, size=(B, N, 3)),
                          dtype=torch.float32, requires_grad=True)
    masks = torch.tensor(
        (rng.uniform(size=(B, V, D, D)) > 0.5).astype(np.float32))
    azel = rng.uniform(0, 6.28, (B, V)), rng.uniform(-0.3, 0.9, (B, V))
    quats = [[O.quat_from_azel(azel[0][b, v], azel[1][b, v],
                               dtype=torch.float32)
              for v in range(V)] for b in range(B)]

    def run_once():
        loss = 0.0
        for b in range(B):
            for v in range(V):
                sil, _ = O.project_pointcloud(
                    points[b], quats[b][v], 2.0, 1.875, D, 1.2,
                    SIGMA, radius=5)
                loss = loss + torch.mean((sil - masks[b, v]) ** 2)
        (loss / (B * V)).backward()
        points.grad = None

    run_once()                                 # warm
    best = float("inf")
    for _ in range(ORACLE_ITERS):
        t0 = time.perf_counter()
        run_once()
        best = min(best, time.perf_counter() - t0)
    return (B * V * N) / best


def _which_path(cfg) -> str:
    """Name the render path bench_jax actually exercises (BENCH honesty,
    VERDICT r3 weak #3: a silent XLA fallback must be visible in the
    artifact, not report a plausible-looking slow number untagged)."""
    from tpu_unsup_pc.ops.project import fused_render_available
    if not fused_render_available(cfg, has_rgb=False):
        return "xla"
    return "pallas_onepass" if cfg.pallas_onepass else "pallas"


def main():
    import sys
    import traceback

    from tpu_unsup_pc.configs import presets

    try:
        res = bench_jax(use_pallas=True)
        path = _which_path(presets.get("c1_synth").replace(use_pallas=True))
    except Exception:
        # the fallback must be LOUD: print the Pallas failure to stderr and
        # tag the JSON so BENCH_r0N can't silently change meaning
        print("bench: Pallas path FAILED, falling back to XLA:",
              file=sys.stderr)
        traceback.print_exc()
        res = bench_jax(use_pallas=False)
        path = "xla_fallback"
    if isinstance(res, (int, float)):          # test monkeypatch convenience
        res = {"value": float(res)}
    ours = res["value"]
    try:
        base = bench_oracle()
    except Exception:
        base = float("nan")
    live = round(ours / base, 2) if base == base else None
    print(json.dumps({
        "metric": "projector_fwd_bwd_points_views_per_sec_per_chip",
        "value": round(ours, 1),
        "unit": "points*views/s/chip (64^3 grid, 2k pts, B8xV5)",
        "vs_baseline": round(ours / PINNED_ORACLE, 2),
        "path": path,
        # contention visibility (best-of-3 loops): worst-loop rate + cv
        "value_worst": round(res["value_worst"], 1)
        if "value_worst" in res else None,
        "cv": res.get("cv"),
        # MFU accounting: achieved MXU FLOP/s from the kernels' own cost
        # model / V5E_PEAK_FLOPS (assumptions at the constant above)
        "tflops": res.get("tflops"),
        "mfu": res.get("mfu"),
        "oracle_live": round(base, 1) if base == base else None,
        "vs_oracle_live": live,
    }))


if __name__ == "__main__":
    main()
