"""Test-time pose refinement for the unknown-pose setting (SURVEY.md §3.3:
the eval pipeline's "pose-alignment step for the unknown-pose setting").

The pose regressor gives one shot per view; this module spends a few dozen
gradient steps per test image polishing that shot against observable
evidence — silhouettes — through the SAME differentiable renderer training
used. Because `world_to_grid_soa` runs in plain JAX in front of the fused
Pallas render+SSE kernel, camera-rotation gradients ride the kernel's
analytic coordinate Jacobians for free: each refinement step is ONE
one-pass kernel launch for the whole (view × init × source) pair block.

Two evidence modes:

- "self": view v's own decoded cloud vs view v's own mask. Polishes
  within-basin error but CANNOT detect symmetry flips — training makes
  (cloud_v, pose_v) self-consistent, so a flipped pose renders its own
  co-adapted cloud onto the mask just fine.
- "cross": every OTHER view's cloud (same model ⇒ same canonical frame)
  rendered under view v's candidate into view v's mask — the eval-time
  analogue of training's source-aggregated teacher selection
  (models/losses.py). A view-local flip misrenders the other views'
  clouds, so cross-view SSE separates the basins that the relative-pose
  metric counts as misses. (A coherent all-views flip is a canonical-frame
  gauge change and cancels in the metric anyway.)

Every candidate head (plus the student) seeds an independent refinement,
so basin selection happens AFTER local optimization, on the final SSE.
Sigma can anneal within the refinement (coarse→fine, like training).

TPU shape discipline: the (sources × views × inits) problem is flattened
into the renderer's standard pair axes, the optimizer loop is a `lax.scan`
(static trip count), and each refine call is one jit — no per-step
dispatch through the tunnel.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from tpu_unsup_pc.ops.camera import Camera
from tpu_unsup_pc.ops.project import (fused_render_available,
                                      project_pointclouds_batched,
                                      render_sse_fused,
                                      render_sse_rgb_fused)
from tpu_unsup_pc.utils.config import Config


def _pair_sse_multi(cfg: Config, points, quats, dists, sigma, masks,
                    rgb=None, images=None, rgb_w: float = 1.0,
                    value_only: bool = False):
    """Multi-source SSE: every source cloud rendered into every (target
    view, init) pair. points (B,S,N,3), quats (B,V,C,4), dists (B,V,C),
    sigma (B,S), masks (B,V,H,W) -> (B,S,V,C). With rgb (B,S,N,3) +
    images (B,V,H,W,3), the per-pair evidence becomes
    sil_SSE + rgb_w * masked_RGB_SSE — color evidence discriminates the
    silhouette flip basins the same way training's RGB teacher selection
    does. Fast path: the fused render+SSE kernels (silhouettes/images
    never leave VMEM); fallback: the batched XLA projector."""
    use_rgb = rgb is not None and images is not None
    if fused_render_available(cfg, has_rgb=use_rgb):
        if use_rgb:
            sse = render_sse_rgb_fused(points, rgb, quats, dists, sigma,
                                       masks, images, cfg,
                                       value_only=value_only)
            return sse[..., 0] + rgb_w * sse[..., 1]
        return render_sse_fused(points, quats, dists, sigma, masks, cfg)
    B, S = points.shape[:2]
    V, C = quats.shape[1:3]
    shape = (B, S, V, C)

    def flat(x):
        tail = x.shape[4:]
        return jnp.broadcast_to(x, shape + tail).reshape((-1,) + tail)

    cams = Camera(quat=flat(quats[:, None]),
                  distance=flat(dists[:, None]),
                  focal=jnp.full((B * S * V * C,), cfg.focal_length,
                                 jnp.float32))
    out = project_pointclouds_batched(
        flat(points[:, :, None, None]), cams,
        flat(sigma[:, :, None, None]), cfg,
        rgb=flat(rgb[:, :, None, None]) if use_rgb else None)
    HW = masks.shape[-2:]
    sils = out.silhouette.reshape(B, S, V, C, *HW)
    sse = jnp.sum((sils - masks[:, None, :, None]) ** 2, axis=(-2, -1))
    if use_rgb:
        imgs = out.rgb_image.reshape(B, S, V, C, *HW, 3)
        diff2 = jnp.sum((imgs - images[:, None, :, None]) ** 2, axis=-1)
        sse = sse + rgb_w * jnp.sum(
            diff2 * masks[:, None, :, None], axis=(-2, -1))
    return sse


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "steps", "lr", "sigma", "sigma_end", "rgb_w"))
def refine_quats_multi(cfg: Config, points: jnp.ndarray,
                       init_quats: jnp.ndarray, masks: jnp.ndarray,
                       src_w: Optional[jnp.ndarray] = None,
                       dists: Optional[jnp.ndarray] = None,
                       rgb: Optional[jnp.ndarray] = None,
                       images: Optional[jnp.ndarray] = None, *,
                       steps: int = 60, lr: float = 0.03,
                       sigma: Optional[float] = None,
                       sigma_end: Optional[float] = None,
                       rgb_w: float = 1.0):
    """Adam-refine C candidate rotations per (model, view) against
    src_w-weighted multi-source silhouette evidence.

    Args:
      points: (B, S, N, 3) source clouds (world/canonical frame).
      init_quats: (B, V, C, 4) initial rotations per target view.
      masks: (B, V, H, W) observed silhouettes.
      src_w: (S, V) source→target evidence weights (default all-ones);
        e.g. 1-eye for cross-view-only evidence.
      dists: (B, V, C) camera distances; defaults to cfg.camera_distance.
      rgb: optional (B, S, N, 3) per-point colors; with `images`, adds
        rgb_w-weighted masked color SSE to the evidence (flip-
        discriminative where silhouettes are not).
      images: optional (B, V, H, W, 3) observed images.
      steps: refinement steps (static — the loop is a lax.scan).
      lr: Adam learning rate on the raw (unnormalized) quaternion.
      sigma: render sigma at step 0 (default cfg.sigma_end — what the
        cloud was trained to look like at the end of annealing).
      sigma_end: render sigma at the last step (default: sigma, i.e.
        constant); linear anneal in between, coarse→fine like training.

    Returns (refined (B, V, C, 4) unit quats, final src-aggregated SSE
    (B, V, C) at sigma_end). Each init refines independently (the
    objective is a weighted sum of per-pair SSEs, so gradients never mix
    inits)."""
    B, S = points.shape[:2]
    V, C = init_quats.shape[1:3]
    if dists is None:
        dists = jnp.full((B, V, C), cfg.camera_distance, jnp.float32)
    if src_w is None:
        src_w = jnp.ones((S, V), jnp.float32)
    w = src_w[None, :, :, None]                          # (1,S,V,1)
    s0 = cfg.sigma_end if sigma is None else sigma
    s1 = s0 if sigma_end is None else sigma_end

    def agg_sse(q_raw, sig_val, value_only=False):
        q = q_raw / jnp.linalg.norm(q_raw, axis=-1, keepdims=True)
        sig = jnp.full((B, S), sig_val, jnp.float32)
        sse = _pair_sse_multi(cfg, points, q, dists, sig, masks,
                              rgb, images, rgb_w, value_only=value_only)
        return jnp.sum(sse * w, axis=1) / jnp.maximum(
            jnp.sum(src_w, axis=0), 1.0)[None, :, None]  # (B,V,C)

    opt = optax.adam(lr)

    def body(carry, t):
        q_raw, opt_state = carry
        frac = t / max(steps - 1, 1)
        sig_val = s0 + (s1 - s0) * frac
        grads = jax.grad(lambda q: jnp.sum(agg_sse(q, sig_val)))(q_raw)
        updates, opt_state = opt.update(grads, opt_state)
        return (optax.apply_updates(q_raw, updates), opt_state), None

    (q_raw, _), _ = jax.lax.scan(
        body, (init_quats, opt.init(init_quats)),
        jnp.arange(steps, dtype=jnp.float32))
    q = q_raw / jnp.linalg.norm(q_raw, axis=-1, keepdims=True)
    return q, agg_sse(q_raw, s1, value_only=True)


def refine_quats(cfg: Config, points: jnp.ndarray, init_quats: jnp.ndarray,
                 masks: jnp.ndarray, dists: Optional[jnp.ndarray] = None,
                 *, steps: int = 60, lr: float = 0.03,
                 sigma: Optional[float] = None):
    """Single-source convenience wrapper ("self" evidence, one view per
    entry): points (B,N,3), init_quats (B,C,4), masks (B,H,W) ->
    (refined (B,C,4), final SSE (B,C))."""
    d = None if dists is None else dists[:, None]
    q, sse = refine_quats_multi(
        cfg, points[:, None], init_quats[:, None], masks[:, None], None, d,
        steps=steps, lr=lr, sigma=sigma)
    return q[:, 0], sse[:, 0]


def refine_output_poses(cfg: Config, output, masks, images=None, *,
                        steps: int = 60,
                        lr: float = 0.03, sigma: Optional[float] = None,
                        sigma_end: Optional[float] = None,
                        mode: str = "cross",
                        rgb_w: float = 1.0) -> dict:
    """Refine a ModelOutput's predicted poses against the observed masks
    (plus, for RGB models, the observed images).

    output: training.predict_step(...) result with pose != None over
      (M, V)-leading arrays (or (B,)-leading for single-view inputs, in
      which case mode falls back to "self"); masks matches (..., H, W).
    images: optional observed images (..., H, W, 3); used (with
      output.cloud.rgb) as rgb_w-weighted color evidence — color breaks
      the silhouette flip ambiguity, so min-SSE init selection becomes
      flip-discriminative the way training's RGB teacher selection is.
    mode: "cross" (default) scores view v's candidates against the OTHER
      views' clouds — detects symmetry flips; "self" uses only the view's
      own cloud — cheaper, polish-only.

    Returns dict with, per leading-axes entry:
      "refined_best"    (..., 4)  min-SSE init after refinement (headline)
      "refined_student" (..., 4)  the student init's refined pose
      "refined_sse"     (..., C)  final per-init aggregated SSE
    """
    assert mode in ("self", "cross"), mode
    points = output.cloud.points                      # (..., N, 3)
    rgb = output.cloud.rgb if images is not None else None
    if rgb is None:
        images = None
    cand = output.pose.candidates                     # (..., K, 4)
    student = output.pose.student                     # (..., 4)
    lead = masks.shape[:-2]
    K = cand.shape[-2]
    C = K + 1
    inits = jnp.concatenate([cand, student[..., None, :]], axis=-2)
    dists = None
    if output.pose.trans_offset is not None:
        # candidates carry per-head distance offsets; the student has none
        off = jnp.concatenate(
            [output.pose.trans_offset,
             jnp.zeros_like(output.pose.trans_offset[..., :1])], axis=-1)
        dists = cfg.camera_distance + off             # (..., C)
    if mode == "cross" and len(lead) == 2:
        M, V = lead
        src_w = 1.0 - jnp.eye(V, dtype=jnp.float32) if V > 1 else None
        refined, sse = refine_quats_multi(
            cfg, points.reshape((M, V) + points.shape[len(lead):]),
            inits.reshape(M, V, C, 4), masks, src_w,
            None if dists is None else dists.reshape(M, V, C),
            None if rgb is None
            else rgb.reshape((M, V) + rgb.shape[len(lead):]),
            images,
            steps=steps, lr=lr, sigma=sigma, sigma_end=sigma_end,
            rgb_w=rgb_w)
        refined = refined.reshape(-1, C, 4)
        sse = sse.reshape(-1, C)
    else:
        B = int(jnp.prod(jnp.asarray(lead))) if lead else 1
        refined, sse = refine_quats_multi(
            cfg, points.reshape((B, 1) + points.shape[len(lead):]),
            inits.reshape(B, 1, C, 4),
            masks.reshape(B, 1, *masks.shape[-2:]), None,
            None if dists is None else dists.reshape(B, 1, C),
            None if rgb is None
            else rgb.reshape((B, 1) + rgb.shape[len(lead):]),
            None if images is None
            else images.reshape(B, 1, *images.shape[-3:]),
            steps=steps, lr=lr, sigma=sigma, sigma_end=sigma_end,
            rgb_w=rgb_w)
        refined = refined[:, 0]
        sse = sse[:, 0]
    best = jnp.argmin(sse, axis=-1)                   # (B,)
    refined_best = jnp.take_along_axis(
        refined, best[:, None, None], axis=1)[:, 0]
    return {"refined_best": refined_best.reshape(lead + (4,)),
            "refined_student": refined[:, K].reshape(lead + (4,)),
            "refined_sse": sse.reshape(lead + (C,))}


def guard_poses(raw: jnp.ndarray, refined: jnp.ndarray,
                guard_deg: float) -> tuple[jnp.ndarray, float]:
    """Trust-region gate on refined poses: per entry, accept the refined
    quaternion only if it moved <= guard_deg from its raw seed, else keep
    the seed.

    Measured motivation (docs/pose_training.md "lr sweep + trust-region
    guard", runs/c3rgb_refine_sweep): on an accurate RGB pose model,
    unguarded refinement halves the median error but walks 5-9% of views
    across a silhouette-flip basin boundary (Acc@30 0.933 -> 0.84-0.88 on
    val). Genuine within-basin polish is a small move while a basin hop is
    a large one, so a ~15 deg gate keeps the median gain and recovers the
    accuracy (held-out test: 12.59 -> 8.89 deg median at Acc@30 0.856 vs
    raw 0.858).

    Returns (guarded (..., 4), accepted fraction).
    """
    from tpu_unsup_pc.ops.quaternion import quat_angle_between
    move = jnp.degrees(quat_angle_between(jnp.asarray(raw),
                                          jnp.asarray(refined)))
    take = move <= guard_deg
    out = jnp.where(take[..., None], refined, raw)
    return out, float(take.mean())
