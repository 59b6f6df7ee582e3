"""Loss assembly (SURVEY.md §2 "Model / loss assembly", §3.1/§3.2 call
stacks): multi-view silhouette-consistency MSE, optional masked RGB
appearance loss, and the pose-candidate ensemble with student–teacher
min-loss selection.

Everything is expressed as nested vmaps over (batch, source view, target
view[, candidate]) of the single-cloud projector — all candidates are
projected (the argmin needs every loss anyway [SURVEY §3.2]), selection is
`argmin` + `take_along_axis`, and the student loss uses `stop_gradient`, so
the whole thing jits with no data-dependent control flow. The projector call
is wrapped in `jax.checkpoint`: voxel grids are rematerialized in the
backward pass instead of stored, trading MXU FLOPs (cheap) for HBM (the
bottleneck at 128^3 x B x V^2)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from tpu_unsup_pc.models.model import ModelOutput
from tpu_unsup_pc.ops.camera import Camera
from tpu_unsup_pc.ops.project import project_pointcloud
from tpu_unsup_pc.ops.quaternion import quat_from_euler
from tpu_unsup_pc.utils.config import Config


def _gt_cameras(cfg: Config, batch: dict) -> Camera:
    """Ground-truth cameras from the batch's azimuth/elevation (B, V)."""
    q = quat_from_euler(batch["azimuth"], batch["elevation"])
    shape = batch["azimuth"].shape
    return Camera(
        quat=q,
        distance=jnp.full(shape, cfg.camera_distance, jnp.float32),
        focal=jnp.full(shape, cfg.focal_length, jnp.float32))


def _masked_rgb_mse(rgb_image, image, mask):
    err = jnp.sum((rgb_image - image) ** 2, axis=-1) * mask
    return jnp.sum(err) / jnp.maximum(jnp.sum(mask), 1.0)


def compute_loss(cfg: Config, output: ModelOutput, batch: dict,
                 sigma) -> Tuple[jnp.ndarray, dict]:
    """Total training loss + metrics for one (possibly sharded) batch.

    batch: {"image": (B,V,H,W,3), "mask": (B,V,H,W),
            "azimuth": (B,V), "elevation": (B,V)}.
    Source clouds come from the first S views (S = cfg.source_views or V);
    every source cloud is projected into every one of the V target views.
    """
    B, V = batch["mask"].shape[:2]
    S = cfg.source_views or V
    points = output.cloud.points[:, :S]                     # (B,S,N,3)
    rgb = output.cloud.rgb[:, :S] if output.cloud.rgb is not None else None
    if output.cloud.scale is not None:
        sigma_src = sigma * output.cloud.scale[:, :S]       # (B,S)
    else:
        sigma_src = jnp.broadcast_to(jnp.asarray(sigma, jnp.float32), (B, S))

    @jax.checkpoint
    def proj(pts, rgb_pts, sig, quat, dist):
        cam = Camera(quat=quat, distance=dist,
                     focal=jnp.asarray(cfg.focal_length, jnp.float32))
        out = project_pointcloud(pts, cam, sig, cfg, rgb=rgb_pts)
        if out.rgb_image is None:
            return out.silhouette, jnp.zeros(out.silhouette.shape + (3,))
        return out.silhouette, out.rgb_image

    if not cfg.predict_pose:
        cams = _gt_cameras(cfg, batch)                      # fields (B,V)
        # sils[b,s,t] = render(points[b,s], cam[b,t]):
        per_tgt = jax.vmap(proj, in_axes=(None, None, None, 0, 0))
        per_src = jax.vmap(per_tgt, in_axes=(0, 0, 0, None, None))
        per_b = jax.vmap(per_src, in_axes=(0, 0 if rgb is not None else None,
                                           0, 0, 0))
        sils, rgb_imgs = per_b(points, rgb, sigma_src, cams.quat,
                               cams.distance)               # (B,S,V,H,W)
        mask_t = batch["mask"][:, None, :, :, :]            # (B,1,V,H,W)
        loss_sil = jnp.mean((sils - mask_t) ** 2)
        metrics = {"loss_sil": loss_sil}
        total = loss_sil
        if rgb is not None:
            img_t = jnp.broadcast_to(batch["image"][:, None],
                                     rgb_imgs.shape)
            mask_b = jnp.broadcast_to(mask_t, sils.shape)
            loss_rgb = _masked_rgb_mse(rgb_imgs, img_t, mask_b)
            total = total + cfg.rgb_loss_weight * loss_rgb
            metrics["loss_rgb"] = loss_rgb
        metrics["loss"] = total
        return total, metrics

    # ---- unknown pose: candidate ensemble (SURVEY §3.2) ----
    assert output.pose is not None
    K = cfg.pose_candidates
    cand = output.pose.candidates                            # (B,V,K,4)
    student = output.pose.student                            # (B,V,4)
    if output.pose.trans_offset is not None:
        dist = cfg.camera_distance + output.pose.trans_offset  # (B,V,K)
    else:
        dist = jnp.full((B, V, K), cfg.camera_distance, jnp.float32)

    # sils[b,s,t,k] = render(points[b,s], candidate k of target view t)
    per_cand = jax.vmap(proj, in_axes=(None, None, None, 0, 0))
    per_tgt = jax.vmap(per_cand, in_axes=(None, None, None, 0, 0))
    per_src = jax.vmap(per_tgt, in_axes=(0, 0, 0, None, None))
    per_b = jax.vmap(per_src, in_axes=(0, 0 if rgb is not None else None,
                                       0, 0, 0))
    sils, rgb_imgs = per_b(points, rgb, sigma_src, cand, dist)
    # (B,S,V,K,H,W)
    mask_t = batch["mask"][:, None, :, None, :, :]
    pair_losses = jnp.mean((sils - mask_t) ** 2, axis=(-2, -1))  # (B,S,V,K)

    if rgb is not None:
        img_t = jnp.broadcast_to(batch["image"][:, None, :, None],
                                 rgb_imgs.shape)
        mask_b = jnp.broadcast_to(mask_t, sils.shape)
        err = jnp.sum((rgb_imgs - img_t) ** 2, axis=-1) * mask_b
        rgb_pair = (jnp.sum(err, axis=(-2, -1))
                    / jnp.maximum(jnp.sum(mask_b, axis=(-2, -1)), 1.0))
        pair_losses = pair_losses + cfg.rgb_loss_weight * rgb_pair

    # teacher: min-loss candidate per (b, s, t) pair
    best_k = jnp.argmin(pair_losses, axis=-1)                # (B,S,V)
    loss_teacher = jnp.mean(jnp.min(pair_losses, axis=-1))
    # student -> stop_grad(best candidate); sign-invariant quaternion loss
    best_q = jnp.take_along_axis(
        jnp.broadcast_to(cand[:, None], (B, S, V, K, 4)),
        best_k[..., None, None], axis=3)[..., 0, :]          # (B,S,V,4)
    best_q = jax.lax.stop_gradient(best_q)
    dot = jnp.sum(student[:, None, :, :] * best_q, axis=-1)  # (B,S,V)
    loss_student = jnp.mean(1.0 - dot ** 2)

    total = loss_teacher + cfg.pose_student_weight * loss_student
    metrics = {"loss_sil": loss_teacher, "loss_student": loss_student,
               "loss": total}
    return total, metrics
