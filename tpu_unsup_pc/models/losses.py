"""Loss assembly (SURVEY.md §2 "Model / loss assembly", §3.1/§3.2 call
stacks): multi-view silhouette-consistency MSE, optional masked RGB
appearance loss, and the pose-candidate ensemble with student–teacher
min-loss selection.

TPU-first structure: every (batch, source view, target view[, candidate])
projection pair is FLATTENED into one leading axis and rendered by a single
batched projector call (ops.project.project_pointclouds_batched) — one
Pallas kernel launch / one fused XLA computation for the whole batch, no
nested vmaps of small programs. All candidates are projected (the argmin
needs every loss anyway [SURVEY §3.2]), selection is `argmin` +
`take_along_axis`, and the student loss uses `stop_gradient`, so everything
jits with no data-dependent control flow. The projector is wrapped in
`jax.checkpoint`: voxel grids are rematerialized in the backward instead of
stored, trading MXU FLOPs (cheap) for HBM (the bottleneck at
128^3 x B x V^2)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from tpu_unsup_pc.models.model import ModelOutput
from tpu_unsup_pc.ops.camera import Camera
from tpu_unsup_pc.ops.project import (fused_render_available,
                                      project_pointclouds_batched,
                                      render_silhouettes_fused,
                                      render_sse_fused,
                                      render_sse_rgb_fused)
from tpu_unsup_pc.ops.quaternion import quat_from_euler
from tpu_unsup_pc.utils.config import Config


def _gt_cameras(cfg: Config, batch: dict) -> Camera:
    """Ground-truth cameras from the batch's azimuth/elevation (B, V).
    A "quat" batch key (B, V, 4) overrides the euler-derived rotation —
    the pseudo-known-pose distillation path (utils/config.py pose_npz),
    where training cameras are a pose specialist's predictions.
    Per-view camera distances ride along when the dataset provides them
    (synth_dist_jitter > 0); otherwise the configured constant."""
    q = batch.get("quat")
    if q is None:
        q = quat_from_euler(batch["azimuth"], batch["elevation"])
    shape = batch["azimuth"].shape
    dist = batch.get("distance")
    if dist is None:
        dist = jnp.full(shape, cfg.camera_distance, jnp.float32)
    return Camera(
        quat=q,
        distance=jnp.asarray(dist, jnp.float32),
        focal=jnp.full(shape, cfg.focal_length, jnp.float32))


def _render_pairs(cfg: Config, points, rgb, sigma, quats, dists):
    """Render every pair: all inputs have a common flat leading axis P.
    Returns (sils (P,H,W), rgb_imgs (P,H,W,3)|None).

    Fast path: the fully-fused Pallas render kernel (splat + DRC collapse
    in VMEM; its custom VJP rematerializes internally, so no checkpoint).
    Fallback: the batched grid projector under jax.checkpoint (grids are
    rematerialized in the backward instead of stored)."""
    cams = Camera(quat=quats, distance=dists,
                  focal=jnp.full(dists.shape, cfg.focal_length, jnp.float32))

    if fused_render_available(cfg, has_rgb=rgb is not None):
        return render_silhouettes_fused(points, cams, sigma, cfg, rgb=rgb)

    @jax.checkpoint
    def render(points, rgb, sigma, cams):
        out = project_pointclouds_batched(points, cams, sigma, cfg, rgb=rgb)
        return out.silhouette, out.rgb_image

    return render(points, rgb, sigma, cams)


def _flat(x, lead):
    """Broadcast x's leading axes to `lead` and flatten them into one."""
    tail = x.shape[len(lead):]
    return jnp.broadcast_to(x, tuple(lead) + tail).reshape((-1,) + tail)


def _pair_weights(cfg: Config, S: int, V: int) -> jnp.ndarray:
    """(S, V) weight per (source, target) projection pair. Sources are the
    first S of the V views, so pair (s, t=s) projects a cloud back into its
    own input view; cfg.exclude_self_view drops those pairs (SURVEY §2:
    'project into >=1 *other* views' — see RECONCILE.md)."""
    w = jnp.ones((S, V), jnp.float32)
    if cfg.exclude_self_view:
        w = w - jnp.eye(S, V, dtype=jnp.float32)
    return w


def _wmean(x, w):
    """Weighted mean of x over the axes covered by broadcast weights w."""
    w = jnp.broadcast_to(w, x.shape)
    return jnp.sum(x * w) / jnp.maximum(jnp.sum(w), 1.0)


def compute_loss(cfg: Config, output: ModelOutput, batch: dict,
                 sigma, step=None) -> Tuple[jnp.ndarray, dict]:
    """Total training loss + metrics for one (possibly sharded) batch.

    batch: {"image": (B,V,H,W,3), "mask": (B,V,H,W),
            "azimuth": (B,V), "elevation": (B,V)}.
    Source clouds come from the first S views (S = cfg.source_views or V);
    every source cloud is projected into every one of the V target views.
    """
    B, V = batch["mask"].shape[:2]
    S = cfg.source_views or V
    N = cfg.pc_num_points
    points = output.cloud.points[:, :S]                     # (B,S,N,3)
    rgb = output.cloud.rgb[:, :S] if output.cloud.rgb is not None else None
    scale_metrics = {}
    sigma_grad = output.cloud.scale is not None
    if sigma_grad:
        # predict_scale routes sigma-gradients through the splat. On the
        # Pallas path only the one-pass sil kernel emits dsigma
        # (render_drc_mse_onepass(sigma_grad=True)); the RGB and banded
        # kernels still give sigma a zero cotangent.
        assert not cfg.use_pallas or (
            rgb is None and cfg.pallas_onepass and cfg.pallas_band < 0), (
            "predict_scale on the Pallas path needs the one-pass "
            "silhouette kernel (pallas_onepass=True, pallas_band<0, "
            "no RGB) — or use the XLA path")
        sigma_src = sigma * output.cloud.scale[:, :S]       # (B,S)
        scale_metrics = {"scale_mean": jnp.mean(output.cloud.scale),
                         "scale_std": jnp.std(output.cloud.scale)}
    else:
        sigma_src = jnp.broadcast_to(jnp.asarray(sigma, jnp.float32), (B, S))

    fuse_mse = rgb is None and fused_render_available(cfg, has_rgb=False)
    fuse_rgb = rgb is not None and fused_render_available(cfg,
                                                          has_rgb=True)

    if not cfg.predict_pose:
        cams = _gt_cameras(cfg, batch)                      # fields (B,V)
        pw = _pair_weights(cfg, S, V)[None]                 # (1,S,V)
        if fuse_rgb:
            # fused RGB render + both losses: neither silhouettes nor
            # composited images ever leave VMEM (the c5 fast path). The
            # per-pair loss coefficients ct are batch constants (pair
            # weights / mask-sum normalizers), so the ONE-PASS kernel can
            # emit value and ct-weighted gradient together; the total
            # MUST be written as sum(ct * sse) (one-pass contract).
            H = W = cfg.vox_size
            mask_sum = jnp.sum(batch["mask"], axis=(-2, -1))     # (B,V)
            sum_pw = jnp.maximum(B * jnp.sum(pw), 1.0)
            den = jnp.maximum(jnp.sum(mask_sum[:, None] * pw), 1.0)
            ct = jnp.stack([
                jnp.broadcast_to(pw / (H * W * sum_pw), (B, S, V)),
                jnp.broadcast_to(cfg.rgb_loss_weight * pw / den,
                                 (B, S, V))], axis=-1)       # (B,S,V,2)
            sse = render_sse_rgb_fused(
                points, rgb, cams.quat[:, :, None],
                cams.distance[:, :, None], sigma_src, batch["mask"],
                batch["image"], cfg,
                ct=ct[:, :, :, None, :])[:, :, :, 0]        # (B,S,V,2)
            total = jnp.sum(sse * ct)
            # metrics recomputed from sse (aux only — not differentiated)
            loss_sil = _wmean(sse[..., 0] / (H * W), pw)
            loss_rgb = jnp.sum(sse[..., 1] * pw) / den
            return total, {"loss_sil": loss_sil, "loss_rgb": loss_rgb,
                           "loss": total, **scale_metrics}
        if fuse_mse:
            # fused render+MSE kernel: silhouettes never leave VMEM
            sse = render_sse_fused(points, cams.quat[:, :, None],
                                   cams.distance[:, :, None], sigma_src,
                                   batch["mask"], cfg,
                                   sigma_grad=sigma_grad)[..., 0]  # (B,S,V)
            H = W = cfg.vox_size
            loss_sil = _wmean(sse / (H * W), pw)
            metrics = {"loss_sil": loss_sil, "loss": loss_sil,
                       **scale_metrics}
            return loss_sil, metrics
        shape = (B, S, V)
        pts_f = _flat(points[:, :, None], shape)            # (BSV, N, 3)
        rgb_f = _flat(rgb[:, :, None], shape) if rgb is not None else None
        sig_f = _flat(sigma_src[:, :, None], shape)
        quat_f = _flat(cams.quat[:, None], shape)
        dist_f = _flat(cams.distance[:, None], shape)
        sils, rgb_imgs = _render_pairs(cfg, pts_f, rgb_f, sig_f, quat_f,
                                       dist_f)
        H, W = sils.shape[-2:]
        sils = sils.reshape(B, S, V, H, W)
        mask_t = batch["mask"][:, None]                     # (B,1,V,H,W)
        loss_sil = _wmean(jnp.mean((sils - mask_t) ** 2, axis=(-2, -1)), pw)
        metrics = {"loss_sil": loss_sil, **scale_metrics}
        total = loss_sil
        if rgb is not None:
            rgb_imgs = rgb_imgs.reshape(B, S, V, H, W, 3)
            img_t = batch["image"][:, None]                 # (B,1,V,H,W,3)
            mask_b = jnp.broadcast_to(mask_t, sils.shape)
            err = jnp.sum((rgb_imgs - img_t) ** 2, axis=-1) * mask_b
            pw_px = pw[..., None, None]                     # (1,S,V,1,1)
            loss_rgb = (jnp.sum(err * pw_px)
                        / jnp.maximum(jnp.sum(mask_b * pw_px), 1.0))
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

    rgb_pair = None
    if fuse_rgb:
        # no ct (the argmin below makes the per-pair cotangents data-
        # dependent): with pallas_onepass this dispatches the two-column
        # -Jacobian one-pass kernel (render_drc_rgb_mse_onepass2), whose
        # backward is exact under candidate selection
        sse = render_sse_rgb_fused(points, rgb, cand, dist, sigma_src,
                                   batch["mask"], batch["image"],
                                   cfg)                      # (B,S,V,K,2)
        H = W = cfg.vox_size
        sil_pair = sse[..., 0] / (H * W)
        mask_sum = jnp.sum(batch["mask"], axis=(-2, -1))     # (B,V)
        rgb_pair = sse[..., 1] / jnp.maximum(
            mask_sum[:, None, :, None], 1.0)
    elif fuse_mse:
        sse = render_sse_fused(points, cand, dist, sigma_src,
                               batch["mask"], cfg,
                               sigma_grad=sigma_grad)        # (B,S,V,K)
        H = W = cfg.vox_size
        sil_pair = sse / (H * W)
    else:
        shape = (B, S, V, K)
        pts_f = _flat(points[:, :, None, None], shape)
        rgb_f = _flat(rgb[:, :, None, None], shape) \
            if rgb is not None else None
        sig_f = _flat(sigma_src[:, :, None, None], shape)
        quat_f = _flat(cand[:, None], shape)
        dist_f = _flat(dist[:, None], shape)
        sils, rgb_imgs = _render_pairs(cfg, pts_f, rgb_f, sig_f, quat_f,
                                       dist_f)
        H, W = sils.shape[-2:]
        sils = sils.reshape(B, S, V, K, H, W)
        mask_t = batch["mask"][:, None, :, None]             # (B,1,V,1,H,W)
        sil_pair = jnp.mean((sils - mask_t) ** 2, axis=(-2, -1))
        if rgb is not None:
            rgb_imgs = rgb_imgs.reshape(B, S, V, K, H, W, 3)
            img_t = batch["image"][:, None, :, None]
            mask_b = jnp.broadcast_to(mask_t, sils.shape)
            err = jnp.sum((rgb_imgs - img_t) ** 2, axis=-1) * mask_b
            rgb_pair = (jnp.sum(err, axis=(-2, -1))
                        / jnp.maximum(jnp.sum(mask_b, axis=(-2, -1)), 1.0))
    # candidate selection uses the combined objective
    pair_losses = sil_pair if rgb_pair is None \
        else sil_pair + cfg.rgb_loss_weight * rgb_pair       # (B,S,V,K)

    # teacher: min-loss candidate per (b, t) target view, aggregated over
    # sources — a per-(s,t) argmin can pick DIFFERENT candidates for the
    # same target view, feeding the student inconsistent targets; the
    # source-aggregated selection keeps one teacher pose per view
    pw = _pair_weights(cfg, S, V)                            # (S,V)
    pw_k = pw[None, :, :, None]                              # (1,S,V,1)
    src_w = jnp.maximum(jnp.sum(pw, axis=0), 1.0)            # (V,)
    agg = jnp.sum(pair_losses * pw_k, axis=1) / src_w[None, :, None]
    best_k = jnp.argmin(agg, axis=-1)                        # (B,V)
    sel = jnp.take_along_axis(
        pair_losses, best_k[:, None, :, None], axis=-1)[..., 0]  # (B,S,V)
    loss_teacher = _wmean(sel, pw[None])
    # student -> stop_grad(best candidate); sign-invariant quaternion loss.
    # Views whose every pair is excluded (possible only when S==1 with
    # exclude_self_view) carry an arbitrary argmin — mask them out.
    view_w = (jnp.sum(pw, axis=0) > 0).astype(jnp.float32)   # (V,)
    best_q = jnp.take_along_axis(
        cand, best_k[..., None, None], axis=2)[..., 0, :]    # (B,V,4)
    best_q = jax.lax.stop_gradient(best_q)
    dot = jnp.sum(student * best_q, axis=-1)                 # (B,V)
    loss_student = _wmean(1.0 - dot ** 2, view_w[None])

    w_student = cfg.pose_student_weight
    if cfg.pose_student_warmup_steps > 0 and step is not None:
        w_student = w_student * jnp.minimum(
            1.0, jnp.asarray(step, jnp.float32)
            / cfg.pose_student_warmup_steps)
    if cfg.pose_student_decay_steps > 0 and step is not None:
        f = jnp.minimum(1.0, jnp.asarray(step, jnp.float32)
                        / cfg.pose_student_decay_steps)
        w_student = w_student * (1.0 - f) + cfg.pose_student_weight_end * f
    total = loss_teacher + w_student * loss_student
    # report per-term losses at the SELECTED candidates so loss_sil means
    # the same thing as in the known-pose branch
    sel_sil = jnp.take_along_axis(
        sil_pair, best_k[:, None, :, None], axis=-1)[..., 0]
    metrics = {"loss_teacher": loss_teacher,
               "loss_sil": _wmean(sel_sil, pw[None]),
               "loss_student": loss_student, "loss": total,
               **scale_metrics}
    if rgb_pair is not None:
        sel_rgb = jnp.take_along_axis(
            rgb_pair, best_k[:, None, :, None], axis=-1)[..., 0]
        metrics["loss_rgb"] = _wmean(sel_rgb, pw[None])
    return total, metrics
