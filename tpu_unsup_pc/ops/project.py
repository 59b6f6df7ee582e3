"""Differentiable projector: points (+rgb) -> voxels -> silhouette / image
(SURVEY.md §2 "Voxel->silhouette projector", §3.1 splat/project call stack).

Because splatting happens in post-perspective frustum space (see
ops/camera.py), voxel->silhouette projection is a pure reduction along the
depth axis — three variants, matching the DRC-style choices the reference
exposes [SURVEY §2]:

  * "drc": expected occupancy along the ray, sil = 1 - prod_d (1 - v_d);
    ray-termination weights w_d = v_d * prod_{d'<d}(1 - v_{d'}) give the
    expected-color image for RGB splatting (BASELINE config 5).
  * "max": hard max over depth.
  * "sum": clipped sum over depth.

All reductions are static-shape jnp ops (cumprod lowers to an associative
scan) — no data-dependent control flow, jit/vmap/grad-safe.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from tpu_unsup_pc.ops.camera import (Camera, world_to_grid,
                                     world_to_grid_soa)
from tpu_unsup_pc.ops.gauss import smoothen_voxels
from tpu_unsup_pc.ops.splat import (pointcloud_to_voxels,
                                    splat_gauss_separable, splat_trilinear,
                                    static_gauss_radius)
from tpu_unsup_pc.utils.config import Config


class ProjectorOutput(NamedTuple):
    silhouette: jnp.ndarray            # (H, W) in [0, 1]
    voxels: jnp.ndarray                # (D, H, W) smoothed occupancy
    rgb_image: Optional[jnp.ndarray]   # (H, W, 3) or None


def collapse_to_silhouette(vox: jnp.ndarray, proj_mode: str = "drc",
                           eps: float = 1e-6):
    """(..., D, H, W) occupancy in [0,1] -> ((..., H, W) silhouette,
    (..., D, H, W) ray-termination weights for expected-color compositing).
    Depth axis is -3; index 0 is nearest the camera."""
    v = jnp.clip(vox, 0.0, 1.0 - eps)
    # barrier: XLA's TPU fusion pass CHECK-crashes (TransformWindow "loop
    # will not make progress") when the cumprod window op fuses with its
    # producer at some grid shapes (e.g. 128^3); keep them separate.
    v = jax.lax.optimization_barrier(v)
    if proj_mode == "max":
        sil = jnp.max(v, axis=-3)
        # one-hot-ish weights at the argmax for color compositing
        w = jnp.where(v == sil[..., None, :, :], 1.0, 0.0)
        w = w / jnp.maximum(jnp.sum(w, axis=-3, keepdims=True), eps)
        return sil, w * sil[..., None, :, :]
    if proj_mode == "sum":
        sil = jnp.clip(jnp.sum(v, axis=-3), 0.0, 1.0)
        w = v / jnp.maximum(jnp.sum(v, axis=-3, keepdims=True), eps)
        return sil, w * sil[..., None, :, :]
    # "drc": transmittance compositing
    trans = jnp.cumprod(1.0 - v, axis=-3)                  # T_d after cell d
    trans_before = jnp.concatenate(
        [jnp.ones_like(trans[..., :1, :, :]), trans[..., :-1, :, :]],
        axis=-3)                                           # T before cell d
    w = v * trans_before                                   # stop at cell d
    sil = 1.0 - trans[..., -1, :, :]                       # = sum_d w_d
    return sil, w


def project_pointcloud(points: jnp.ndarray, cam: Camera, sigma,
                       cfg: Config, rgb: jnp.ndarray | None = None,
                       ) -> ProjectorOutput:
    """The core differentiable projector (the op the notebook API `project`
    wraps and the op the headline benchmark times [BASELINE.json:2]).

    Args:
      points: (N, 3) world-frame point cloud in [-0.5, 0.5]^3.
      cam: Camera (unbatched here; vmap for batches of views).
      sigma: splatting sigma in voxel cells (traced; annealed).
      cfg: static Config (vox_size, splat/proj modes, frustum geometry).
      rgb: optional (N, 3) per-point colors in [0, 1].

    Returns ProjectorOutput(silhouette (H,W), voxels (D,H,W),
    rgb_image (H,W,3) | None). Differentiable w.r.t. points, rgb, sigma and
    the camera pose.
    """
    D = cfg.vox_size
    radius = static_gauss_radius(max(cfg.sigma_start, cfg.sigma_end))
    g = world_to_grid(points, cam, D, cfg.depth_extent)    # (N, 3)
    grids = pointcloud_to_voxels(
        g, D, sigma, rgb=rgb, splat_mode=cfg.splat_mode, radius=radius,
        chunk=cfg.point_chunk, use_pallas=cfg.use_pallas)
    occ = grids["occupancy"]
    rgb_grid = grids.get("rgb")                            # (3, D, H, W)
    if cfg.splat_mode == "trilinear_blur":
        occ = smoothen_voxels(occ, sigma, radius)
        if rgb_grid is not None:
            rgb_grid = smoothen_voxels(rgb_grid, sigma, radius)
    occ_unclipped = occ                                    # for color norm
    if cfg.clip_voxels:
        occ = jnp.clip(occ, 0.0, 1.0)

    sil, w = collapse_to_silhouette(occ, cfg.proj_mode)
    rgb_image = None
    if rgb_grid is not None:
        # mean color per cell (mass-weighted), then expected color along ray
        cell_color = rgb_grid / jnp.maximum(occ_unclipped, 1e-6)
        rgb_image = jnp.einsum("dhw,cdhw->hwc", w, cell_color)
    return ProjectorOutput(silhouette=sil, voxels=occ, rgb_image=rgb_image)


def fused_render_available(cfg: Config, has_rgb: bool) -> bool:
    """True when the fully-fused splat->collapse Pallas kernel can render
    this config (the training default: gauss splat, drc collapse, clipped
    grids, on TPU; RGB has its own fused variant)."""
    del has_rgb  # both silhouette-only and RGB variants exist
    return (cfg.use_pallas and cfg.splat_mode == "gauss"
            and cfg.proj_mode == "drc" and cfg.clip_voxels
            and (cfg.force_fused or jax.default_backend() == "tpu"))


def render_silhouettes_fused(points: jnp.ndarray, cams: Camera, sigma,
                             cfg: Config, rgb: jnp.ndarray | None = None):
    """(P, N, 3) points + (P,)-batched cameras -> ((P, H, W) silhouettes,
    (P, H, W, 3) images | None) via the fused Pallas kernels (grid never
    leaves VMEM; backward rematerializes in-kernel, so no jax.checkpoint
    needed around this)."""
    from tpu_unsup_pc.ops.pallas.render_kernel import (
        render_drc_pallas_soa, render_drc_rgb_pallas_soa)
    D = cfg.vox_size
    radius = static_gauss_radius(max(cfg.sigma_start, cfg.sigma_end))
    sigma = jnp.broadcast_to(jnp.asarray(sigma, jnp.float32),
                             points.shape[:1])
    sigma_k = jnp.sqrt(sigma ** 2 + 1.0 / 6.0)      # hat-variance corr.
    # SoA everywhere: unstack coordinates (and colors) before the camera
    # math so no (P, N, 3) intermediate ever feeds the custom call —
    # TPU layout conversions on a 3-wide lane dim cost ~15ms/step at
    # training shapes
    gz, gy, gx = world_to_grid_soa(
        points[..., 0], points[..., 1], points[..., 2], cams, D,
        cfg.depth_extent)
    pad = (-gz.shape[-1]) % cfg.point_chunk

    def pad_c(c, fill):
        return jnp.pad(c, ((0, 0), (0, pad)), constant_values=fill) \
            if pad else c

    gz, gy, gx = (pad_c(c, -1e6) for c in (gz, gy, gx))
    if rgb is None:
        sil = render_drc_pallas_soa(gz, gy, gx, sigma_k, D, radius,
                                    cfg.point_chunk, cfg.pallas_bf16)
        return sil, None
    cr, cg, cb = (pad_c(rgb[..., i], 0.0) for i in range(3))
    sil, img = render_drc_rgb_pallas_soa(gz, gy, gx, cr, cg, cb, sigma_k,
                                         D, radius, cfg.point_chunk,
                                         cfg.pallas_bf16)
    return sil, jnp.moveaxis(img, 1, -1)            # (P, H, W, 3)


def render_sse_fused(points: jnp.ndarray, quats: jnp.ndarray,
                     dists: jnp.ndarray, sigma: jnp.ndarray,
                     masks: jnp.ndarray, cfg: Config,
                     sigma_grad: bool = False) -> jnp.ndarray:
    """Fused render + silhouette squared error for every (source, target
    [, candidate]) pair — the training fast path when RGB is off.

    Args:
      points: (B, S, N, 3) world-frame source clouds.
      quats:  (B, V, K, 4) target camera rotations (K=1 for known pose).
      dists:  (B, V, K) camera distances.
      sigma:  (B, S) splat sigmas.
      masks:  (B, V, H, W) target masks.

    Returns (B, S, V, K) sums over pixels of (silhouette - mask)^2.

    The pairwise broadcast happens INSIDE the world->grid transform (XLA
    fuses it), so the only (B*S*V*K, N)-sized arrays ever materialized are
    the three SoA coordinate operands the kernel needs; silhouettes and
    their cotangents never exist in HBM, and masks stay compact (B*V,H,W)
    deduplicated by the kernel's index_map.

    With cfg.pallas_onepass (default) and no depth banding, the one-pass
    value+Jacobian kernel serves value_and_grad with a single kernel
    launch (exact for any downstream loss, argmin selection included —
    see render_drc_mse_onepass)."""
    from tpu_unsup_pc.ops.pallas.render_kernel import (
        auto_band, render_drc_mse_auto, render_drc_mse_onepass)
    B, S, N = points.shape[:3]
    V, K = quats.shape[1], quats.shape[2]
    D = cfg.vox_size
    radius = static_gauss_radius(max(cfg.sigma_start, cfg.sigma_end))
    cams = Camera(quat=quats[:, None],                       # (B,1,V,K,4)
                  distance=dists[:, None],
                  focal=jnp.full(dists[:, None].shape, cfg.focal_length,
                                 jnp.float32))
    gz, gy, gx = world_to_grid_soa(
        points[..., 0][:, :, None, None],                    # (B,S,1,1,N)
        points[..., 1][:, :, None, None],
        points[..., 2][:, :, None, None], cams, D, cfg.depth_extent)
    P = B * S * V * K
    gz, gy, gx = (c.reshape(P, N) for c in (gz, gy, gx))
    pad = (-N) % cfg.point_chunk
    if pad:
        gz, gy, gx = (jnp.pad(c, ((0, 0), (0, pad)), constant_values=-1e6)
                      for c in (gz, gy, gx))
    sigma_p = jnp.broadcast_to(sigma[:, :, None, None],
                               (B, S, V, K)).reshape(P)
    sigma_k = jnp.sqrt(sigma_p ** 2 + 1.0 / 6.0)    # hat-variance corr.
    band = None if cfg.pallas_band < 0 else cfg.pallas_band
    if band is None and D >= 192 and not sigma_grad:
        # auto-band large grids: at 256^3 the one-pass kernel measured
        # 907ms fwd+bwd for 10 pairs x 8192 pts vs ~25ms banded (r4,
        # tools/band_crossover_bench.py — the dense (chunk, D*HT)
        # buffers shrink the chunk to starvation); crossover vs dense
        # sits between 128^3 and 192^3. The width derives from the
        # radius (r5: a fixed 56 left too little span budget and the
        # lax.cond silently fell back to dense on real clouds — see
        # render_kernel.auto_band). pallas_band=0 forces the unbanded
        # kernels explicitly; sigma_grad (predict_scale) still requires
        # the one-pass kernel and keeps the user's setting.
        band = auto_band(radius)
    masks_c = masks.reshape(B * V, *masks.shape[-2:])
    if cfg.pallas_onepass and not band:
        sse = render_drc_mse_onepass(gz, gy, gx, sigma_k, masks_c,
                                     (B, S, V, K), D, radius,
                                     cfg.point_chunk, cfg.pallas_bf16,
                                     sigma_grad)
    else:
        assert not sigma_grad, (
            "sigma_grad (predict_scale fast path) requires the one-pass "
            "kernel: set pallas_onepass=True and pallas_band<0, or use "
            "the XLA path")
        sse = render_drc_mse_auto(gz, gy, gx, sigma_k, masks_c,
                                  (B, S, V, K), D, radius,
                                  cfg.point_chunk, cfg.pallas_bf16,
                                  band=band)
    return sse.reshape(B, S, V, K)


def render_sse_rgb_fused(points: jnp.ndarray, rgb: jnp.ndarray,
                         quats: jnp.ndarray, dists: jnp.ndarray,
                         sigma: jnp.ndarray, masks: jnp.ndarray,
                         images: jnp.ndarray, cfg: Config,
                         ct: jnp.ndarray | None = None,
                         value_only: bool = False) -> jnp.ndarray:
    """Fused RGB render + squared errors for every (source, target
    [, candidate]) pair — the c5 training fast path.

    Args:
      points: (B, S, N, 3) world-frame source clouds.
      rgb:    (B, S, N, 3) per-point colors.
      quats:  (B, V, K, 4) target camera rotations (K=1 for known pose).
      dists:  (B, V, K) camera distances.
      sigma:  (B, S) splat sigmas.
      masks:  (B, V, H, W) target masks.
      images: (B, V, H, W, 3) target images.
      ct:     optional (B, S, V, K, 2) per-pair loss coefficients — when
        given (and cfg.pallas_onepass), the one-pass value+gradient
        kernel serves value_and_grad with a single launch; the caller's
        loss MUST be sum(ct * sse) (see render_drc_rgb_mse_onepass).
        Without ct, cfg.pallas_onepass dispatches the two-column-
        Jacobian one-pass kernel (exact for ANY downstream loss, argmin
        selection included — render_drc_rgb_mse_onepass2).
      value_only: scoring/eval callers that never differentiate should
        pass True to get the forward-only two-kernel path instead of a
        one-pass kernel that always pays its gradient contractions.

    Returns (B, S, V, K, 2): [..., 0] silhouette SSE, [..., 1] masked RGB
    SSE (sum_c (img_c - target_c)^2 * mask). Neither silhouettes nor
    composited images ever exist in HBM; masks/images stay compact
    (B*V, ...) deduplicated by the kernel's index_maps."""
    from tpu_unsup_pc.ops.pallas.render_kernel import (
        render_drc_rgb_mse_onepass, render_drc_rgb_mse_onepass2,
        render_drc_rgb_mse_pallas_soa)
    B, S, N = points.shape[:3]
    V, K = quats.shape[1], quats.shape[2]
    D = cfg.vox_size
    radius = static_gauss_radius(max(cfg.sigma_start, cfg.sigma_end))
    cams = Camera(quat=quats[:, None],                       # (B,1,V,K,4)
                  distance=dists[:, None],
                  focal=jnp.full(dists[:, None].shape, cfg.focal_length,
                                 jnp.float32))
    gz, gy, gx = world_to_grid_soa(
        points[..., 0][:, :, None, None],                    # (B,S,1,1,N)
        points[..., 1][:, :, None, None],
        points[..., 2][:, :, None, None], cams, D, cfg.depth_extent)
    P = B * S * V * K
    gz, gy, gx = (c.reshape(P, N) for c in (gz, gy, gx))
    # colors don't depend on the target camera: broadcast to pairs
    cr, cg, cb = (jnp.broadcast_to(rgb[..., i][:, :, None, None],
                                   (B, S, V, K, N)).reshape(P, N)
                  for i in range(3))
    pad = (-N) % cfg.point_chunk
    if pad:
        gz, gy, gx = (jnp.pad(c, ((0, 0), (0, pad)), constant_values=-1e6)
                      for c in (gz, gy, gx))
        cr, cg, cb = (jnp.pad(c, ((0, 0), (0, pad)))
                      for c in (cr, cg, cb))
    sigma_p = jnp.broadcast_to(sigma[:, :, None, None],
                               (B, S, V, K)).reshape(P)
    sigma_k = jnp.sqrt(sigma_p ** 2 + 1.0 / 6.0)    # hat-variance corr.
    H, W = masks.shape[-2:]
    masks_c = masks.reshape(B * V, H, W)
    images_c = jnp.moveaxis(images, -1, 2).reshape(B * V, 3, H, W)
    if ct is not None and cfg.pallas_onepass:
        sse = render_drc_rgb_mse_onepass(
            gz, gy, gx, cr, cg, cb, sigma_k, masks_c, images_c,
            ct.reshape(P, 2), (B, S, V, K), D, radius, cfg.point_chunk,
            cfg.pallas_bf16)
    elif cfg.pallas_onepass and not value_only:
        # no ct (argmin-dependent cotangents — the pose-ensemble RGB
        # branch): the two-column-Jacobian one-pass kernel is exact for
        # any downstream loss and runs value_and_grad in ONE launch.
        # value_only=True (scoring/eval callers) opts out — the one-pass
        # kernel always pays the gradient contractions (28 vs the
        # two-kernel op's forward-only 8, units of N*D^3)
        sse = render_drc_rgb_mse_onepass2(
            gz, gy, gx, cr, cg, cb, sigma_k, masks_c, images_c,
            (B, S, V, K), D, radius, cfg.point_chunk, cfg.pallas_bf16)
    else:
        sse = render_drc_rgb_mse_pallas_soa(
            gz, gy, gx, cr, cg, cb, sigma_k, masks_c, images_c,
            (B, S, V, K), D, radius, cfg.point_chunk, cfg.pallas_bf16)
    return sse.reshape(B, S, V, K, 2)


def project_pointclouds_batched(points: jnp.ndarray, cams: Camera, sigma,
                                cfg: Config,
                                rgb: jnp.ndarray | None = None,
                                ) -> ProjectorOutput:
    """Flat-batched projector: (P, N, 3) clouds through (P,)-batched cameras
    in ONE computation — the hot-loop entry point the loss uses (losses
    flatten their (batch, source, target[, candidate]) axes into P).

    This is where the Pallas kernel plugs in: one pallas_call with a
    (P, chunks) grid covers the whole batch — no vmap-of-kernels, the MXU
    sees one long stream of chunk matmuls (SURVEY §7.2 item 1).

    Returns ProjectorOutput with leading dim P. Same semantics as
    vmap(project_pointcloud) (tested equivalent).
    """
    D = cfg.vox_size
    radius = static_gauss_radius(max(cfg.sigma_start, cfg.sigma_end))
    sigma = jnp.broadcast_to(jnp.asarray(sigma, jnp.float32),
                             points.shape[:1])
    g = world_to_grid(points, cams, D, cfg.depth_extent)       # (P, N, 3)

    rgb_grid = None
    if (cfg.use_pallas and cfg.splat_mode == "gauss"
            and jax.default_backend() == "tpu"):
        from tpu_unsup_pc.ops.pallas.splat_kernel import (
            pad_points, splat_gauss_pallas_batched,
            splat_gauss_rgb_pallas_batched)
        sigma_k = jnp.sqrt(sigma ** 2 + 1.0 / 6.0)   # hat-variance corr.
        g_p = pad_points(g, cfg.point_chunk)
        if rgb is None:
            occ = splat_gauss_pallas_batched(g_p, sigma_k, D, radius,
                                             cfg.point_chunk)
        else:
            pad = g_p.shape[1] - rgb.shape[1]
            rgb_p = jnp.pad(rgb, ((0, 0), (0, pad), (0, 0))) if pad else rgb
            grids = splat_gauss_rgb_pallas_batched(g_p, rgb_p, sigma_k, D,
                                                   radius, cfg.point_chunk)
            occ, rgb_grid = grids[:, 0], grids[:, 1:]
    elif cfg.splat_mode == "gauss":
        if rgb is None:
            occ = jax.vmap(
                lambda gi, si: splat_gauss_separable(
                    gi, D, si, radius=radius, chunk=cfg.point_chunk))(
                        g, sigma)
        else:
            vals = jnp.concatenate([jnp.ones_like(rgb[..., :1]), rgb],
                                   axis=-1)
            grids = jax.vmap(
                lambda gi, vi, si: splat_gauss_separable(
                    gi, D, si, values=vi, radius=radius,
                    chunk=cfg.point_chunk))(g, vals, sigma)
            occ, rgb_grid = grids[:, 0], grids[:, 1:]
    else:  # trilinear_blur parity path
        occ = jax.vmap(lambda gi: splat_trilinear(gi, D))(g)
        occ = jax.vmap(lambda o, s: smoothen_voxels(o, s, radius))(
            occ, sigma)
        if rgb is not None:
            rgb_grid = jax.vmap(lambda gi, ri: splat_trilinear(gi, D, ri))(
                g, rgb)
            rgb_grid = jax.vmap(
                lambda o, s: smoothen_voxels(o, s, radius))(rgb_grid, sigma)

    occ_unclipped = occ
    if cfg.clip_voxels:
        occ = jnp.clip(occ, 0.0, 1.0)
    sil, w = collapse_to_silhouette(occ, cfg.proj_mode)
    rgb_image = None
    if rgb_grid is not None:
        cell_color = rgb_grid / jnp.maximum(occ_unclipped[:, None], 1e-6)
        rgb_image = jnp.einsum("pdhw,pcdhw->phwc", w, cell_color)
    return ProjectorOutput(silhouette=sil, voxels=occ, rgb_image=rgb_image)
