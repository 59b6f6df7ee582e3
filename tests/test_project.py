"""Full projector tests: oracle parity on the trilinear_blur contract path,
collapse variants, RGB compositing, and the resample op (SURVEY.md §4.2)."""

import numpy as np
import torch

import jax.numpy as jnp
from tpu_unsup_pc.ops import camera as C
from tpu_unsup_pc.ops import project as P
from tpu_unsup_pc.ops import resample, splat
from tpu_unsup_pc.utils.config import Config
from oracle import torch_oracle as O

CFG = Config(vox_size=24, sigma_start=1.5, sigma_end=0.8,
             splat_mode="trilinear_blur", point_chunk=64)


def _cloud(rng, n=120):
    return (rng.uniform(-0.35, 0.35, size=(n, 3))).astype(np.float32)


def test_projector_matches_oracle(rng):
    pts = _cloud(rng)
    sigma = 1.0
    radius = splat.static_gauss_radius(max(CFG.sigma_start, CFG.sigma_end))
    for az, el in [(0.4, 0.2), (2.0, -0.5)]:
        cam = C.make_camera(az, el, CFG.camera_distance, CFG.focal_length)
        out = P.project_pointcloud(jnp.asarray(pts), cam, sigma, CFG)
        sil_o, vox_o = O.project_pointcloud(
            torch.tensor(pts, dtype=torch.float64), O.quat_from_azel(az, el),
            CFG.camera_distance, CFG.focal_length, CFG.vox_size,
            CFG.depth_extent, sigma, radius)
        np.testing.assert_allclose(np.asarray(out.voxels), vox_o.numpy(),
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(out.silhouette), sil_o.numpy(),
                                   atol=2e-4)


def test_projector_rgb_matches_oracle(rng):
    pts = _cloud(rng, 60)
    rgb = rng.uniform(size=(60, 3)).astype(np.float32)
    sigma = 1.2
    radius = splat.static_gauss_radius(max(CFG.sigma_start, CFG.sigma_end))
    cam = C.make_camera(0.9, 0.1, CFG.camera_distance, CFG.focal_length)
    out = P.project_pointcloud(jnp.asarray(pts), cam, sigma, CFG,
                               rgb=jnp.asarray(rgb))
    sil_o, _, img_o = O.project_pointcloud(
        torch.tensor(pts, dtype=torch.float64), O.quat_from_azel(0.9, 0.1),
        CFG.camera_distance, CFG.focal_length, CFG.vox_size,
        CFG.depth_extent, sigma, radius, rgb=torch.tensor(
            rgb, dtype=torch.float64))
    np.testing.assert_allclose(np.asarray(out.silhouette), sil_o.numpy(),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.rgb_image), img_o.numpy(),
                               atol=5e-4)


def test_collapse_modes(rng):
    vox = jnp.asarray(rng.uniform(size=(8, 6, 6)).astype(np.float32))
    sil_drc, w = P.collapse_to_silhouette(vox, "drc")
    sil_max, _ = P.collapse_to_silhouette(vox, "max")
    sil_sum, _ = P.collapse_to_silhouette(vox, "sum")
    v = np.clip(np.asarray(vox), 0, 1 - 1e-6)
    np.testing.assert_allclose(np.asarray(sil_drc),
                               1 - np.prod(1 - v, axis=0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sil_max), v.max(0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sil_sum),
                               np.clip(v.sum(0), 0, 1), atol=1e-5)
    # drc stop-weights sum to the silhouette
    np.testing.assert_allclose(np.asarray(w).sum(0), np.asarray(sil_drc),
                               atol=1e-5)


def test_empty_cloud_gives_empty_silhouette():
    # points far outside the frustum contribute nothing
    pts = jnp.full((10, 3), 5.0)
    cam = C.make_camera(0.3, 0.3, CFG.camera_distance, CFG.focal_length)
    out = P.project_pointcloud(pts, cam, 1.0, CFG)
    assert float(jnp.max(out.silhouette)) < 1e-3


def test_gauss_mode_close_to_parity_mode(rng):
    """The fused MXU path must track the reference-semantics path within a
    loose tolerance at matched sigma (variance-corrected footprint)."""
    pts = _cloud(rng)
    cam = C.make_camera(1.3, 0.2, CFG.camera_distance, CFG.focal_length)
    a = P.project_pointcloud(jnp.asarray(pts), cam, 1.2, CFG)
    b = P.project_pointcloud(jnp.asarray(pts), cam, 1.2,
                             CFG.replace(splat_mode="gauss"))
    diff = np.abs(np.asarray(a.silhouette) - np.asarray(b.silhouette))
    assert diff.max() < 0.05


def test_resample_consistency(rng):
    """World-space splat + frustum resample ~= frustum-space splat, for a
    smooth grid and an identity-ish camera (sanity of the secondary op)."""
    pts = _cloud(rng, 200)
    sigma = 1.5
    radius = splat.static_gauss_radius(2.0)
    cam = C.make_camera(0.0, 0.0, CFG.camera_distance, CFG.focal_length)
    D = CFG.vox_size
    # world grid: splat in world coords (z,y,x order to match (d,h,w))
    g_world = (jnp.asarray(pts)[:, ::-1] + 0.5) * D - 0.5
    vox_world = splat.splat_gauss_separable(g_world, D, sigma, radius=radius,
                                            chunk=64)
    resampled = resample.resample_voxels_to_frustum(
        vox_world, cam, D, CFG.depth_extent)
    direct = P.project_pointcloud(
        jnp.asarray(pts), cam, sigma,
        CFG.replace(splat_mode="gauss", clip_voxels=False)).voxels
    # compare silhouettes (volumes differ by the perspective jacobian)
    sil_a, _ = P.collapse_to_silhouette(resampled, "max")
    sil_b, _ = P.collapse_to_silhouette(direct, "max")
    mask_a = np.asarray(sil_a) > 0.3 * float(np.asarray(sil_a).max())
    mask_b = np.asarray(sil_b) > 0.3 * float(np.asarray(sil_b).max())
    iou = (mask_a & mask_b).sum() / max((mask_a | mask_b).sum(), 1)
    assert iou > 0.75, iou
