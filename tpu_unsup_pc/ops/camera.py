"""Camera model: world -> camera -> perspective frustum -> voxel-grid coords
(SURVEY.md §2 "Camera / pose math"; §3.1 `pose_to_matrix` / `splat` stack).

Conventions (fixed here, documented once, used everywhere):
  * World/canonical frame: object lives in the cube [-0.5, 0.5]^3, y up.
  * Camera frame: +z looks *into* the scene, +y points down (image-row
    aligned), +x right (image-col aligned). The pose quaternion rotates
    world -> camera; the camera sits so the object center lands at
    z = camera_distance on the optical axis.
  * Frustum (post-perspective) frame: u = f*x/z, v = f*y/z in [-0.5, 0.5]
    across the image plane; depth w = (z - camera_distance)/depth_extent in
    [-0.5, 0.5] across the frustum slab. Splatting happens HERE — in
    post-perspective space — so voxel->silhouette projection is a pure
    reduction along the depth axis (no grid resampling on the hot path).
    This mirrors the reference pipeline's perspective-correct-then-voxelize
    design (SURVEY §2 "Voxel->silhouette projector") and is the TPU-friendly
    formulation: static shapes, no gather/scatter warp.
  * Grid coords: frustum coord c in [-0.5, 0.5] maps to fractional cell
    index g = (c + 0.5) * D - 0.5 (cell centers at (i + 0.5)/D - 0.5).
    Grid axis order is (D=depth, H=image rows=v, W=image cols=u) so the
    collapsed silhouette is directly an (H, W) image.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from tpu_unsup_pc.ops.quaternion import (quat_from_euler, quat_rotate,
                                         quat_to_rotation_matrix)


class Camera(NamedTuple):
    """Batchable camera: leading dims broadcast against point batches."""
    quat: jnp.ndarray       # (..., 4) world->camera rotation, scalar-first
    distance: jnp.ndarray   # (...,)   object-center distance on the z axis
    focal: jnp.ndarray      # (...,)   focal length in half-image-plane units


def camera_quat_from_azel(azimuth, elevation) -> jnp.ndarray:
    """World->camera quaternion for a camera at (azimuth, elevation) on the
    view sphere, looking at the origin (ShapeNet render convention: azimuth
    about the world up axis, elevation above the horizontal plane)."""
    return quat_from_euler(azimuth, elevation)


def make_camera(azimuth, elevation, distance=2.0, focal=1.875) -> Camera:
    q = camera_quat_from_azel(azimuth, elevation)
    shape = q.shape[:-1]
    return Camera(
        quat=q,
        distance=jnp.broadcast_to(jnp.asarray(distance, jnp.float32), shape),
        focal=jnp.broadcast_to(jnp.asarray(focal, jnp.float32), shape),
    )


def world_to_camera(points: jnp.ndarray, cam: Camera) -> jnp.ndarray:
    """(..., N, 3) world points -> camera-frame points."""
    p = quat_rotate(cam.quat, points)
    offset = jnp.stack([jnp.zeros_like(cam.distance),
                        jnp.zeros_like(cam.distance),
                        cam.distance], axis=-1)
    return p + offset[..., None, :]


def camera_to_frustum(p_cam: jnp.ndarray, cam: Camera,
                      depth_extent: float) -> jnp.ndarray:
    """Camera-frame (..., N, 3) -> frustum coords (..., N, 3) in grid-axis
    order (w=depth, v=row, u=col), each nominally in [-0.5, 0.5]."""
    x, y, z = p_cam[..., 0], p_cam[..., 1], p_cam[..., 2]
    z_safe = jnp.maximum(z, 1e-4)  # points behind the pinhole get clamped
    f = cam.focal[..., None]
    u = f * x / z_safe
    v = f * y / z_safe
    w = (z - cam.distance[..., None]) / depth_extent
    return jnp.stack([w, v, u], axis=-1)


def frustum_to_grid(frustum: jnp.ndarray, vox_size: int) -> jnp.ndarray:
    """Frustum coords in [-0.5, 0.5] -> fractional voxel indices in
    [-0.5, D - 0.5] (same cube resolution D on all three axes)."""
    return (frustum + 0.5) * vox_size - 0.5


def world_to_grid_soa(px, py, pz, cam: Camera, vox_size: int,
                      depth_extent: float):
    """Structure-of-arrays world->grid: (..., N) coordinate components in,
    (gz, gy, gx) fractional voxel indices out. Same math as world_to_grid
    but with no 3-wide trailing axis anywhere — on TPU a (..., N, 3) array
    puts 3 on the lane dimension (x128 padding) and feeding one to a
    Pallas custom call forces expensive layout conversions; dense (..., N)
    components tile natively (measured ~15ms/step saved at training
    shapes). Rotation applied via explicit matrix elements."""
    R = quat_to_rotation_matrix(cam.quat)            # (..., 3, 3)

    def r(i, j):
        return R[..., i, j][..., None]

    x = r(0, 0) * px + r(0, 1) * py + r(0, 2) * pz
    y = r(1, 0) * px + r(1, 1) * py + r(1, 2) * pz
    z = (r(2, 0) * px + r(2, 1) * py + r(2, 2) * pz
         + cam.distance[..., None])
    z_safe = jnp.maximum(z, 1e-4)
    f = cam.focal[..., None]
    u = f * x / z_safe
    v = f * y / z_safe
    w = (z - cam.distance[..., None]) / depth_extent

    def to_grid(c):
        return (c + 0.5) * vox_size - 0.5

    return to_grid(w), to_grid(v), to_grid(u)


def world_to_grid(points: jnp.ndarray, cam: Camera, vox_size: int,
                  depth_extent: float) -> jnp.ndarray:
    """Full transform: world points (..., N, 3) -> fractional voxel indices
    (..., N, 3) in (depth, row, col) order. Differentiable w.r.t. both the
    points and the camera quaternion (pose gradients flow through
    quat_rotate and the perspective divide)."""
    p_cam = world_to_camera(points, cam)
    frustum = camera_to_frustum(p_cam, cam, depth_extent)
    return frustum_to_grid(frustum, vox_size)
