"""Perspective voxel-grid resampling (torch `grid_sample` equivalent) —
SURVEY.md §7.2 item 3.

Secondary op: the hot path splats directly in frustum space (ops/camera.py),
but the reference also exposes a world-space-grid -> camera-frustum resample
(DRC-style `util/drc.py` usage [SURVEY §2, unverified]). Provided for parity:
trilinear gather at warped coordinates via map_coordinates, differentiable
w.r.t. both the grid values and the camera pose.

Alignment convention matches the splatter exactly: world coord c in
[-0.5, 0.5] <-> fractional cell index g = (c + 0.5) * D - 0.5 (cell centers
at (i + 0.5)/D - 0.5); out-of-range samples read as 0 (order-1, constant
boundary).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.ndimage import map_coordinates

from tpu_unsup_pc.ops.camera import Camera
from tpu_unsup_pc.ops.quaternion import quat_conjugate, quat_rotate


def world_grid_sample(vox: jnp.ndarray, world_pts: jnp.ndarray,
                      ) -> jnp.ndarray:
    """Trilinearly sample a world-space (D, D, D) grid (axes z, y, x over
    [-0.5, 0.5]^3) at (..., 3) world points (z, y, x order)."""
    D = vox.shape[0]
    g = (world_pts + 0.5) * D - 0.5
    coords = jnp.moveaxis(g, -1, 0)            # (3, ...)
    return map_coordinates(vox, list(coords), order=1, mode="constant",
                           cval=0.0)


def resample_voxels_to_frustum(vox_world: jnp.ndarray, cam: Camera,
                               out_size: int, depth_extent: float,
                               ) -> jnp.ndarray:
    """Resample a world-space occupancy grid into the camera frustum.

    For every frustum cell center (w, v, u) in [-0.5, 0.5]^3 invert the
    perspective map: z = distance + w * depth_extent, x = u * z / f,
    y = v * z / f, rotate camera->world with the conjugate pose quaternion,
    and gather trilinearly from the world grid.

    Returns (out_size,)*3 frustum-space occupancy — feed to
    ops.project.collapse_to_silhouette.
    """
    Do = out_size
    centers = (jnp.arange(Do, dtype=jnp.float32) + 0.5) / Do - 0.5
    w, v, u = jnp.meshgrid(centers, centers, centers, indexing="ij")
    z = cam.distance + w * depth_extent
    x = u * z / cam.focal
    y = v * z / cam.focal
    p_cam = jnp.stack([x, y, z], axis=-1)                  # (Do,Do,Do,3)
    offset = jnp.stack([jnp.zeros_like(cam.distance),
                        jnp.zeros_like(cam.distance), cam.distance], axis=-1)
    p_world = quat_rotate(quat_conjugate(cam.quat),
                          (p_cam - offset).reshape(-1, 3)).reshape(p_cam.shape)
    # world grid is indexed (z, y, x) to match the splatter's (d, h, w)
    p_world_zyx = p_world[..., ::-1]
    return world_grid_sample(vox_world, p_world_zyx)
