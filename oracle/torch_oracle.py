"""FROZEN torch-CPU oracle for the differentiable projector (SURVEY.md §4.1).

The reference mount was empty at build time (SURVEY.md §0), so this module is
the numerical ground truth the JAX framework is pinned against: a deliberately
naive, loop-free-but-unoptimized torch implementation of
splat -> smooth -> project -> loss, written once and kept frozen. When
/root/reference is restored, validate THIS file against the real reference
once, then keep it as the fast test fixture.

Everything here mirrors the conventions documented in
tpu_unsup_pc/ops/camera.py (scalar-first quaternions, y-down camera,
post-perspective splatting, cell centers at (i+0.5)/D-0.5). Pure torch CPU,
float64-capable for tight tolerances. DO NOT import jax here.
"""

from __future__ import annotations

import math

import torch


# ---------------------------------------------------------------- quaternion
def quat_normalize(q):
    return q / q.norm(dim=-1, keepdim=True).clamp_min(1e-8)


def quat_rotate(q, v):
    """Rotate (N,3) points by a unit quaternion (4,) via the 3x3 matrix."""
    q = quat_normalize(q)
    w, x, y, z = q.unbind(-1)
    R = torch.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    ]).reshape(3, 3).to(v.dtype)
    return v @ R.T


def quat_from_azel(azimuth: float, elevation: float,
                   dtype=torch.float64) -> torch.Tensor:
    """q = q_el * q_az; azimuth about world +y, elevation about camera +x."""
    def axis_angle(ax, ang):
        ax = torch.tensor(ax, dtype=dtype)
        return torch.cat([torch.tensor([math.cos(ang / 2)], dtype=dtype),
                          math.sin(ang / 2) * ax])
    q_az = axis_angle([0.0, 1.0, 0.0], azimuth)
    q_el = axis_angle([1.0, 0.0, 0.0], elevation)
    return _quat_mul(q_el, q_az)


def _quat_mul(a, b):
    aw, ax, ay, az = a.unbind(-1)
    bw, bx, by, bz = b.unbind(-1)
    return torch.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], dim=-1)


# ------------------------------------------------------------------- camera
def world_to_grid(points, quat, distance, focal, vox_size, depth_extent):
    """(N,3) world points -> (N,3) fractional voxel indices (depth,row,col)."""
    p = quat_rotate(quat, points)
    p = p + torch.tensor([0.0, 0.0, distance], dtype=points.dtype)
    x, y, z = p.unbind(-1)
    z_safe = z.clamp_min(1e-4)
    u = focal * x / z_safe
    v = focal * y / z_safe
    w = (z - distance) / depth_extent
    frustum = torch.stack([w, v, u], dim=-1)
    return (frustum + 0.5) * vox_size - 0.5


# -------------------------------------------------------------------- splat
def splat_trilinear(grid_coords, vox_size, values=None):
    """Trilinear scatter; out-of-range corner contributions drop."""
    D = vox_size
    N = grid_coords.shape[0]
    dtype = grid_coords.dtype
    base = grid_coords.floor()
    frac = grid_coords - base
    base = base.long()
    C = 1 if values is None else values.shape[-1]
    vox = torch.zeros(D * D * D, C, dtype=dtype)
    vals = torch.ones(N, 1, dtype=dtype) if values is None else values
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                off = torch.tensor([dz, dy, dx])
                corner = base + off
                w = torch.where(off.bool(), frac, 1.0 - frac).prod(-1)
                ok = ((corner >= 0) & (corner < D)).all(-1)
                idx = (corner[:, 0] * D + corner[:, 1]) * D + corner[:, 2]
                idx = idx.clamp(0, D * D * D - 1)
                contrib = torch.where(ok, w, torch.zeros_like(w))
                vox.index_add_(0, idx, contrib[:, None] * vals)
    vox = vox.reshape(D, D, D, C)
    if values is None:
        return vox[..., 0]
    return vox.permute(3, 0, 1, 2)


# ------------------------------------------------------------------ smooth
def gaussian_kernel1d(sigma, radius, dtype=torch.float64):
    x = torch.arange(-radius, radius + 1, dtype=dtype)
    k = torch.exp(-(x ** 2) / (2.0 * sigma ** 2))
    return k / k.sum()


def smoothen_voxels(vox, sigma, radius):
    """Separable zero-padded 3D blur of (D,H,W) (or (C,D,H,W))."""
    k = gaussian_kernel1d(sigma, radius, vox.dtype)
    squeeze = vox.dim() == 3
    if squeeze:
        vox = vox[None]
    C = vox.shape[0]
    x = vox[None]                                    # (1, C, D, H, W)
    for axis in range(3):
        shape = [1, 1, 1, 1, 1]
        shape[2 + axis] = -1
        kk = k.reshape(shape).expand(C, 1, *shape[2:]).contiguous()
        pad = [0, 0, 0, 0, 0, 0]
        pad[2 * (2 - axis)] = radius
        pad[2 * (2 - axis) + 1] = radius
        x = torch.nn.functional.conv3d(
            torch.nn.functional.pad(x, pad), kk, groups=C)
    out = x[0]
    return out[0] if squeeze else out


# ----------------------------------------------------------------- project
def collapse_drc(vox, eps=1e-6):
    """(D,H,W) -> (silhouette (H,W), stop weights (D,H,W)); depth axis 0."""
    v = vox.clamp(0.0, 1.0 - eps)
    trans = torch.cumprod(1.0 - v, dim=0)
    trans_before = torch.cat([torch.ones_like(trans[:1]), trans[:-1]], dim=0)
    w = v * trans_before
    sil = 1.0 - trans[-1]
    return sil, w


def project_pointcloud(points, quat, distance, focal, vox_size, depth_extent,
                       sigma, radius, proj_mode="drc", clip_voxels=True,
                       rgb=None):
    """Full oracle projector: trilinear splat -> blur -> clip -> collapse.
    Mirrors tpu_unsup_pc.ops.project.project_pointcloud with
    splat_mode='trilinear_blur'. Returns (silhouette, voxels[, rgb_image])."""
    g = world_to_grid(points, quat, distance, focal, vox_size, depth_extent)
    occ_raw = splat_trilinear(g, vox_size)
    rgb_grid = None
    if rgb is not None:
        rgb_grid = splat_trilinear(g, vox_size, rgb)
    occ = smoothen_voxels(occ_raw, sigma, radius)
    if rgb_grid is not None:
        rgb_grid = smoothen_voxels(rgb_grid, sigma, radius)
        occ_for_color = smoothen_voxels(occ_raw, sigma, radius)
    if clip_voxels:
        occ = occ.clamp(0.0, 1.0)
    if proj_mode == "max":
        sil = occ.clamp(0, 1).max(dim=0).values
        w = None
    elif proj_mode == "sum":
        sil = occ.clamp(0, 1).sum(dim=0).clamp(0.0, 1.0)
        w = None
    else:
        sil, w = collapse_drc(occ)
    if rgb is None:
        return sil, occ
    cell_color = rgb_grid / occ_for_color.clamp_min(1e-6)
    img = torch.einsum("dhw,cdhw->hwc", w, cell_color)
    return sil, occ, img
