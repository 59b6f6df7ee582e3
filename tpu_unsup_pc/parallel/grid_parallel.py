"""Grid-parallel splatting (SURVEY.md §2.2 "SP", §5 "long-context
analogue"): this framework's equivalent of sequence parallelism.

The model has no sequence axis; its long axes are the point count (up to 8k)
and the voxel grid (128^3). When a single projection's splat pressures
per-chip memory — or when one giant cloud should use the whole slice — the
POINT axis is sharded across the mesh: every chip splats its point shard
into a full-resolution local partial grid, and one `psum` over ICI
reduces the partials into the complete grid (splatting is a sum over
points, so the reduction is exact). Expressed with `shard_map`; XLA emits
the all-reduce as a ring over ICI.

Cost model: per chip compute drops N -> N/n_chips; the collective moves one
D^3 grid (e.g. 8MB at 128^3) per projection over ICI — worth it when
N * D footprint work >> grid bytes, i.e. large clouds / few pairs."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map            # jax >= 0.7 canonical location
except ImportError:                      # pragma: no cover
    from jax.experimental.shard_map import shard_map

from tpu_unsup_pc.ops.camera import Camera, world_to_grid
from tpu_unsup_pc.ops.project import collapse_to_silhouette
from tpu_unsup_pc.ops.splat import splat_gauss_separable, static_gauss_radius
from tpu_unsup_pc.utils.config import Config


def _splat_partials(g, sigma, cfg: Config, radius: int):
    """(B, N_local, 3) grid coords -> (B, D, D, D) per-shard partial grids.
    cfg.use_pallas routes through the fused Pallas splat kernel — the fused
    splat+collapse RENDER kernel cannot be point-sharded (the collapse is
    nonlinear in the summed grid), so grid-parallel's fast path is the
    Pallas SPLAT per shard, psum of the partial grids over ICI, then the
    XLA collapse on the replicated sum."""
    D = cfg.vox_size
    B, n_local = g.shape[0], g.shape[1]
    chunk = min(cfg.point_chunk, max(8, 1 << (n_local - 1).bit_length()))
    if cfg.use_pallas and cfg.splat_mode == "gauss":
        from tpu_unsup_pc.ops.pallas.splat_kernel import (
            pad_points, splat_gauss_pallas_batched)
        sigma_b = jnp.broadcast_to(jnp.asarray(sigma, jnp.float32), (B,))
        sigma_k = jnp.sqrt(sigma_b ** 2 + 1.0 / 6.0)  # hat-variance corr.
        return splat_gauss_pallas_batched(pad_points(g, chunk), sigma_k,
                                          D, radius, chunk)
    sigma_b = jnp.broadcast_to(jnp.asarray(sigma, jnp.float32), (B,))
    return jax.vmap(
        lambda gi, si: splat_gauss_separable(
            gi, D, si, radius=radius, chunk=chunk))(g, sigma_b)


def make_grid_parallel_projector(cfg: Config, mesh: Mesh,
                                 axis: str = "data"):
    """Build fn(points (N,3), cam: Camera, sigma) -> (silhouette (H,W),
    voxels (D,D,D)) with the point axis sharded over `axis`.

    N must be divisible by the axis size. The voxel grid and silhouette
    come back replicated on every chip.
    """
    D = cfg.vox_size
    radius = static_gauss_radius(max(cfg.sigma_start, cfg.sigma_end))
    n_shards = mesh.shape[axis]

    def local(points_shard, quat, dist, focal, sigma):
        # points_shard: (N / n_shards, 3); camera + sigma replicated
        cam = Camera(quat=quat, distance=dist, focal=focal)
        g = world_to_grid(points_shard, cam, D, cfg.depth_extent)
        partial = _splat_partials(g[None], sigma, cfg, radius)[0]
        occ = jax.lax.psum(partial, axis)          # ring all-reduce on ICI
        if cfg.clip_voxels:
            occ = jnp.clip(occ, 0.0, 1.0)
        sil, _ = collapse_to_silhouette(occ, cfg.proj_mode)
        return sil, occ

    # check_vma off: the scan carry inside the core splat op is created
    # unvarying (it is a pure library fn, not shard_map-aware); the psum
    # makes the outputs genuinely replicated regardless.
    sharded = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False)

    @functools.wraps(local)
    def project(points, cam: Camera, sigma):
        N = points.shape[0]
        assert N % n_shards == 0, (N, n_shards)
        return sharded(points,
                       jnp.asarray(cam.quat, jnp.float32),
                       jnp.asarray(cam.distance, jnp.float32),
                       jnp.asarray(cam.focal, jnp.float32),
                       jnp.asarray(sigma, jnp.float32))

    return project


def make_batched_grid_parallel_projector(cfg: Config, mesh: Mesh,
                                         batch_axis: str = "data",
                                         point_axis: str = "points"):
    """Two-axis composition — DP x grid-parallel on one mesh: the batch
    axis shards over `batch_axis` while each cloud's POINT axis shards
    over `point_axis`; partial grids psum over the point-axis ring only.
    This is the full scaling recipe for huge clouds at scale (SURVEY §2.2:
    DP is the primary strategy, grid-parallel is the SP analogue; the two
    compose on a 2-D Mesh exactly like dp x sp in a transformer).

    Returns fn(points (B, N, 3), cams: Camera fields (B,...), sigma (B,))
    -> silhouettes (B, H, W), replicated over the point axis."""
    D = cfg.vox_size
    radius = static_gauss_radius(max(cfg.sigma_start, cfg.sigma_end))

    def local(points_shard, quat, dist, focal, sigma):
        # shapes per device: (B/|batch|, N/|points|, 3), cams (B/|batch|,..)
        cam = Camera(quat=quat, distance=dist, focal=focal)
        g = world_to_grid(points_shard, cam, D, cfg.depth_extent)
        partial = _splat_partials(g, sigma, cfg, radius)
        occ = jax.lax.psum(partial, point_axis)
        if cfg.clip_voxels:
            occ = jnp.clip(occ, 0.0, 1.0)
        sil, _ = collapse_to_silhouette(occ, cfg.proj_mode)
        return sil

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(batch_axis, point_axis, None), P(batch_axis),
                  P(batch_axis), P(batch_axis), P(batch_axis)),
        out_specs=P(batch_axis),
        check_vma=False)
