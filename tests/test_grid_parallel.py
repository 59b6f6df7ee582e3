"""Grid-parallel (point-axis-sharded) splatting tests on the virtual
8-device mesh (SURVEY.md §2.2 SP / §4.5)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_unsup_pc.configs import presets
from tpu_unsup_pc.ops.camera import make_camera
from tpu_unsup_pc.ops.project import project_pointcloud
from tpu_unsup_pc.parallel import make_mesh
from tpu_unsup_pc.parallel.grid_parallel import make_grid_parallel_projector

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")

CFG = presets.get("tiny").replace(mesh_shape=(8,), vox_size=16,
                                  point_chunk=32)


def test_grid_parallel_matches_single_device(rng):
    mesh = make_mesh(CFG)
    project = make_grid_parallel_projector(CFG, mesh)
    pts = jnp.asarray(rng.uniform(-0.4, 0.4, size=(256, 3))
                      .astype(np.float32))
    cam = make_camera(0.9, 0.2, CFG.camera_distance, CFG.focal_length)
    sil_p, occ_p = jax.jit(project)(pts, cam, 1.1)
    ref = project_pointcloud(pts, cam, 1.1, CFG)
    np.testing.assert_allclose(np.asarray(occ_p), np.asarray(ref.voxels),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(sil_p),
                               np.asarray(ref.silhouette), atol=1e-5)


def test_grid_parallel_grads_match(rng):
    mesh = make_mesh(CFG)
    project = make_grid_parallel_projector(CFG, mesh)
    pts = jnp.asarray(rng.uniform(-0.4, 0.4, size=(128, 3))
                      .astype(np.float32))
    cam = make_camera(0.4, 0.5, CFG.camera_distance, CFG.focal_length)

    def loss_sharded(p):
        sil, _ = project(p, cam, 1.0)
        return jnp.mean(sil ** 2)

    def loss_ref(p):
        return jnp.mean(project_pointcloud(p, cam, 1.0, CFG)
                        .silhouette ** 2)

    ga = jax.jit(jax.grad(loss_sharded))(pts)
    gb = jax.grad(loss_ref)(pts)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-5)


def test_two_axis_dp_x_grid_parallel(rng):
    """DP x grid-parallel on a 2-D mesh (4 batch x 2 point shards) matches
    the unsharded batched projector."""
    import numpy as np_
    from jax.sharding import Mesh
    from tpu_unsup_pc.ops.project import project_pointclouds_batched
    from tpu_unsup_pc.parallel.grid_parallel import (
        make_batched_grid_parallel_projector)

    mesh = Mesh(np_.asarray(jax.devices()[:8]).reshape(4, 2),
                ("data", "points"))
    B, N = 4, 128
    pts = jnp.asarray(rng.uniform(-0.4, 0.4, size=(B, N, 3))
                      .astype(np.float32))
    az = jnp.asarray(rng.uniform(0, 6.28, B).astype(np.float32))
    el = jnp.asarray(rng.uniform(-0.3, 0.9, B).astype(np.float32))
    cams = make_camera(az, el, CFG.camera_distance, CFG.focal_length)
    sigma = jnp.full((B,), 1.1, jnp.float32)
    project = make_batched_grid_parallel_projector(CFG, mesh)
    sil = jax.jit(project)(pts, cams.quat, cams.distance, cams.focal,
                           sigma)
    ref = project_pointclouds_batched(pts, cams, sigma, CFG)
    np.testing.assert_allclose(np.asarray(sil),
                               np.asarray(ref.silhouette), atol=1e-5)


def test_grid_parallel_pallas_matches_unsharded(rng):
    """The Pallas-splat grid-parallel fast path (per-shard kernel splat +
    psum of partial grids) == the unsharded XLA projector, values and
    point gradients."""
    cfg = CFG.replace(use_pallas=True)
    mesh = make_mesh(cfg)
    project = make_grid_parallel_projector(cfg, mesh)
    pts = jnp.asarray(rng.uniform(-0.4, 0.4, size=(128, 3))
                      .astype(np.float32))
    cam = make_camera(0.7, 0.3, cfg.camera_distance, cfg.focal_length)
    sil_p, occ_p = jax.jit(project)(pts, cam, 1.1)
    ref = project_pointcloud(pts, cam, 1.1, CFG)   # XLA, unsharded
    np.testing.assert_allclose(np.asarray(occ_p), np.asarray(ref.voxels),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(sil_p),
                               np.asarray(ref.silhouette), atol=1e-4)

    def loss_sharded(p):
        sil, _ = project(p, cam, 1.0)
        return jnp.mean(sil ** 2)

    def loss_ref(p):
        return jnp.mean(project_pointcloud(p, cam, 1.0, CFG)
                        .silhouette ** 2)

    ga = jax.jit(jax.grad(loss_sharded))(pts)
    gb = jax.grad(loss_ref)(pts)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-4)


def test_indivisible_points_raise(rng):
    mesh = make_mesh(CFG)
    project = make_grid_parallel_projector(CFG, mesh)
    pts = jnp.zeros((100, 3))  # 100 % 8 != 0
    cam = make_camera(0.0, 0.0, CFG.camera_distance, CFG.focal_length)
    with pytest.raises(AssertionError):
        project(pts, cam, 1.0)
