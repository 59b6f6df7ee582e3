"""Gradient tests (SURVEY.md §4.3): finite-difference checks on the
projector stack — the analytic-backward contract [BASELINE north_star]."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.test_util import check_grads

from tpu_unsup_pc.ops import camera as C
from tpu_unsup_pc.ops import project as P
from tpu_unsup_pc.ops import splat, chamfer
from tpu_unsup_pc.utils.config import Config

CFG = Config(vox_size=12, sigma_start=1.5, sigma_end=0.8, point_chunk=16)


def test_splat_gauss_grads(rng):
    g = jnp.asarray(rng.uniform(2, 9, size=(12, 3)).astype(np.float32))

    def f(gc):
        return jnp.sum(splat.splat_gauss_separable(gc, 12, 1.0, radius=7,
                                                   chunk=4) ** 2)
    check_grads(f, (g,), order=1, modes=["rev"], atol=1e-2, rtol=1e-2)


def test_splat_trilinear_grads(rng):
    # keep coords away from integer lattice (hat kink) for finite diffs
    g = jnp.asarray((rng.uniform(2, 9, size=(10, 3)) // 0.1 * 0.1 + 0.04
                     ).astype(np.float32))

    def f(gc):
        return jnp.sum(splat.splat_trilinear(gc, 12) ** 2)
    check_grads(f, (g,), order=1, modes=["rev"], atol=1e-2, rtol=1e-2)


def test_projector_grads_wrt_points_and_pose(rng):
    pts = jnp.asarray(rng.uniform(-0.3, 0.3, size=(16, 3)).astype(np.float32))
    target = jnp.zeros((CFG.vox_size, CFG.vox_size))

    def loss(p, az, el):
        cam = C.make_camera(az, el, CFG.camera_distance, CFG.focal_length)
        out = P.project_pointcloud(p, cam, 1.0, CFG)
        return jnp.mean((out.silhouette - target) ** 2)

    check_grads(loss, (pts, 0.7, 0.2), order=1, modes=["rev"],
                atol=1e-2, rtol=1e-2)
    grads = jax.grad(loss, argnums=(0, 1, 2))(pts, 0.7, 0.2)
    for gr in grads:
        assert np.all(np.isfinite(np.asarray(gr)))


def test_sigma_grad_flows():
    pts = jnp.asarray([[0.1, 0.0, -0.1], [0.0, 0.2, 0.0]], jnp.float32)

    def loss(sigma):
        cam = C.make_camera(0.3, 0.1, CFG.camera_distance, CFG.focal_length)
        return jnp.mean(P.project_pointcloud(pts, cam, sigma, CFG)
                        .silhouette)
    g = jax.grad(loss)(1.2)
    assert np.isfinite(float(g)) and abs(float(g)) > 0


def test_chamfer_grads(rng):
    a = jnp.asarray(rng.normal(size=(30, 3)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(40, 3)).astype(np.float32))
    check_grads(lambda x: chamfer.chamfer_l2(x, b, chunk=8), (a,), order=1,
                modes=["rev"], atol=1e-2, rtol=1e-2)
