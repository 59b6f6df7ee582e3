"""Camera transform tests: closed-form anchors + oracle parity
(SURVEY.md §4.2)."""

import numpy as np
import torch

import jax.numpy as jnp
from tpu_unsup_pc.ops import camera as C
from oracle import torch_oracle as O

DIST, FOCAL, DEPTH_EXT, D = 2.0, 1.875, 1.2, 32


def test_origin_maps_to_grid_center():
    cam = C.make_camera(0.7, -0.3, DIST, FOCAL)
    g = C.world_to_grid(jnp.zeros((1, 3)), cam, D, DEPTH_EXT)
    np.testing.assert_allclose(np.asarray(g)[0], [D / 2 - 0.5] * 3,
                               atol=1e-4)


def test_depth_axis_orientation():
    # a point pushed along camera +z (azimuth=el=0 => world +z) lands deeper
    cam = C.make_camera(0.0, 0.0, DIST, FOCAL)
    pts = jnp.asarray([[0.0, 0.0, 0.3], [0.0, 0.0, -0.3]])
    g = np.asarray(C.world_to_grid(pts, cam, D, DEPTH_EXT))
    assert g[0, 0] > g[1, 0]           # +z in front -> larger depth index
    np.testing.assert_allclose(g[:, 1:], D / 2 - 0.5, atol=1e-4)


def test_perspective_shrinks_far_objects():
    cam = C.make_camera(0.0, 0.0, DIST, FOCAL)
    near = jnp.asarray([[0.2, 0.0, -0.3]])
    far = jnp.asarray([[0.2, 0.0, 0.3]])
    gn = np.asarray(C.world_to_grid(near, cam, D, DEPTH_EXT))
    gf = np.asarray(C.world_to_grid(far, cam, D, DEPTH_EXT))
    center = D / 2 - 0.5
    assert abs(gn[0, 2] - center) > abs(gf[0, 2] - center)


def test_world_to_grid_matches_oracle(rng):
    pts = (rng.uniform(-0.5, 0.5, size=(50, 3))).astype(np.float32)
    for az, el in [(0.0, 0.0), (1.1, 0.4), (-2.3, -0.8)]:
        cam = C.make_camera(az, el, DIST, FOCAL)
        ours = np.asarray(C.world_to_grid(jnp.asarray(pts), cam, D,
                                          DEPTH_EXT))
        oracle = O.world_to_grid(
            torch.tensor(pts, dtype=torch.float64),
            O.quat_from_azel(az, el), DIST, FOCAL, D, DEPTH_EXT).numpy()
        np.testing.assert_allclose(ours, oracle, atol=1e-3)


def test_batched_cameras_broadcast(rng):
    pts = rng.uniform(-0.5, 0.5, size=(4, 20, 3)).astype(np.float32)
    az = jnp.asarray(rng.uniform(0, 6.28, size=(4,)).astype(np.float32))
    el = jnp.asarray(rng.uniform(-1, 1, size=(4,)).astype(np.float32))
    cam = C.make_camera(az, el, DIST, FOCAL)
    g = C.world_to_grid(jnp.asarray(pts), cam, D, DEPTH_EXT)
    assert g.shape == (4, 20, 3)
    # row 2 must equal the unbatched transform
    cam2 = C.make_camera(float(az[2]), float(el[2]), DIST, FOCAL)
    g2 = C.world_to_grid(jnp.asarray(pts[2]), cam2, D, DEPTH_EXT)
    np.testing.assert_allclose(np.asarray(g[2]), np.asarray(g2), atol=1e-5)
