"""Pallas splat kernel tests (SURVEY.md §4.3, §5 "race detection"): the
pure-JAX separable path is the kernel's fake backend — fwd/bwd equivalence
on random and adversarial inputs (all points in one cell: the scatter-race
case, race-free here by construction). Runs in interpreter mode on CPU;
the same assertions run compiled on TPU via the verify drive."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_unsup_pc.ops.pallas.splat_kernel import (pad_points,
                                                  splat_gauss_pallas_batched)

# interpret-mode kernel equivalence dominates suite wall time on the 1-core
# host; fast CI tier = `-m "not slow"` (README), full tier = TPUCHECK
pytestmark = pytest.mark.slow
from tpu_unsup_pc.ops.splat import splat_gauss_separable

# Mosaic needs chunk-slice offsets provably 128-aligned on the lane axis
# (compiled TPU); interpret mode (CPU CI) has no such constraint, so keep
# the fast tiny shapes there and the aligned ones under TPU_TESTS=1.
import os as _os
if _os.environ.get("TPU_TESTS"):
    D, N, P, CHUNK, RADIUS = 16, 256, 3, 128, 9
else:
    D, N, P, CHUNK, RADIUS = 16, 96, 3, 32, 9
# scale-aware kernel-vs-XLA tolerances (measured on-chip margins +
# headroom; see tests/_tolerances.py). References run at highest matmul
# precision so the bound measures the KERNEL's error, not MXU ref-noise
# (see ref_precision's docstring for the on-chip numbers).
from tests._tolerances import check_fwd, check_grad, ref_precision


def _ref(g, sigma):
    with ref_precision():
        return jnp.stack([
            splat_gauss_separable(g[i], D, float(sigma[i]), radius=RADIUS,
                                  chunk=CHUNK, hat_correction=False)
            for i in range(g.shape[0])])


def test_forward_matches_separable(rng):
    g = jnp.asarray(rng.uniform(-1, D, size=(P, N, 3)).astype(np.float32))
    sigma = jnp.asarray([1.0, 1.7, 0.8], jnp.float32)
    out = splat_gauss_pallas_batched(g, sigma, D, RADIUS, CHUNK)
    check_fwd(out, _ref(g, sigma), "splat_fwd")


def test_backward_matches_separable(rng):
    g = jnp.asarray(rng.uniform(0, D, size=(P, N, 3)).astype(np.float32))
    sigma = jnp.asarray([1.2, 0.9, 1.5], jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(P, D, D, D)).astype(np.float32))

    gk = jax.grad(lambda x: jnp.sum(
        splat_gauss_pallas_batched(x, sigma, D, RADIUS, CHUNK) * tgt))(g)
    gr = jax.grad(lambda x: jnp.sum(_ref(x, sigma) * tgt))(g)
    check_grad(gk, gr, "splat_grad")


def test_adversarial_all_points_one_cell(rng):
    """The scatter-race stress case: every point in the same cell. The
    matmul formulation must accumulate exactly N-fold mass."""
    g = jnp.full((1, N, 3), D / 2 - 0.5) + jnp.asarray(
        rng.normal(size=(1, N, 3)).astype(np.float32)) * 1e-3
    sigma = jnp.asarray([1.0], jnp.float32)
    out = splat_gauss_pallas_batched(g, sigma, D, RADIUS, CHUNK)
    check_fwd(float(out.sum()), float(N), "splat_adversarial_mass")
    check_fwd(out, _ref(g, sigma), "splat_adversarial_fwd")


def test_rgb_splat_matches_separable(rng):
    """Standalone RGB splat kernel == the XLA values splat, fwd and grads
    w.r.t. coords AND colors (and the single-cloud adapter has no XLA
    fallback left)."""
    from tpu_unsup_pc.ops.pallas.splat_kernel import (
        splat_gauss_pallas, splat_gauss_rgb_pallas_batched)
    g = jnp.asarray(rng.uniform(0, D, size=(P, N, 3)).astype(np.float32))
    c = jnp.asarray(rng.uniform(size=(P, N, 3)).astype(np.float32))
    sigma = jnp.asarray([1.1, 0.9, 1.4], jnp.float32)

    def ref(gg, cc):
        with ref_precision():
            vals = jnp.concatenate([jnp.ones_like(cc[..., :1]), cc],
                                   axis=-1)
            return jnp.stack([
                splat_gauss_separable(gg[i], D, float(sigma[i]),
                                      values=vals[i], radius=RADIUS,
                                      chunk=CHUNK, hat_correction=False)
                for i in range(gg.shape[0])])

    out = splat_gauss_rgb_pallas_batched(g, c, sigma, D, RADIUS, CHUNK)
    check_fwd(out, ref(g, c), "rgb_splat_fwd")
    tgt = jnp.asarray(rng.normal(size=out.shape).astype(np.float32))
    gk, ck = jax.grad(lambda a, b: jnp.sum(splat_gauss_rgb_pallas_batched(
        a, b, sigma, D, RADIUS, CHUNK) * tgt), argnums=(0, 1))(g, c)
    gr, cr = jax.grad(lambda a, b: jnp.sum(ref(a, b) * tgt),
                      argnums=(0, 1))(g, c)
    check_grad(gk, gr, "rgb_splat_dcoords")
    check_grad(ck, cr, "rgb_splat_dcolors")
    # adapter path (odd N exercises color padding)
    grids = splat_gauss_pallas(g[0, :41], D, 1.1, rgb=c[0, :41],
                               radius=RADIUS, chunk=CHUNK,
                               hat_correction=False)
    ref41 = ref(g[:1, :41], c[:1, :41])[0]
    check_fwd(grids["occupancy"], ref41[0], "rgb_adapter_occ")
    check_fwd(grids["rgb"], ref41[1:], "rgb_adapter_rgb")


def test_padding_is_mass_neutral(rng):
    g = rng.uniform(5, D - 6, size=(1, 40, 3)).astype(np.float32)
    padded = pad_points(jnp.asarray(g), CHUNK)
    assert padded.shape[1] % CHUNK == 0 and padded.shape[1] >= 40
    sigma = jnp.asarray([1.0], jnp.float32)
    out = splat_gauss_pallas_batched(padded, sigma, D, RADIUS, CHUNK)
    check_fwd(float(out.sum()), 40.0, "padding_mass")


def test_per_pair_sigma(rng):
    """Each batch element uses its own sigma (annealed + per-cloud scale)."""
    g = jnp.asarray(rng.uniform(4, D - 5, size=(2, N, 3)).astype(np.float32))
    sigma = jnp.asarray([0.6, 2.2], jnp.float32)
    out = np.asarray(splat_gauss_pallas_batched(g, sigma, D, RADIUS, CHUNK))
    # the wider-sigma grid has a strictly lower max (same mass, more spread)
    assert out[1].max() < out[0].max()
    # tight sigma: exact unit mass; wide sigma: bounded edge loss on D=16
    np.testing.assert_allclose(out[0].sum(), N, rtol=1e-3)
    assert 0.8 * N < out[1].sum() <= N * (1 + 1e-3)


def test_batched_projector_matches_single(rng):
    """project_pointclouds_batched == vmap(project_pointcloud) on the XLA
    path (the loss's flattened-pair rendering is equivalence-tested)."""
    from tpu_unsup_pc.configs import presets
    from tpu_unsup_pc.ops.camera import make_camera
    from tpu_unsup_pc.ops.project import (project_pointcloud,
                                          project_pointclouds_batched)
    cfg = presets.get("tiny").replace(vox_size=16, point_chunk=32)
    pts = jnp.asarray(rng.uniform(-0.4, 0.4, size=(3, 64, 3))
                      .astype(np.float32))
    az = jnp.asarray([0.3, 1.5, -2.0], jnp.float32)
    el = jnp.asarray([0.1, -0.2, 0.5], jnp.float32)
    cams = make_camera(az, el, cfg.camera_distance, cfg.focal_length)
    batched = project_pointclouds_batched(pts, cams, 1.1, cfg)
    for i in range(3):
        cam_i = make_camera(float(az[i]), float(el[i]), cfg.camera_distance,
                            cfg.focal_length)
        single = project_pointcloud(pts[i], cam_i, 1.1, cfg)
        check_fwd(batched.silhouette[i], single.silhouette,
                  "batched_projector_sil")


def test_batched_projector_rgb(rng):
    from tpu_unsup_pc.configs import presets
    from tpu_unsup_pc.ops.camera import make_camera
    from tpu_unsup_pc.ops.project import (project_pointcloud,
                                          project_pointclouds_batched)
    cfg = presets.get("tiny").replace(vox_size=16, point_chunk=32)
    pts = jnp.asarray(rng.uniform(-0.4, 0.4, size=(2, 48, 3))
                      .astype(np.float32))
    rgb = jnp.asarray(rng.uniform(size=(2, 48, 3)).astype(np.float32))
    az = jnp.asarray([0.3, 1.5], jnp.float32)
    el = jnp.asarray([0.1, -0.2], jnp.float32)
    cams = make_camera(az, el, cfg.camera_distance, cfg.focal_length)
    batched = project_pointclouds_batched(pts, cams, 1.1, cfg, rgb=rgb)
    cam0 = make_camera(0.3, 0.1, cfg.camera_distance, cfg.focal_length)
    single = project_pointcloud(pts[0], cam0, 1.1, cfg, rgb=rgb[0])
    check_fwd(batched.rgb_image[0], single.rgb_image,
              "batched_projector_rgb")
