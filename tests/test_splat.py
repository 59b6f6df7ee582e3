"""Splat op tests (SURVEY.md §4.2/4.3): hand-computed corner weights, mass
conservation, scatter-vs-oracle parity, and the separable-matmul (MXU) path
vs the scatter path."""

import numpy as np
import torch

import jax.numpy as jnp
from tpu_unsup_pc.ops import gauss, splat
from oracle import torch_oracle as O

D = 16


def test_single_point_corner_weights():
    # point at fractional position (2.25, 3.5, 4.75) -> 8 corners by hand
    g = jnp.asarray([[2.25, 3.5, 4.75]])
    vox = np.asarray(splat.splat_trilinear(g, D))
    fz, fy, fx = 0.25, 0.5, 0.75
    for dz, wz in ((0, 1 - fz), (1, fz)):
        for dy, wy in ((0, 1 - fy), (1, fy)):
            for dx, wx in ((0, 1 - fx), (1, fx)):
                np.testing.assert_allclose(vox[2 + dz, 3 + dy, 4 + dx],
                                           wz * wy * wx, atol=1e-6)
    np.testing.assert_allclose(vox.sum(), 1.0, atol=1e-6)


def test_mass_conservation_interior(rng):
    g = jnp.asarray(rng.uniform(2, D - 3, size=(100, 3)).astype(np.float32))
    vox = splat.splat_trilinear(g, D)
    np.testing.assert_allclose(float(vox.sum()), 100.0, rtol=1e-5)


def test_out_of_bounds_drops(rng):
    g = jnp.asarray([[-5.0, 3.0, 3.0], [3.0, 3.0, D + 4.0]])
    vox = splat.splat_trilinear(g, D)
    np.testing.assert_allclose(float(vox.sum()), 0.0, atol=1e-6)


def test_scatter_matches_oracle(rng):
    pts = rng.uniform(-1, D, size=(200, 3)).astype(np.float32)
    ours = np.asarray(splat.splat_trilinear(jnp.asarray(pts), D))
    oracle = O.splat_trilinear(torch.tensor(pts, dtype=torch.float64), D)
    np.testing.assert_allclose(ours, oracle.numpy(), atol=1e-4)


def test_scatter_values_matches_oracle(rng):
    pts = rng.uniform(0, D - 1, size=(50, 3)).astype(np.float32)
    vals = rng.uniform(size=(50, 3)).astype(np.float32)
    ours = np.asarray(splat.splat_trilinear(jnp.asarray(pts), D,
                                            jnp.asarray(vals)))
    oracle = O.splat_trilinear(torch.tensor(pts, dtype=torch.float64), D,
                               torch.tensor(vals, dtype=torch.float64))
    np.testing.assert_allclose(ours, oracle.numpy(), atol=1e-4)


def test_separable_hat_equals_scatter(rng):
    """The MXU separable path with hat footprints must match scatter-add
    exactly (same math, different contraction order)."""
    pts = rng.uniform(-1, D, size=(130, 3)).astype(np.float32)
    sep = np.asarray(splat.splat_gauss_separable(
        jnp.asarray(pts), D, sigma=1.0, mode="hat", chunk=32))
    sca = np.asarray(splat.splat_trilinear(jnp.asarray(pts), D))
    np.testing.assert_allclose(sep, sca, atol=1e-5)


def test_separable_hat_values_equal_scatter(rng):
    pts = rng.uniform(0, D - 1, size=(40, 3)).astype(np.float32)
    vals = rng.uniform(size=(40, 2)).astype(np.float32)
    sep = np.asarray(splat.splat_gauss_separable(
        jnp.asarray(pts), D, sigma=1.0, values=jnp.asarray(vals),
        mode="hat", chunk=16))
    sca = np.asarray(splat.splat_trilinear(jnp.asarray(pts), D,
                                           jnp.asarray(vals)))
    np.testing.assert_allclose(sep, sca, atol=1e-5)


def test_gauss_mass_conservation(rng):
    """Points further than ~4 sigma from every grid edge deposit exactly
    unit mass under the normalized Gaussian footprint, for annealed sigmas
    large and small (edge points lose mass by design, like zero-padded
    blur)."""
    for sigma, Dg in ((0.3, 16), (0.7, 16), (1.5, 24), (3.0, 40)):
        margin = 4.0 * sigma + 1.0
        g = jnp.asarray(rng.uniform(margin, Dg - 1 - margin,
                                    size=(64, 3)).astype(np.float32))
        radius = splat.static_gauss_radius(3.0)
        vox = splat.splat_gauss_separable(g, Dg, sigma, radius=radius,
                                          chunk=64)
        np.testing.assert_allclose(float(vox.sum()), 64.0, rtol=1e-4)


def test_gauss_approximates_trilinear_blur(rng):
    """Direct Gaussian footprint ~= trilinear splat + Gaussian blur (the
    reference pipeline). Agreement tightens as sigma grows; this pins the
    fused fast path to the parity path within a loose tolerance."""
    pts = rng.uniform(3, D - 4, size=(80, 3)).astype(np.float32)
    sigma, radius = 1.5, splat.static_gauss_radius(2.0)
    fused = np.asarray(splat.splat_gauss_separable(
        jnp.asarray(pts), D, sigma, radius=radius, chunk=32))
    blurred = np.asarray(gauss.smoothen_voxels(
        splat.splat_trilinear(jnp.asarray(pts), D), sigma, radius))
    assert np.abs(fused - blurred).max() < 0.02 * blurred.max()
    np.testing.assert_allclose(fused.sum(), blurred.sum(), rtol=1e-3)


def test_blur_matches_oracle(rng):
    vox = rng.uniform(size=(D, D, D)).astype(np.float32)
    sigma, radius = 1.2, 5
    ours = np.asarray(gauss.smoothen_voxels(jnp.asarray(vox), sigma, radius))
    oracle = O.smoothen_voxels(torch.tensor(vox, dtype=torch.float64),
                               sigma, radius)
    np.testing.assert_allclose(ours, oracle.numpy(), atol=1e-4)
