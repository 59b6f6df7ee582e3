"""Chamfer metric tests on tiny known sets (SURVEY.md §4.2)."""

import numpy as np

import jax.numpy as jnp
from tpu_unsup_pc.ops import chamfer


def test_identical_sets_zero(rng):
    a = jnp.asarray(rng.normal(size=(50, 3)).astype(np.float32))
    assert float(chamfer.chamfer_l2(a, a, chunk=16)) < 1e-6
    assert float(chamfer.chamfer_l1(a, a, chunk=16)) < 1e-4


def test_known_offset():
    a = jnp.zeros((4, 3))
    b = jnp.zeros((4, 3)).at[:, 0].set(0.5)
    # every nearest-neighbor distance is 0.5 both ways
    np.testing.assert_allclose(float(chamfer.chamfer_l1(a, b, chunk=2)),
                               1.0, atol=1e-5)
    np.testing.assert_allclose(float(chamfer.chamfer_l2(a, b, chunk=2)),
                               0.5, atol=1e-5)


def test_asymmetric_sets():
    a = jnp.asarray([[0.0, 0.0, 0.0]])
    b = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    # a->b min dist 0; b->a dists {0, 1}
    np.testing.assert_allclose(float(chamfer.chamfer_l1(a, b, chunk=1)),
                               0.5, atol=1e-5)


def test_chunking_invariance(rng):
    a = jnp.asarray(rng.normal(size=(37, 3)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(53, 3)).astype(np.float32))
    v1 = float(chamfer.chamfer_l1(a, b, chunk=8))
    v2 = float(chamfer.chamfer_l1(a, b, chunk=64))
    np.testing.assert_allclose(v1, v2, rtol=1e-5)
