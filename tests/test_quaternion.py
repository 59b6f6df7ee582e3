"""Unit tests: quaternion math vs closed form and the torch oracle
(SURVEY.md §4.2)."""

import numpy as np
import torch

import jax.numpy as jnp
from tpu_unsup_pc.ops import quaternion as Q
from oracle import torch_oracle as O


def _rand_quat(rng, n=()):
    q = rng.normal(size=n + (4,)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_normalize(rng):
    q = rng.normal(size=(5, 4)).astype(np.float32)
    out = np.asarray(Q.quat_normalize(jnp.asarray(q)))
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)


def test_rotate_matches_matrix(rng):
    q = _rand_quat(rng, (3,))
    v = rng.normal(size=(3, 10, 3)).astype(np.float32)
    rot = np.asarray(Q.quat_rotate(jnp.asarray(q), jnp.asarray(v)))
    R = np.asarray(Q.quat_to_rotation_matrix(jnp.asarray(q)))
    expected = np.einsum("bij,bnj->bni", R, v)
    np.testing.assert_allclose(rot, expected, atol=1e-5)


def test_rotate_matches_oracle(rng):
    q = _rand_quat(rng)
    v = rng.normal(size=(20, 3)).astype(np.float32)
    ours = np.asarray(Q.quat_rotate(jnp.asarray(q), jnp.asarray(v)))
    oracle = O.quat_rotate(torch.tensor(q), torch.tensor(v)).numpy()
    np.testing.assert_allclose(ours, oracle, atol=1e-5)


def test_multiply_composes_rotations(rng):
    a, b = _rand_quat(rng), _rand_quat(rng)
    v = rng.normal(size=(7, 3)).astype(np.float32)
    ab = Q.quat_multiply(jnp.asarray(a), jnp.asarray(b))
    seq = Q.quat_rotate(jnp.asarray(a),
                        Q.quat_rotate(jnp.asarray(b), jnp.asarray(v)))
    np.testing.assert_allclose(np.asarray(Q.quat_rotate(ab, jnp.asarray(v))),
                               np.asarray(seq), atol=1e-5)


def test_conjugate_inverts(rng):
    q = _rand_quat(rng)
    v = rng.normal(size=(5, 3)).astype(np.float32)
    back = Q.quat_rotate(Q.quat_conjugate(jnp.asarray(q)),
                         Q.quat_rotate(jnp.asarray(q), jnp.asarray(v)))
    np.testing.assert_allclose(np.asarray(back), v, atol=1e-5)


def test_axis_angle_closed_form():
    # 90 deg about z maps x->y
    q = Q.quat_from_axis_angle(jnp.asarray([0.0, 0.0, 1.0]), jnp.pi / 2)
    v = jnp.asarray([[1.0, 0.0, 0.0]])
    np.testing.assert_allclose(np.asarray(Q.quat_rotate(q, v)),
                               [[0.0, 1.0, 0.0]], atol=1e-6)


def test_euler_matches_oracle(rng):
    for az, el in [(0.3, -0.2), (1.5, 0.7), (-2.0, 0.0)]:
        ours = np.asarray(Q.quat_from_euler(az, el))
        oracle = O.quat_from_azel(az, el).numpy()
        assert (np.allclose(ours, oracle, atol=1e-6)
                or np.allclose(ours, -oracle, atol=1e-6))


def test_angle_between():
    a = Q.quat_from_axis_angle(jnp.asarray([0.0, 1.0, 0.0]), 0.0)
    b = Q.quat_from_axis_angle(jnp.asarray([0.0, 1.0, 0.0]), 0.5)
    np.testing.assert_allclose(float(Q.quat_angle_between(a, b)), 0.5,
                               atol=1e-5)
    # sign invariance
    np.testing.assert_allclose(float(Q.quat_angle_between(a, -a)), 0.0,
                               atol=1e-3)
