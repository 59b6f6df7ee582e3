"""Relative-pose evaluation tests: frame invariance and known errors."""

import numpy as np

import jax.numpy as jnp

from tpu_unsup_pc.eval_pose import evaluate_pose
from tpu_unsup_pc.ops.quaternion import (quat_from_axis_angle,
                                         quat_from_euler, quat_multiply)


def _gt(rng, M=4, V=3):
    az = rng.uniform(0, 2 * np.pi, (M, V)).astype(np.float32)
    el = rng.uniform(-0.5, 0.9, (M, V)).astype(np.float32)
    return az, el


def test_perfect_poses_zero_error(rng):
    az, el = _gt(rng)
    q = np.asarray(quat_from_euler(jnp.asarray(az), jnp.asarray(el)))
    stats = evaluate_pose(q, az, el)
    assert stats["pose_err_median_deg"] < 0.1
    assert stats["pose_acc_30deg"] == 1.0


def test_global_canonical_rotation_is_invariant(rng):
    """Multiplying every predicted pose by one global rotation (the
    arbitrary canonical frame) must not change the metric."""
    az, el = _gt(rng)
    q = quat_from_euler(jnp.asarray(az), jnp.asarray(el))
    g = quat_from_axis_angle(jnp.asarray([0.3, 0.8, -0.5]), 1.234)
    q_rot = quat_multiply(q, g)          # same frame shift on every view
    stats = evaluate_pose(np.asarray(q_rot), az, el)
    assert stats["pose_err_median_deg"] < 0.1


def test_known_rotation_error(rng):
    """Perturbing one view's pose by 40 degrees shows up as pairs > 30."""
    az, el = _gt(rng, M=1, V=3)
    q = np.array(quat_from_euler(jnp.asarray(az), jnp.asarray(el)))
    bad = quat_multiply(
        jnp.asarray(q[0, 0]),
        quat_from_axis_angle(jnp.asarray([0.0, 1.0, 0.0]),
                             np.radians(40.0)))
    q[0, 0] = np.asarray(bad)
    stats = evaluate_pose(q, az, el)
    # pairs (0,1) and (0,2) are ~40deg off; pair (1,2) is exact:
    # mean ~= (40 + 40 + 0) / 3 ~= 26.7
    assert stats["pose_acc_30deg"] == 1.0 / 3.0
    assert 20.0 < stats["pose_err_mean_deg"] < 33.0


def test_random_poses_are_bad(rng):
    az, el = _gt(rng)
    q = rng.normal(size=(4, 3, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    stats = evaluate_pose(q, az, el)
    assert stats["pose_err_median_deg"] > 45.0
