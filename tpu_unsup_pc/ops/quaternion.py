"""Quaternion math (SURVEY.md §2 "Camera / pose math", L1).

Convention: quaternions are (w, x, y, z), scalar-first, unit-normalized,
representing rotations acting on column vectors: ``v' = q v q*``. All
functions broadcast over leading batch dims and are jit/vmap/grad-safe.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    """Normalize to unit quaternion; safe at ||q|| -> 0 (returns identity-ish
    direction w/o NaN so the pose head can emit raw linear outputs)."""
    norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(norm, _EPS)


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b, broadcasting over leading dims."""
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], axis=-1)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v (..., N, 3) by unit quaternions q (..., 4).

    Uses the matrix-free form  v' = v + 2 w (u x v) + 2 u x (u x v)  with
    u = q.xyz — two cross products, cheap on the VPU, no 3x3 materialized.
    """
    q = quat_normalize(q)
    w = q[..., None, :1]                       # (..., 1, 1)
    u = q[..., None, 1:]                       # (..., 1, 3)
    uv = jnp.cross(jnp.broadcast_to(u, v.shape), v)
    uuv = jnp.cross(jnp.broadcast_to(u, v.shape), uv)
    return v + 2.0 * (w * uv + uuv)


def quat_from_axis_angle(axis: jnp.ndarray, angle) -> jnp.ndarray:
    """Unit quaternion rotating by `angle` (radians) around `axis` (3,)."""
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True),
                              _EPS)
    angle = jnp.asarray(angle)[..., None]
    return jnp.concatenate(
        [jnp.cos(angle / 2.0), jnp.sin(angle / 2.0) * axis], axis=-1)


def quat_from_euler(azimuth, elevation, roll=0.0) -> jnp.ndarray:
    """Quaternion for intrinsic z-y-x style azimuth/elevation/roll (radians).

    Applied as q = q_roll * q_el * q_az (azimuth about world y-up first, then
    elevation about camera x, then roll about camera z).
    """
    az = jnp.asarray(azimuth, jnp.float32)
    el = jnp.asarray(elevation, jnp.float32)
    rl = jnp.broadcast_to(jnp.asarray(roll, jnp.float32), az.shape)
    q_az = quat_from_axis_angle(jnp.asarray([0.0, 1.0, 0.0]), az)
    q_el = quat_from_axis_angle(jnp.asarray([1.0, 0.0, 0.0]), el)
    q_rl = quat_from_axis_angle(jnp.asarray([0.0, 0.0, 1.0]), rl)
    return quat_multiply(q_rl, quat_multiply(q_el, q_az))


def quat_to_rotation_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) -> (..., 3, 3) rotation matrix (row-major, acts on columns)."""
    q = quat_normalize(q)
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    r = jnp.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    ], axis=-1)
    return r.reshape(q.shape[:-1] + (3, 3))


def quat_angle_between(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Geodesic angle (radians) between rotations a, b; sign-invariant
    (q and -q are the same rotation). Used for the student–teacher pose loss
    metric (SURVEY §3.2)."""
    a = quat_normalize(a)
    b = quat_normalize(b)
    dot = jnp.abs(jnp.sum(a * b, axis=-1))
    return 2.0 * jnp.arccos(jnp.clip(dot, 0.0, 1.0 - 1e-7))
