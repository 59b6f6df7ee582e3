"""Chamfer distances for evaluation (SURVEY.md §2 "Prediction / eval",
§3.3). Chamfer-L1 is the parity metric [BASELINE.json:2].

Implemented as a chunked pairwise min-reduce: rows of the predicted set are
processed in static chunks under lax.map so N x M never materializes at
8k x 8k; each chunk's distance block is a (chunk, M) matmul-shaped op that
XLA fuses cleanly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _min_dists(a: jnp.ndarray, b: jnp.ndarray, chunk: int) -> jnp.ndarray:
    """For each point in a (N,3): squared distance to nearest point in b
    (M,3). Returns (N,)."""
    n = a.shape[0]
    pad = (-n) % chunk
    a_p = jnp.pad(a, ((0, pad), (0, 0)))
    chunks = a_p.reshape(-1, chunk, 3)
    b_sq = jnp.sum(b * b, axis=-1)

    def one(ac):
        d2 = (jnp.sum(ac * ac, axis=-1)[:, None] + b_sq[None, :]
              - 2.0 * ac @ b.T)
        return jnp.min(d2, axis=-1)

    mins = jax.lax.map(one, chunks).reshape(-1)[:n]
    return jnp.maximum(mins, 0.0)


@partial(jax.jit, static_argnames=("chunk",))
def chamfer_l2(pred: jnp.ndarray, gt: jnp.ndarray,
               chunk: int = 1024) -> jnp.ndarray:
    """Symmetric squared-L2 chamfer: mean min squared distance, both ways."""
    return (jnp.mean(_min_dists(pred, gt, chunk))
            + jnp.mean(_min_dists(gt, pred, chunk)))


@partial(jax.jit, static_argnames=("chunk",))
def chamfer_l1(pred: jnp.ndarray, gt: jnp.ndarray,
               chunk: int = 1024) -> jnp.ndarray:
    """Symmetric L1 chamfer (the eval metric): mean euclidean distance to the
    nearest neighbor, both directions, summed."""
    return (jnp.mean(jnp.sqrt(_min_dists(pred, gt, chunk) + 1e-12))
            + jnp.mean(jnp.sqrt(_min_dists(gt, pred, chunk) + 1e-12)))
