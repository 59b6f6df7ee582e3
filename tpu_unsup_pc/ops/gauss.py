"""Separable 3D Gaussian smoothing of voxel grids (SURVEY.md §2 "Gaussian
smoothing + sigma annealing").

Used only on the `trilinear_blur` parity path — the default `gauss` splat
mode fuses the smoothing into the footprint (see ops/splat.py). Kernel
*values* are traced (sigma anneals per step) but the kernel *size* is static
(derived from sigma_start), so the whole schedule jits to one program.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def gaussian_kernel1d(sigma, radius: int, dtype=jnp.float32) -> jnp.ndarray:
    """Discrete normalized Gaussian kernel of static size 2*radius+1 with
    traced sigma. Normalized to sum 1 (the reference's blur preserves mass)."""
    x = jnp.arange(-radius, radius + 1, dtype=dtype)
    k = jnp.exp(-(x ** 2) / (2.0 * jnp.asarray(sigma, dtype) ** 2))
    return k / jnp.sum(k)


def _conv1d_along(vox: jnp.ndarray, kernel: jnp.ndarray,
                  axis: int) -> jnp.ndarray:
    """'SAME' zero-padded 1-D convolution of a (..., D, H, W) grid along one
    of the last three axes, via lax.conv_general_dilated (maps to the TPU
    conv units / MXU)."""
    spatial = vox.ndim - 3 + axis
    moved = jnp.moveaxis(vox, spatial, -1)
    lead = moved.shape[:-1]
    flat = moved.reshape((-1, 1) + moved.shape[-1:])     # (B, C=1, L)
    k = kernel.reshape(1, 1, -1)                         # (O=1, I=1, K)
    out = lax.conv_general_dilated(
        flat, k, window_strides=(1,), padding="SAME",
        dimension_numbers=("NCH", "OIH", "NCH"))
    return jnp.moveaxis(out.reshape(lead + moved.shape[-1:]), -1, spatial)


def smoothen_voxels(vox: jnp.ndarray, sigma, radius: int) -> jnp.ndarray:
    """Separable 3D Gaussian blur of (..., D, H, W) with traced sigma and
    static truncation radius (use ops.splat.static_gauss_radius)."""
    k = gaussian_kernel1d(sigma, radius, vox.dtype)
    for axis in (0, 1, 2):
        vox = _conv1d_along(vox, k, axis)
    return vox
