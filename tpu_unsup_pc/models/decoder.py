"""Point-set decoder (SURVEY.md §2 "Point-set decoder", L3): latent ->
N x 3 canonical-frame points (+ optional per-point RGB, + optional global
scale).

One big Dense from the FC trunk to N*3 outputs — exactly the shape the MXU
likes (a [latent, N*3] matmul). Points are squashed into the canonical cube
by tanh/2; RGB by sigmoid; the optional scale head emits a positive global
sigma multiplier (paper's learned-scale variant [SURVEY §2])."""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp


class DecodedCloud(NamedTuple):
    points: jnp.ndarray           # (..., N, 3) in [-0.5, 0.5]
    rgb: Optional[jnp.ndarray]    # (..., N, 3) in [0, 1] or None
    scale: Optional[jnp.ndarray]  # (...,) positive or None


class PointDecoder(nn.Module):
    num_points: int = 2000
    fc_dims: Sequence[int] = (1024, 1024)
    predict_rgb: bool = False
    predict_scale: bool = False
    scale_clip: float = 0.35      # |log scale| bound (see Config.scale_clip)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, latent: jnp.ndarray) -> DecodedCloud:
        batch_shape = latent.shape[:-1]
        x = latent.reshape(-1, latent.shape[-1]).astype(self.dtype)
        for d in self.fc_dims:
            x = nn.Dense(d, dtype=self.dtype)(x)
            x = nn.leaky_relu(x, 0.2)
        raw = nn.Dense(self.num_points * 3, dtype=self.dtype,
                       name="points_head")(x).astype(jnp.float32)
        pts = 0.5 * jnp.tanh(raw.reshape(-1, self.num_points, 3))
        rgb = None
        if self.predict_rgb:
            rgb_raw = nn.Dense(self.num_points * 3, dtype=self.dtype,
                               name="rgb_head")(x).astype(jnp.float32)
            rgb = nn.sigmoid(rgb_raw.reshape(-1, self.num_points, 3))
            rgb = rgb.reshape(batch_shape + (self.num_points, 3))
        scale = None
        if self.predict_scale:
            s_raw = nn.Dense(1, dtype=self.dtype,
                             name="scale_head")(x).astype(jnp.float32)
            scale = jnp.exp(jnp.clip(s_raw[..., 0], -self.scale_clip,
                                     self.scale_clip))
            scale = scale.reshape(batch_shape)
        return DecodedCloud(points=pts.reshape(batch_shape
                                               + (self.num_points, 3)),
                            rgb=rgb, scale=scale)
