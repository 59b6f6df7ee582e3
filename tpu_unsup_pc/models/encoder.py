"""Image encoder (SURVEY.md §2 "Image encoder", L3): single RGB view ->
latent code.

A plain strided conv stack sized so every conv lands on the TPU conv/MXU
units: channel counts from cfg.enc_channels (defaults 32..256), stride-2
downsampling to a 4x4 map at 64px input (5 stages at 128px via an extra
stride), then two FC layers to the latent. Compute dtype is configurable
(bfloat16 on TPU; params stay float32)."""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class ImageEncoder(nn.Module):
    channels: Sequence[int] = (32, 64, 128, 256)
    latent_dim: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img: jnp.ndarray) -> jnp.ndarray:
        """img: (..., H, W, 3) in [0, 1] -> latent (..., latent_dim)."""
        batch_shape = img.shape[:-3]
        x = img.reshape((-1,) + img.shape[-3:]).astype(self.dtype)
        for ch in self.channels:
            x = nn.Conv(ch, (3, 3), strides=(1, 1), dtype=self.dtype)(x)
            x = nn.leaky_relu(x, 0.2)
            x = nn.Conv(ch, (3, 3), strides=(2, 2), dtype=self.dtype)(x)
            x = nn.leaky_relu(x, 0.2)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(self.latent_dim, dtype=self.dtype)(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Dense(self.latent_dim, dtype=self.dtype)(x)
        x = x.astype(jnp.float32)
        return x.reshape(batch_shape + (self.latent_dim,))
