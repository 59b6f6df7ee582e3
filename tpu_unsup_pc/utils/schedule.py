"""Sigma annealing + LR schedules (SURVEY.md §2 "sigma annealing").

The coarse->fine sigma anneal is the DPC paper's trick for avoiding bad local
minima: start splatting with fat Gaussians (large receptive field in the
silhouette loss) and decay toward sharp points. The schedule is a pure
function of the step so it lives inside the jitted train step (step is a
traced scalar; all branches are resolved via jnp ops, no Python control flow).
"""

from __future__ import annotations

import jax.numpy as jnp

from tpu_unsup_pc.utils.config import Config


def sigma_at_step(cfg: Config, step) -> jnp.ndarray:
    """Splatting sigma (in voxel cells) at `step`. Pure, jit-safe.

    exp:    sigma_start * (sigma_end/sigma_start) ** min(step/T, 1)
    linear: sigma_start + (sigma_end - sigma_start) * min(step/T, 1)
    const:  sigma_end
    """
    t = jnp.clip(jnp.asarray(step, jnp.float32)
                 / max(cfg.sigma_anneal_steps, 1), 0.0, 1.0)
    if cfg.sigma_schedule == "exp":
        log_s = (jnp.log(cfg.sigma_start)
                 + t * (jnp.log(cfg.sigma_end) - jnp.log(cfg.sigma_start)))
        return jnp.exp(log_s)
    elif cfg.sigma_schedule == "linear":
        return cfg.sigma_start + t * (cfg.sigma_end - cfg.sigma_start)
    else:  # const
        return jnp.asarray(cfg.sigma_end, jnp.float32)


def lr_at_step(cfg: Config, step) -> jnp.ndarray:
    """Learning rate at `step` (used to build the optax schedule)."""
    if cfg.lr_schedule == "cosine":
        t = jnp.clip(jnp.asarray(step, jnp.float32) / max(cfg.max_steps, 1),
                     0.0, 1.0)
        return cfg.learning_rate * 0.5 * (1.0 + jnp.cos(jnp.pi * t))
    return jnp.asarray(cfg.learning_rate, jnp.float32)
