"""Train step + state (SURVEY.md §2 "Train loop", §3.1): the entire region
from sigma-schedule through optimizer update is ONE jitted function — the
only host<->device boundary in the hot loop is the batch transfer.

The public notebook API (`encode`, `project`, `train_step` [SURVEY §3.4])
wraps these; the sharded multi-chip variant lives in
tpu_unsup_pc/parallel/train_sharded.py and reuses the same pure
`loss_and_metrics`."""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from tpu_unsup_pc.models.losses import compute_loss
from tpu_unsup_pc.models.model import DPCModel
from tpu_unsup_pc.utils.config import Config
from tpu_unsup_pc.utils.schedule import sigma_at_step

Batch = Dict[str, jnp.ndarray]


class TrainState(train_state.TrainState):
    """Standard flax TrainState; `step` doubles as the sigma-schedule
    position, so checkpoint/resume restores the anneal for free
    (SURVEY §5 "Checkpoint / resume")."""


def make_model(cfg: Config) -> DPCModel:
    return DPCModel(cfg=cfg)


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    if cfg.lr_schedule == "cosine":
        lr = optax.cosine_decay_schedule(cfg.learning_rate, cfg.max_steps)
    else:
        lr = cfg.learning_rate
    tx = optax.adamw(lr, weight_decay=cfg.weight_decay) \
        if cfg.weight_decay > 0 else optax.adam(lr)
    if cfg.grad_clip_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), tx)
    if cfg.freeze:
        frozen = tuple(filter(None, cfg.freeze.split(",")))

        def _mask(params):
            return {k: jax.tree_util.tree_map(lambda _: k in frozen, v)
                    for k, v in params.items()}

        zero = optax.masked(optax.set_to_zero(), _mask)
        # zero BEFORE tx so frozen grads don't skew global-norm clipping /
        # adam moments, and AFTER so adamw's weight decay can't move
        # frozen params either
        tx = optax.chain(zero, tx, zero)
    return tx


def init_state(cfg: Config, rng: jax.Array | None = None) -> TrainState:
    """Initialize params + optimizer state from the config's seed."""
    rng = jax.random.PRNGKey(cfg.seed) if rng is None else rng
    model = make_model(cfg)
    dummy = jnp.zeros((1, cfg.num_views, cfg.image_size, cfg.image_size, 3),
                      jnp.float32)
    params = model.init(rng, dummy)["params"]
    return TrainState.create(apply_fn=model.apply, params=params,
                             tx=make_optimizer(cfg))


def loss_and_metrics(cfg: Config, params, batch: Batch, step,
                     ) -> Tuple[jnp.ndarray, dict]:
    """Pure loss: forward every view, assemble the multi-view loss at the
    annealed sigma. Shared by the single-chip and sharded train steps."""
    model = make_model(cfg)
    output = model.apply({"params": params}, batch["image"])
    sigma = sigma_at_step(cfg, step)
    loss, metrics = compute_loss(cfg, output, batch, sigma, step=step)
    metrics["sigma"] = sigma
    return loss, metrics


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(1,))
def train_step(cfg: Config, state: TrainState, batch: Batch,
               ) -> Tuple[TrainState, Dict[str, Any]]:
    """One optimization step (jitted once per config; state donated so the
    params buffer is updated in place on-device)."""
    (loss, metrics), grads = jax.value_and_grad(
        loss_and_metrics, argnums=1, has_aux=True)(
            cfg, state.params, batch, state.step)
    new_state = state.apply_gradients(grads=grads)
    metrics["grad_norm"] = optax.global_norm(grads)
    return new_state, metrics


@functools.partial(jax.jit, static_argnames=("cfg",))
def eval_step(cfg: Config, state: TrainState, batch: Batch) -> dict:
    """Loss metrics without an update (fixed fine sigma = sigma_end)."""
    model = make_model(cfg)
    output = model.apply({"params": state.params}, batch["image"])
    _, metrics = compute_loss(cfg, output, batch,
                              jnp.asarray(cfg.sigma_end, jnp.float32))
    return metrics


@functools.partial(jax.jit, static_argnames=("cfg",))
def predict_step(cfg: Config, state: TrainState, images: jnp.ndarray):
    """images (..., H, W, 3) -> ModelOutput (points + rgb + pose)."""
    model = make_model(cfg)
    return model.apply({"params": state.params}, images)
