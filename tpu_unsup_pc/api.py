"""Public notebook API (SURVEY.md §3.4 / L7 — the user-facing contract):
`encode`, `project`, `train_step`, mirroring the reference's demo surface.

    from tpu_unsup_pc import api
    cfg = api.default_config()
    state = api.init(cfg)
    out = api.encode(cfg, state, images)          # -> points (+rgb, +pose)
    sil = api.project(points, camera, sigma, cfg) # -> ProjectorOutput
    state, metrics = api.train_step(cfg, state, batch)
"""

from __future__ import annotations

import jax.numpy as jnp

from tpu_unsup_pc import training
from tpu_unsup_pc.configs import presets
from tpu_unsup_pc.models.model import ModelOutput
from tpu_unsup_pc.ops.camera import Camera, make_camera  # noqa: F401
from tpu_unsup_pc.ops.project import ProjectorOutput, project_pointcloud
from tpu_unsup_pc.utils.config import Config


def default_config() -> Config:
    return presets.get("c1_synth")


def init(cfg: Config, rng=None) -> training.TrainState:
    """Fresh TrainState (params + optimizer) for `cfg`."""
    return training.init_state(cfg, rng)


def encode(cfg: Config, state: training.TrainState,
           images: jnp.ndarray) -> ModelOutput:
    """images (..., H, W, 3) in [0,1] -> ModelOutput: latent, decoded cloud
    (points, rgb, scale), and pose prediction when cfg.predict_pose."""
    return training.predict_step(cfg, state, images)


def project(points: jnp.ndarray, camera: Camera, sigma, cfg: Config,
            rgb: jnp.ndarray | None = None) -> ProjectorOutput:
    """The differentiable projector: (N,3) points -> silhouette + voxels
    (+ rgb image). This is the op the headline benchmark times
    [BASELINE.json:2]."""
    return project_pointcloud(points, camera, sigma, cfg, rgb=rgb)


def train_step(cfg: Config, state: training.TrainState, batch):
    """(state, batch) -> (state', metrics): one jitted optimization step."""
    return training.train_step(cfg, state, batch)


def refine_poses(cfg: Config, output: ModelOutput, masks: jnp.ndarray,
                 images: jnp.ndarray | None = None,
                 *, steps: int = 60, mode: str = "cross", **kw) -> dict:
    """Test-time pose refinement (unknown-pose setting, SURVEY.md §3.3's
    eval-time pose-alignment step): Adam-polish `output`'s predicted poses
    against the observed masks through the differentiable renderer. For
    RGB models, pass `images` to add color evidence (flip-discriminative).
    Returns {"refined_best", "refined_student", "refined_sse"} — see
    refine.refine_output_poses. Measured: held-out median 14.2° → 8.6°
    (sil-only model; docs/pose_training.md)."""
    from tpu_unsup_pc.refine import refine_output_poses
    return refine_output_poses(cfg, output, masks, images, steps=steps,
                               mode=mode, **kw)
