"""Model assembly (SURVEY.md §2 "Model / loss assembly", L4): encoder ->
decoder (-> pose head), composed as one Flax module. The loss lives in
models/losses.py as a pure function; this module only produces tensors."""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax.numpy as jnp

from tpu_unsup_pc.models.decoder import DecodedCloud, PointDecoder
from tpu_unsup_pc.models.encoder import ImageEncoder
from tpu_unsup_pc.models.pose import PoseHead, PosePrediction
from tpu_unsup_pc.utils.config import Config


class ModelOutput(NamedTuple):
    latent: jnp.ndarray                 # (..., L)
    cloud: DecodedCloud                 # points (..., N, 3) [+rgb, +scale]
    pose: Optional[PosePrediction]      # None in known-pose configs


class DPCModel(nn.Module):
    """Single-view 3D reconstruction model: image -> (point cloud, pose).

    Methods are exposed individually so the notebook API can call
    `encode` / `decode` without running the rest (`method=` arg of
    Module.apply)."""
    cfg: Config

    def setup(self):
        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        self.encoder = ImageEncoder(channels=cfg.enc_channels,
                                    latent_dim=cfg.latent_dim, dtype=dtype)
        self.decoder = PointDecoder(num_points=cfg.pc_num_points,
                                    fc_dims=cfg.fc_dims,
                                    predict_rgb=cfg.predict_rgb,
                                    predict_scale=cfg.predict_scale,
                                    scale_clip=cfg.scale_clip,
                                    dtype=dtype)
        if cfg.predict_pose:
            self.pose_head = PoseHead(
                num_candidates=cfg.pose_candidates,
                predict_translation=cfg.predict_translation,
                trans_offset_scale=cfg.trans_offset_scale,
                student_detach=cfg.pose_student_detach,
                init_scale=cfg.pose_head_init_scale, dtype=dtype)

    def encode(self, images: jnp.ndarray) -> jnp.ndarray:
        return self.encoder(images)

    def decode(self, latent: jnp.ndarray) -> DecodedCloud:
        return self.decoder(latent)

    def predict_pose(self, latent: jnp.ndarray) -> PosePrediction:
        return self.pose_head(latent)

    def __call__(self, images: jnp.ndarray) -> ModelOutput:
        """images: (..., H, W, 3) -> full forward on every view."""
        latent = self.encoder(images)
        cloud = self.decoder(latent)
        pose = self.pose_head(latent) if self.cfg.predict_pose else None
        return ModelOutput(latent=latent, cloud=cloud, pose=pose)
