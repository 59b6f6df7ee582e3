"""tpu_unsup_pc — a TPU-native JAX framework for unsupervised single-view 3D
reconstruction with differentiable point clouds.

Rebuilt from scratch with the capabilities of the PyTorch reference
``NiteshBharadwaj/pytorch-unsup-pc`` (a port of Insafutdinov & Dosovitskiy,
"Unsupervised Learning of Shape and Pose with Differentiable Point Clouds",
NeurIPS 2018) — see /root/repo/SURVEY.md for the behavior contract. The
reference mount was empty at build time (SURVEY.md §0), so parity is pinned
against a frozen torch-CPU oracle (``oracle/torch_oracle.py``) instead of
``file:line`` citations.

Public API (SURVEY.md §3.4 — the notebook contract):
  - :func:`tpu_unsup_pc.api.encode`      image -> latent / (points, pose)
  - :func:`tpu_unsup_pc.api.project`     points (+rgb) -> silhouette / voxels
  - :func:`tpu_unsup_pc.api.train_step`  (state, batch) -> (state', metrics)
"""

__version__ = "0.1.0"

from tpu_unsup_pc.utils.config import Config  # noqa: F401
