"""Pose regressor + candidate ensemble head (SURVEY.md §2 "Pose regressor +
candidate ensemble", §3.2).

Emits K candidate quaternions plus one "student" quaternion from a shared
trunk. The candidates parameterize the teacher (min-projection-loss
selection happens in the model's loss, §3.2: all K are projected anyway, so
selection is an argmin + take — no data-dependent control flow). The student
is trained toward the selected candidate through a stop_gradient; at test
time the student is the pose prediction. Optional translation head regresses
a camera-distance offset."""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpu_unsup_pc.ops.quaternion import quat_normalize


class PosePrediction(NamedTuple):
    candidates: jnp.ndarray        # (..., K, 4) unit quaternions
    student: jnp.ndarray           # (..., 4) unit quaternion
    trans_offset: Optional[jnp.ndarray]  # (..., K) distance offsets or None


class PoseHead(nn.Module):
    num_candidates: int = 4
    hidden: int = 256
    predict_translation: bool = False
    trans_offset_scale: float = 0.5  # tanh range of the distance offset;
                                     # match to the data's distance spread
                                     # (an output range much wider than
                                     # synth_dist_jitter amplifies
                                     # unsaturated-tanh noise, measured
                                     # runs/c3trans: offset_std 0.39 vs
                                     # gt spread 0.115 at scale 0.5)
    student_detach: bool = False   # stop-grad the student head's trunk input
    init_scale: float | None = 0.2  # head init vs anchors; None = flax
                                    # default (lecun) — reproduces the
                                    # round-1/v1 param draws exactly
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, latent: jnp.ndarray) -> PosePrediction:
        batch_shape = latent.shape[:-1]
        x = latent.reshape(-1, latent.shape[-1]).astype(self.dtype)
        x = nn.Dense(self.hidden, dtype=self.dtype)(x)
        x = nn.leaky_relu(x, 0.2)
        K = self.num_candidates
        # anchor-biased head init (docs/pose_training.md): raw starts at
        # ~init_scale x the unit anchors — big enough that candidates are
        # input-SENSITIVE from step 0 (pure-anchor codebook heads never
        # grow input-dependence), small enough that the anchors dominate
        # the argmin (O(1) noise makes the teacher churn and collapses the
        # trunk). stddev is scaled by 1/sqrt(hidden) so init_scale is in
        # units of trunk-activation RMS.
        init_kw = {} if self.init_scale is None else {
            "kernel_init": nn.initializers.normal(
                stddev=self.init_scale * self.hidden ** -0.5)}
        raw_c = nn.Dense(K * 4, dtype=self.dtype, **init_kw,
                         name="candidates_head")(x).astype(jnp.float32)
        # fixed (non-trainable) rotation anchors spread the candidates so
        # the ensemble can't collapse: constants, deliberately NOT
        # registered as params (the optimizer must not move them)
        anchors = _anchor_quats(K)
        cand = quat_normalize(raw_c.reshape(-1, K, 4) + anchors[None])
        x_s = jax.lax.stop_gradient(x) if self.student_detach else x
        raw_s = nn.Dense(4, dtype=self.dtype, **init_kw,
                         name="student_head")(x_s).astype(jnp.float32)
        student = quat_normalize(
            raw_s + jnp.asarray([1.0, 0.0, 0.0, 0.0]))
        trans = None
        if self.predict_translation:
            t = nn.Dense(K, dtype=self.dtype,
                         name="translation_head")(x).astype(jnp.float32)
            trans = (self.trans_offset_scale
                     * jnp.tanh(t)).reshape(batch_shape + (K,))
        return PosePrediction(
            candidates=cand.reshape(batch_shape + (K, 4)),
            student=student.reshape(batch_shape + (4,)),
            trans_offset=trans)


def _anchor_quats(k: int) -> jnp.ndarray:
    """K fixed rotations about the up axis, evenly spread in azimuth —
    initial diversity for the candidate ensemble."""
    import numpy as np
    angles = np.linspace(0.0, 2.0 * np.pi, k, endpoint=False)
    q = np.stack([np.cos(angles / 2), np.zeros(k),
                  np.sin(angles / 2), np.zeros(k)], axis=-1)
    return jnp.asarray(q, jnp.float32)
