"""Config system (SURVEY.md §2 "Config system", L0).

The reference uses a flat ``app_config``-style global flag object [SURVEY §2,
unverified layout]. Here the TPU-native equivalent is a frozen dataclass: pure
data, hashable, safe to close over in jitted functions, and serializable. The
experiment axes are exactly BASELINE.json's five configs (category set,
resolution 64/128, point count 2k/8k, pose mode, sigma schedule, RGB, mesh
shape) — named presets live in ``tpu_unsup_pc/configs/presets.py``.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class Config:
    """Full experiment configuration. All fields static (shape-determining
    fields must be Python ints so jit traces to static shapes)."""

    # ---- data ----
    image_size: int = 64           # input / silhouette resolution (64 or 128)
    num_views: int = 5             # views per model in a training sample
    categories: Tuple[str, ...] = ("03001627",)  # shapenet synset ids
    dataset: str = "synthetic"     # "synthetic" | "shapenet"
    data_dir: str = "data/shapenet"
    # synthetic shape distribution: "classic" (round-1 regression anchors,
    # all 180deg-rotationally symmetric), "asym" (silhouette-identifiable
    # pose — required for the unknown-pose configs), "all" (union)
    synth_shapes: str = "classic"
    # pseudo-known-pose distillation (VERDICT r3 missing #1): path to an
    # npz carrying per-(model, view) camera quaternions ("quat" or
    # "pred_pose_guarded", shape (M, V, 4)) that REPLACE the dataset's
    # ground-truth cameras in the known-pose loss for the TRAIN split.
    # Images/masks stay the real observations; only the believed camera
    # changes — so a fresh shape model can train under a pose
    # specialist's predictions instead of GT. "" = off.
    pose_npz: str = ""
    # fractional per-(model, view) camera-distance jitter: views are
    # rendered at distance ~ U(camera_distance*(1-j), camera_distance*(1+j))
    # and batches carry a "distance" (B, V) field. 0 = fixed distance
    # (legacy schema, no "distance" key). This is the data axis that makes
    # predict_translation learnable: with fixed distance the offset head's
    # optimum is identically zero.
    synth_dist_jitter: float = 0.0

    # ---- model (SURVEY §2: encoder / decoder / pose head) ----
    pc_num_points: int = 2000      # N: 2000 or 8000
    latent_dim: int = 1024
    enc_channels: Tuple[int, ...] = (32, 64, 128, 256)
    fc_dims: Tuple[int, ...] = (1024, 1024)
    predict_rgb: bool = False      # per-point RGB (BASELINE config 5)
    predict_scale: bool = False    # learned global sigma scale (paper §3.1)
    # |log scale| bound. Unbounded (3.0 ~ e^3=20x) the head defeats the
    # sigma anneal — blur fits silhouettes without geometry: held-out
    # chamfer 0.262 vs 0.065 matched baseline (runs/c1_scale, r3). Keep
    # it a small multiplicative correction.
    scale_clip: float = 0.35

    # ---- loss ----
    source_views: int = 0          # clouds decoded from first k views (0=all)
    rgb_loss_weight: float = 1.0   # weight of masked RGB appearance loss
    # drop (source==target) projection pairs from the loss. SURVEY §2 says
    # the reference projects into ">=1 *other* views"; the default keeps the
    # round-1 semantics (self-consistency included) — see RECONCILE.md
    exclude_self_view: bool = False

    # ---- pose (SURVEY §2 "Pose regressor + candidate ensemble") ----
    predict_pose: bool = False     # False => ground-truth pose (configs 1,2,4,5)
    pose_candidates: int = 4       # K candidate quaternions
    pose_student_weight: float = 20.0  # weight on student->teacher loss
    # cut student-loss gradients at the pose trunk: the student imitation
    # loss then trains ONLY the student head, not the shared trunk/encoder
    # (whose shape features it would otherwise drag toward whichever random
    # candidate currently wins)
    pose_student_detach: bool = False
    # ramp the student weight 0 -> pose_student_weight over this many steps.
    # Early in training the min-loss teacher is pure churn (candidates are
    # near-identical), and the optimal response to a randomly churning
    # target is an input-INDEPENDENT constant — at weight 20 that gradient
    # drags the shared trunk/encoder into constancy and kills shape
    # learning (observed: all-heads-identical ~90deg collapse). 0 = off.
    pose_student_warmup_steps: int = 0
    # linearly decay the student weight to this value over
    # pose_student_decay_steps (0 = no decay). Rationale
    # (docs/pose_training.md): a large weight accelerates candidate
    # specialization early, but mid-training the student term dominates the
    # total loss and its cheapest minimum is MERGING all candidates (the
    # observed late collapse) — decay to a small distillation weight once
    # the ensemble has specialized.
    pose_student_weight_end: float = 0.0
    pose_student_decay_steps: int = 0
    # candidate/student head init scale, in units of trunk-activation RMS:
    # raw head outputs start ~ this size vs the unit anchor quaternions.
    # ~1.0 (lecun default) = input-sensitive but churny argmin (stochastic
    # early collapse); ~0 = stable anchor codebook but input-dependence
    # may never grow (pose stuck at the anchor quantization). See
    # docs/pose_training.md. None = flax default init (round-1 draws).
    pose_head_init_scale: float | None = 0.2
    predict_translation: bool = False  # regress camera distance offset too
    # tanh range of the predicted distance offset; match to the data's
    # actual distance spread (>= synth_dist_jitter) — a range much wider
    # than the jitter amplifies unsaturated-tanh noise (runs/c3trans)
    trans_offset_scale: float = 0.5

    # ---- projector (SURVEY §2 splatter/smoothing/projection, L2) ----
    vox_size: int = 64             # D: voxel grid D^3 (64 or 128)
    focal_length: float = 1.875    # pinhole focal (units of half-image planes)
    camera_distance: float = 2.0   # object center distance along camera z
    depth_extent: float = 1.2      # frustum depth range centered at camera_distance
    splat_mode: str = "gauss"      # "gauss" (fused MXU path) | "trilinear_blur"
    proj_mode: str = "drc"         # "drc" | "max" | "sum"
    clip_voxels: bool = True       # clip occupancy grid to [0, 1] post-smooth
    # sigma annealing (coarse->fine, SURVEY §2 "sigma annealing")
    sigma_start: float = 3.0       # in voxel cells at vox_size resolution
    sigma_end: float = 0.6
    sigma_anneal_steps: int = 30000
    sigma_schedule: str = "exp"    # "exp" | "linear" | "const"

    # ---- training ----
    batch_size: int = 8            # models per global batch
    learning_rate: float = 1e-4
    lr_schedule: str = "const"     # "const" | "cosine"
    max_steps: int = 100_000
    weight_decay: float = 0.0
    grad_clip_norm: float = 0.0    # 0 disables
    # comma-separated top-level param collections to freeze (optimizer
    # updates zeroed): any of "encoder", "decoder", "pose_head". The
    # shape-recovery fine-tune (docs/pose_training.md) freezes
    # "encoder,pose_head" so the decoder retrains under the warm-started
    # model's (fixed) pose predictions — pose metrics stay bit-identical
    # while the decoder sees what is effectively known-pose training.
    freeze: str = ""
    seed: int = 0
    dtype: str = "float32"         # compute dtype for nets: "float32"|"bfloat16"

    # ---- runtime / parallel (SURVEY §2.2: DP over a v5e-8 mesh) ----
    mesh_shape: Tuple[int, ...] = (1,)       # data-parallel mesh, e.g. (8,)
    mesh_axis_names: Tuple[str, ...] = ("data",)
    use_pallas: bool = False       # fused Pallas splat kernel (speed retrofit)
    # run the fused Pallas render paths even off-TPU (interpret mode) —
    # used by the sharding tests / multichip dryrun to prove the custom-VJP
    # kernels compose with SPMD batch sharding on the virtual CPU mesh
    force_fused: bool = False
    pallas_bf16: bool = False      # bf16 MXU inputs in the fused render
    # depth-band width for the fused render+MSE kernel: -1 AUTO (dense at
    # <=128^3 where the depth-sort wrapper costs more than banding saves,
    # banded at >=192^3 where the measured crossover flips; the width
    # derives from the radius — render_kernel.auto_band: realistic span
    # budget + 2*(radius+2) planning margin, else the lax.cond silently
    # falls back to dense on real clouds), 0 FORCES dense at any grid,
    # else an explicit band width (positive multiple of 8)
    pallas_band: int = -1
    # one-pass value+gradient render+MSE kernels (render_drc_mse_onepass):
    # value_and_grad runs ONE rematerializing kernel instead of fwd + bwd
    # (the fwd kernel is pure overhead in training — see the one-pass
    # block comment in ops/pallas/render_kernel.py). Escape hatch only;
    # equivalence is tested, so there is no quality reason to disable.
    pallas_onepass: bool = True
    point_chunk: int = 512         # chunk size for the separable-matmul splat

    # ---- checkpoint / logging ----
    ckpt_dir: str = "checkpoints"
    ckpt_every: int = 2000
    log_every: int = 100

    # ------------------------------------------------------------------
    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "Config":
        d = json.loads(s)
        for k in ("categories", "enc_channels", "fc_dims", "mesh_shape",
                  "mesh_axis_names"):
            if k in d and isinstance(d[k], list):
                d[k] = tuple(d[k])
        return cls(**d)

    def validate(self) -> "Config":
        assert self.image_size in (32, 64, 128, 256), self.image_size
        assert self.vox_size in (32, 64, 128, 256), self.vox_size
        # silhouettes come out at vox_size resolution and are compared
        # against image-resolution masks — the two must match
        assert self.image_size == self.vox_size, (
            f"image_size={self.image_size} must equal "
            f"vox_size={self.vox_size} (silhouette vs mask resolution)")
        # kernel chunking halves point_chunk to fit VMEM; power-of-two
        # keeps every reduced chunk an exact divisor of the padded N
        assert (self.point_chunk >= 8
                and self.point_chunk & (self.point_chunk - 1) == 0), (
            f"point_chunk={self.point_chunk} must be a power of two >= 8")
        assert self.splat_mode in ("gauss", "trilinear_blur"), self.splat_mode
        assert self.synth_shapes in ("classic", "asym", "all")
        # the frustum depth slab is centered on each camera's OWN distance
        # (ops/camera.py: w = (z - distance)/depth_extent), so jitter only
        # changes perspective magnification — but it must stay inside the
        # translation head's +-trans_offset_scale rails (checked below)
        # and keep silhouettes from overflowing the image plane at close
        # range
        assert 0.0 <= self.synth_dist_jitter <= 0.2, self.synth_dist_jitter
        assert 0.0 < self.trans_offset_scale <= 0.5, self.trans_offset_scale
        if self.predict_translation and self.synth_dist_jitter > 0:
            assert self.trans_offset_scale >= self.synth_dist_jitter, (
                "translation head's tanh range cannot reach the data's "
                f"distance spread: trans_offset_scale="
                f"{self.trans_offset_scale} < synth_dist_jitter="
                f"{self.synth_dist_jitter}")
        if self.exclude_self_view:
            assert self.num_views > 1, (
                "exclude_self_view needs at least one non-self target view")
        assert self.proj_mode in ("drc", "max", "sum"), self.proj_mode
        assert self.pallas_band == -1 or self.pallas_band == 0 or (
            self.pallas_band % 8 == 0 and self.pallas_band > 0), (
            f"pallas_band={self.pallas_band} must be -1, 0, or a positive "
            "multiple of 8")
        # only the silhouette path gained the D>=192 auto-banded kernel;
        # the fused RGB kernels (one-pass and two-kernel) keep the dense
        # (chunk, D*HT) VMEM profile that measured pathological at 256^3
        # (907ms/10 pairs for the sil one-pass) and are untested for
        # Mosaic acceptance at those grids (ADVICE r4)
        assert not (self.predict_rgb and self.vox_size >= 192), (
            f"predict_rgb at vox_size={self.vox_size} is unsupported: the "
            "fused RGB render has no depth-banded large-grid variant yet "
            "(measured regime ends at 128^3); use vox_size<=128 for RGB")
        assert self.sigma_schedule in ("exp", "linear", "const")
        for name in filter(None, self.freeze.split(",")):
            assert name in ("encoder", "decoder", "pose_head"), (
                f"freeze={self.freeze!r}: unknown collection {name!r}")
            if name == "pose_head":
                assert self.predict_pose, "freeze=pose_head needs predict_pose"
        assert self.pc_num_points > 0 and self.num_views >= 1
        if self.predict_pose:
            assert self.pose_candidates >= 1
        return self
