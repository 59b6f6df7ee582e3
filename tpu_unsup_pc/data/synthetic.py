"""Synthetic analytic dataset (SURVEY.md §4.4, §7.1 item 6): procedural
shapes -> multi-view silhouette/RGB renders, generated on-device with the
framework's own projector at a fine, *fixed* sigma (the model never sees GT
points, so the rendering mechanism doesn't leak the answer — it only defines
the target silhouettes, exactly as ShapeNet's Blender renders do for the
reference).

This unblocks the full end-to-end train/eval pipeline with zero data on
disk, and doubles as the generator for loader tests (see
data/shapenet.write_npz_dataset)."""

from __future__ import annotations

import functools
from typing import Dict, Iterator

import numpy as np

import jax
import jax.numpy as jnp

from tpu_unsup_pc.ops.camera import make_camera
from tpu_unsup_pc.ops.project import project_pointcloud
from tpu_unsup_pc.utils.config import Config

_N_GT = 4096  # GT points per model (for rendering + chamfer eval)


# ------------------------------------------------------------ shape makers
def _sphere(rng, n):
    v = rng.normal(size=(n, 3))
    return v / np.linalg.norm(v, axis=1, keepdims=True) * 0.5


def _box(rng, n):
    # points on the surface of a unit cube
    face = rng.integers(0, 6, size=n)
    uv = rng.uniform(-0.5, 0.5, size=(n, 2))
    pts = np.zeros((n, 3))
    axis, sign = face % 3, (face // 3) * 2 - 1
    for a in range(3):
        m = axis == a
        others = [i for i in range(3) if i != a]
        pts[m, a] = 0.5 * sign[m]
        pts[m, others[0]] = uv[m, 0]
        pts[m, others[1]] = uv[m, 1]
    return pts


def _cylinder(rng, n):
    th = rng.uniform(0, 2 * np.pi, size=n)
    side = rng.uniform(size=n) < 0.7
    z = rng.uniform(-0.5, 0.5, size=n)
    r = np.where(side, 0.5, np.sqrt(rng.uniform(size=n)) * 0.5)
    z = np.where(side, z, np.sign(z) * 0.5)
    return np.stack([r * np.cos(th), z, r * np.sin(th)], axis=1)


def _torus(rng, n):
    u = rng.uniform(0, 2 * np.pi, size=n)
    v = rng.uniform(0, 2 * np.pi, size=n)
    R, r = 0.35, 0.15
    return np.stack([(R + r * np.cos(v)) * np.cos(u), r * np.sin(v),
                     (R + r * np.cos(v)) * np.sin(u)], axis=1)


def _twin_spheres(rng, n):
    v = _sphere(rng, n) * 0.55
    offs = np.where(rng.uniform(size=(n, 1)) < 0.5, 0.22, -0.22)
    return v + np.concatenate([offs, np.zeros((n, 2))], axis=1)


# Asymmetric makers: every "classic" shape above is 180-deg rotationally
# symmetric, which makes camera pose fundamentally ambiguous from silhouette
# supervision (views at azimuth and azimuth+pi render identically, so the
# min-loss teacher cannot disambiguate them). The unknown-pose configs
# (BASELINE config 3) need silhouette-identifiable shapes — like ShapeNet
# chairs, which are at most bilaterally symmetric.
def _chair(rng, n):
    """Seat slab + back panel on one side + four legs: bilaterally symmetric
    about x only, so its silhouette identifies azimuth."""
    seat_h = rng.uniform(-0.1, 0.1)
    n_seat, n_back, n_leg = n // 3, n // 3, n - 2 * (n // 3)
    seat = np.stack([rng.uniform(-0.4, 0.4, n_seat),
                     seat_h + rng.uniform(-0.04, 0.04, n_seat),
                     rng.uniform(-0.4, 0.4, n_seat)], axis=1)
    back = np.stack([rng.uniform(-0.4, 0.4, n_back),
                     rng.uniform(seat_h, 0.5, n_back),
                     rng.uniform(0.34, 0.42, n_back)], axis=1)
    corners = np.asarray([[-0.34, -0.34], [-0.34, 0.34],
                          [0.34, -0.34], [0.34, 0.34]])
    c = corners[rng.integers(0, 4, n_leg)]
    legs = np.stack([c[:, 0] + rng.uniform(-0.04, 0.04, n_leg),
                     rng.uniform(-0.5, seat_h, n_leg),
                     c[:, 1] + rng.uniform(-0.04, 0.04, n_leg)], axis=1)
    return np.concatenate([seat, back, legs])


def _wedge(rng, n):
    """Box surface sheared into a ramp: height tapers with z, breaking the
    front/back silhouette symmetry."""
    pts = _box(rng, n)
    taper = rng.uniform(0.15, 0.4)
    pts[:, 1] *= taper + (1.0 - taper) * (pts[:, 2] + 0.5)
    return pts


def _lopsided(rng, n):
    """Ellipsoid with a small sphere grafted at a generic (non-axis)
    direction: no rotational or mirror symmetry at all."""
    n_bump = n // 4
    body = _sphere(rng, n - n_bump) * np.asarray([[0.45, 0.35, 0.4]])
    d = rng.normal(size=3)
    d[0] = abs(d[0]) + 0.4  # keep the bump direction generic but bounded
    d = d / np.linalg.norm(d)
    bump = _sphere(rng, n_bump) * 0.18 + d * 0.38
    return np.concatenate([body, bump])


_CLASSIC = [_sphere, _box, _cylinder, _torus, _twin_spheres]
_ASYM = [_chair, _wedge, _lopsided]
_SHAPE_SETS = {"classic": _CLASSIC, "asym": _ASYM,
               "all": _CLASSIC + _ASYM}


def _make_cloud(rng, n, shape_set="classic"):
    makers = _SHAPE_SETS[shape_set]
    pts = makers[rng.integers(len(makers))](rng, n)
    scale = rng.uniform(0.45, 0.9, size=(1, 3))      # anisotropic squash
    pts = (pts * scale).astype(np.float32)
    rgb = np.clip(pts + 0.5, 0.0, 1.0).astype(np.float32)  # position color
    return pts, rgb


# --------------------------------------------------------------- renderer
def _gt_render_sigma(image_size: int) -> float:
    """GT-render splat sigma in CELL units, scaled so the WORLD-space
    footprint of the _N_GT surface samples is resolution-independent
    (anchored at 0.7 cells for the 64px datasets the quality anchors were
    measured on; <=64px unchanged)."""
    return 0.7 * max(1.0, image_size / 64.0)


def _mass_scale(image_size: int) -> float:
    """Resolution-invariant GT silhouettes need a per-point MASS rescale,
    not just a sigma rescale: each sample's splat mass is normalized to 1,
    so the expected column mass is N_GT / silhouette-pixel-count ~ 1/H² —
    at 256px the raw DRC silhouette saturates at ~0.15 and the 0.4 mask
    threshold yields near-empty masks.

    MEASURED FAILURE behind this (r5, runs/c4xl_collapse): fixed-sigma
    0.7 at 256px gave 2.6% mask coverage (isolated dots) vs 40-48% at
    32px; sigma scaling alone made it WORSE (1.1% — mass conservation
    just spreads the same mass below threshold). The training target
    itself degenerated to near-empty masks, so the model correctly
    collapsed to a single point (held-out chamfer 0.486, worse than the
    0.227 random baseline) regardless of the training-side sigma anneal.

    The fix: sil_eff = 1 - (1 - sil)^scale with scale = (H/64)² — exactly
    the silhouette the same cloud would render if each point carried
    scale x mass. Identity at <=64px, so every committed <=64px anchor's
    dataset is bit-unchanged."""
    return max(1.0, (image_size / 64.0) ** 2)


@functools.partial(jax.jit, static_argnames=("cfg", "render_sigma"))
def _render_views(cfg: Config, points, rgb, azimuth, elevation, distance,
                  render_sigma: float | None = None):
    """(M,N,3) clouds + (M,V) poses + (M,V) camera distances -> masks
    (M,V,H,W), images (M,V,H,W,3). Binary-ish masks by thresholding the
    fine-sigma silhouette."""
    if render_sigma is None:
        render_sigma = _gt_render_sigma(cfg.image_size)
    render_cfg = cfg.replace(splat_mode="gauss", proj_mode="drc",
                             vox_size=max(cfg.vox_size, cfg.image_size))

    scale = _mass_scale(cfg.image_size)

    def one(pts, col, az, el, dist):
        cam = make_camera(az, el, dist, cfg.focal_length)
        out = project_pointcloud(pts, cam, render_sigma, render_cfg, rgb=col)
        # resolution-invariant silhouette (see _mass_scale): identity at
        # <=64px, mass-rescaled at finer grids
        sil = 1.0 - (1.0 - out.silhouette) ** scale
        mask = (sil > 0.4).astype(jnp.float32)
        img = (out.rgb_image * sil[..., None]
               + (1.0 - sil[..., None]))               # white background
        return mask, img

    per_view = jax.vmap(one, in_axes=(None, None, 0, 0, 0))
    per_model = jax.vmap(per_view, in_axes=(0, 0, 0, 0, 0))
    return per_model(points, rgb, azimuth, elevation, distance)


class SyntheticShapes:
    """Iterator[Batch] over procedurally generated multi-view renders.

    Batch dict: image (B,V,H,W,3) f32, mask (B,V,H,W) f32,
    azimuth/elevation (B,V) f32 — identical schema to ShapeNetViews."""

    def __init__(self, cfg: Config, split: str = "train",
                 num_models: int = 256, seed: int | None = None,
                 render_chunk: int = 32):
        self.cfg = cfg
        # stable split hash (builtin hash() is per-process randomized)
        import zlib
        seed = ((cfg.seed if seed is None else seed)
                + zlib.crc32(split.encode()) % 1000)
        # deterministic on-disk render cache: generation is pure in
        # (render-relevant config, seed, split, num_models), and fetching
        # the rendered views back through the TPU tunnel costs ~10-20 min
        # at 1024 models — every phase run re-paid it. Default on
        # (SYNTH_CACHE_DIR="" disables); files are atomic-renamed so
        # concurrent runs can share a directory.
        import os
        cache_dir = os.environ.get("SYNTH_CACHE_DIR", ".synth_cache")
        cache_path = None
        if cache_dir:
            key_fields = (cfg.image_size, cfg.vox_size, cfg.num_views,
                          cfg.synth_shapes, cfg.synth_dist_jitter,
                          cfg.camera_distance, cfg.focal_length,
                          cfg.depth_extent, _N_GT,
                          _gt_render_sigma(cfg.image_size),
                          _mass_scale(cfg.image_size),
                          seed, num_models)
            key = zlib.crc32(repr(key_fields).encode())
            cache_path = os.path.join(cache_dir,
                                      f"synth_{key:08x}_{num_models}.npz")
        if cache_path and os.path.exists(cache_path):
            with np.load(cache_path) as z:
                self.gt_points, self.gt_rgb = z["gt_points"], z["gt_rgb"]
                self.azimuth, self.elevation = z["azimuth"], z["elevation"]
                self.distance = z["distance"]
                self.masks, self.images = z["masks"], z["images"]
            self.has_distance = cfg.synth_dist_jitter > 0
            self._finish_init(cfg, split, num_models, seed)
            return
        rng = np.random.default_rng(seed)
        clouds, colors = zip(*[_make_cloud(rng, _N_GT, cfg.synth_shapes)
                               for _ in range(num_models)])
        self.gt_points = np.stack(clouds)                  # (M, N_GT, 3)
        self.gt_rgb = np.stack(colors)
        V = cfg.num_views
        self.azimuth = rng.uniform(0, 2 * np.pi,
                                   size=(num_models, V)).astype(np.float32)
        self.elevation = rng.uniform(-0.35, 0.9,
                                     size=(num_models, V)).astype(np.float32)
        # per-(model, view) camera distance; varies only when
        # cfg.synth_dist_jitter > 0 (then batches carry a "distance" key
        # and predict_translation has signal to learn — utils/config.py)
        j = cfg.synth_dist_jitter
        self.distance = (cfg.camera_distance
                         * rng.uniform(1.0 - j, 1.0 + j, size=(num_models, V))
                         ).astype(np.float32)
        self.has_distance = j > 0
        # scale the per-jit model chunk inversely with grid volume: 32
        # models x 5 views of 64^3 grids fit HBM comfortably, but 256^3
        # grids are 64x bigger (the renderer materializes per-view voxel
        # grids on the XLA path) — 32 chunks OOM'd a 16GB chip at 256^3
        masks, images = [], []
        render_chunk = max(1, min(render_chunk,
                                  render_chunk * 128 ** 3 // cfg.vox_size ** 3))
        for i in range(0, num_models, render_chunk):
            sl = slice(i, i + render_chunk)
            m, im = _render_views(cfg, jnp.asarray(self.gt_points[sl]),
                                  jnp.asarray(self.gt_rgb[sl]),
                                  jnp.asarray(self.azimuth[sl]),
                                  jnp.asarray(self.elevation[sl]),
                                  jnp.asarray(self.distance[sl]))
            masks.append(np.asarray(m))
            images.append(np.asarray(im))
        self.masks = np.concatenate(masks)                 # (M,V,H,W)
        self.images = np.concatenate(images)               # (M,V,H,W,3)
        if cache_path:
            os.makedirs(cache_dir, exist_ok=True)
            # np.savez appends ".npz" unless the name already ends with it
            tmp = cache_path[:-4] + f".tmp{os.getpid()}.npz"
            np.savez(tmp, gt_points=self.gt_points, gt_rgb=self.gt_rgb,
                     azimuth=self.azimuth, elevation=self.elevation,
                     distance=self.distance, masks=self.masks,
                     images=self.images)
            os.replace(tmp, cache_path)
        self._finish_init(cfg, split, num_models, seed)

    def _finish_init(self, cfg, split, num_models, seed):
        """Init that is independent of the render cache: the batch rng and
        the pseudo-known-pose override (utils/config.py pose_npz) — train
        under externally predicted cameras instead of GT. Only the train
        split is overridden; val/test evals keep GT geometry."""
        self.has_quat = False
        if cfg.pose_npz and split == "train":
            with np.load(cfg.pose_npz) as d:
                key = "quat" if "quat" in d.files else "pred_pose_guarded"
                q = np.asarray(d[key], np.float32)
            V = cfg.num_views
            assert q.shape == (num_models, V, 4), (
                f"pose_npz {cfg.pose_npz!r} key {key!r} has shape "
                f"{q.shape}, expected ({num_models}, {V}, 4) — the npz "
                "must be predicted over the SAME split/num_models/seed")
            self.quat = q / np.linalg.norm(q, axis=-1, keepdims=True)
            self.has_quat = True
        self._rng = np.random.default_rng(seed + 1)

    def __len__(self):
        return self.gt_points.shape[0]

    def eval_arrays(self, n: int):
        """First-n (images, azimuth, elevation) for the in-train pose eval
        (common accessor across dataset backends — train.py)."""
        n = min(int(n), len(self))
        return self.images[:n], self.azimuth[:n], self.elevation[:n]

    def sample_batch(self, batch_size: int | None = None) -> Dict:
        bs = batch_size or self.cfg.batch_size
        idx = self._rng.integers(0, len(self), size=bs)
        return self.get_batch(idx)

    def get_batch(self, idx) -> Dict:
        batch = {"image": self.images[idx], "mask": self.masks[idx],
                 "azimuth": self.azimuth[idx],
                 "elevation": self.elevation[idx]}
        if self.has_distance:
            batch["distance"] = self.distance[idx]
        if self.has_quat:
            batch["quat"] = self.quat[idx]
        return batch

    def batches(self, steps: int,
                batch_size: int | None = None) -> Iterator[Dict]:
        for _ in range(steps):
            yield self.sample_batch(batch_size)

    def __iter__(self):
        while True:
            yield self.sample_batch()
