"""Data layer tests: synthetic generator schema + shapenet npz round trip
(SURVEY.md §4.4)."""

import numpy as np

from tpu_unsup_pc.configs import presets
from tpu_unsup_pc.data import ShapeNetViews, SyntheticShapes, make_dataset
from tpu_unsup_pc.data.shapenet import write_npz_dataset

CFG = presets.get("tiny")


def test_synthetic_schema():
    ds = SyntheticShapes(CFG, num_models=8)
    b = ds.sample_batch(3)
    V, H = CFG.num_views, CFG.image_size
    assert b["image"].shape == (3, V, H, H, 3)
    assert b["mask"].shape == (3, V, H, H)
    assert b["azimuth"].shape == (3, V)
    assert set(np.unique(b["mask"])) <= {0.0, 1.0}
    assert b["image"].min() >= 0 and b["image"].max() <= 1
    # masks are nonempty and not full-frame
    frac = b["mask"].mean()
    assert 0.02 < frac < 0.8, frac


def test_synthetic_shape_sets():
    """The asym set must produce shapes whose silhouettes identify pose:
    none of its makers may be 180deg-rotationally symmetric about y.
    Proxy check: rotating the cloud 180deg about y changes the point set
    (chamfer-style nearest-neighbor distance is far from zero)."""
    from tpu_unsup_pc.data.synthetic import _ASYM, _CLASSIC, _SHAPE_SETS
    assert _SHAPE_SETS["all"] == _CLASSIC + _ASYM
    rng = np.random.default_rng(0)
    for mk in _ASYM:
        p = mk(rng, 1500).astype(np.float32)
        q = p * np.asarray([[-1.0, 1.0, -1.0]], np.float32)  # R_y(pi)
        d = np.sqrt(((q[:, None] - p[None]) ** 2).sum(-1)).min(1).mean()
        assert d > 0.02, (mk.__name__, d)
    # classic makers are (by design) symmetric under R_y(pi)
    for mk in _CLASSIC:
        p = mk(rng, 1500).astype(np.float32)
        q = p * np.asarray([[-1.0, 1.0, -1.0]], np.float32)
        d = np.sqrt(((q[:, None] - p[None]) ** 2).sum(-1)).min(1).mean()
        assert d < 0.05, (mk.__name__, d)
    ds = SyntheticShapes(CFG.replace(synth_shapes="asym"), num_models=4)
    assert 0.02 < ds.masks.mean() < 0.8


def test_synthetic_distance_jitter():
    """synth_dist_jitter > 0: batches carry per-view camera distances, the
    renders actually use them (closer camera => larger silhouette via
    perspective magnification), and jitter 0 keeps the legacy schema."""
    import jax.numpy as jnp

    from tpu_unsup_pc.data.synthetic import _render_views

    cfg = CFG.replace(synth_dist_jitter=0.1)
    ds = SyntheticShapes(cfg, num_models=4)
    b = ds.sample_batch(2)
    assert b["distance"].shape == (2, cfg.num_views)
    d0 = cfg.camera_distance
    assert ds.distance.min() >= d0 * 0.9 - 1e-5
    assert ds.distance.max() <= d0 * 1.1 + 1e-5
    assert ds.distance.std() > 0.01 * d0
    assert "distance" not in SyntheticShapes(CFG, num_models=2).sample_batch(1)
    # same model + pose, near vs far camera: the near render must cover
    # meaningfully more pixels
    pts = jnp.asarray(ds.gt_points[:1])
    rgb = jnp.asarray(ds.gt_rgb[:1])
    az = jnp.asarray(ds.azimuth[:1])
    el = jnp.asarray(ds.elevation[:1])
    m_near, _ = _render_views(CFG, pts, rgb, az, el,
                              jnp.full(az.shape, d0 * 0.85))
    m_far, _ = _render_views(CFG, pts, rgb, az, el,
                             jnp.full(az.shape, d0 * 1.15))
    assert float(m_near.sum()) > float(m_far.sum()) * 1.15


def test_pose_npz_override(tmp_path):
    """pose_npz (pseudo-known-pose distillation): the train split's batches
    carry the npz quaternions (normalized), val/test splits keep the GT
    schema, and the loss builds cameras from the override exactly as it
    would from matching euler angles."""
    import jax.numpy as jnp

    from tpu_unsup_pc.models.losses import _gt_cameras
    from tpu_unsup_pc.ops.quaternion import quat_from_euler

    V = CFG.num_views
    q = np.random.default_rng(1).normal(size=(4, V, 4)).astype(np.float32)
    path = str(tmp_path / "poses.npz")
    np.savez(path, pred_pose_guarded=q * 2.0)   # un-normalized on purpose
    cfg = CFG.replace(pose_npz=path)
    ds = SyntheticShapes(cfg, num_models=4)
    b = ds.get_batch(np.asarray([0, 2]))
    assert b["quat"].shape == (2, V, 4)
    np.testing.assert_allclose(np.linalg.norm(b["quat"], axis=-1), 1.0,
                               rtol=1e-5)
    # override is train-split-only
    assert "quat" not in SyntheticShapes(cfg, num_models=4,
                                         split="val").sample_batch(1)
    # the loss camera uses the override verbatim; without it, the euler path
    gt = {"azimuth": b["azimuth"], "elevation": b["elevation"]}
    cam_e = _gt_cameras(cfg, gt)
    cam_q = _gt_cameras(cfg, {**gt, "quat": b["quat"]})
    assert not np.allclose(np.asarray(cam_q.quat), np.asarray(cam_e.quat))
    same = _gt_cameras(cfg, {**gt, "quat": quat_from_euler(
        jnp.asarray(b["azimuth"]), jnp.asarray(b["elevation"]))})
    np.testing.assert_allclose(np.asarray(same.quat),
                               np.asarray(cam_e.quat), atol=1e-6)
    # shape mismatch (wrong num_models) fails loudly, not silently
    import pytest
    with pytest.raises(AssertionError):
        SyntheticShapes(cfg, num_models=8)


def test_synthetic_deterministic():
    a = SyntheticShapes(CFG, num_models=4, seed=7)
    b = SyntheticShapes(CFG, num_models=4, seed=7)
    np.testing.assert_array_equal(a.masks, b.masks)
    np.testing.assert_array_equal(a.gt_points, b.gt_points)


def test_synthetic_render_cache(tmp_path, monkeypatch):
    """The on-disk render cache round-trips bit-exactly and is keyed on
    the render-relevant config (different num_models / shapes miss)."""
    monkeypatch.setenv("SYNTH_CACHE_DIR", str(tmp_path))
    a = SyntheticShapes(CFG, num_models=4, seed=7)
    files = list(tmp_path.glob("synth_*.npz"))
    assert len(files) == 1
    b = SyntheticShapes(CFG, num_models=4, seed=7)      # cache hit
    np.testing.assert_array_equal(a.masks, b.masks)
    np.testing.assert_array_equal(a.images, b.images)
    np.testing.assert_array_equal(a.distance, b.distance)
    c = SyntheticShapes(CFG.replace(synth_shapes="asym"),
                        num_models=4, seed=7)           # key miss
    assert len(list(tmp_path.glob("synth_*.npz"))) == 2
    assert not np.array_equal(a.masks, c.masks)
    # cache-loaded datasets still apply the pose_npz override
    q = np.random.default_rng(0).normal(size=(4, CFG.num_views, 4))
    np.savez(str(tmp_path / "p.npz"), quat=q.astype(np.float32))
    d = SyntheticShapes(CFG.replace(pose_npz=str(tmp_path / "p.npz")),
                        num_models=4, seed=7)
    assert d.has_quat and "quat" in d.get_batch(np.asarray([0]))


def test_npz_round_trip(tmp_path):
    ds = SyntheticShapes(CFG, num_models=6)
    write_npz_dataset(str(tmp_path), "03001627", ds.images, ds.masks,
                      ds.azimuth, ds.elevation, split="train")
    cfg = CFG.replace(dataset="shapenet", data_dir=str(tmp_path),
                      categories=("03001627",))
    loader = ShapeNetViews(cfg)
    assert len(loader) == 6
    b = loader.sample_batch(2)
    V, H = CFG.num_views, CFG.image_size
    assert b["image"].shape == (2, V, H, H, 3)
    assert b["mask"].shape == (2, V, H, H)
    # masks survive the uint8 round trip exactly (they're binary)
    idx = int(loader._rng.integers(0, 6))
    direct = ds.masks[idx]
    via_disk = loader._load_model(loader.models[idx])["mask"]
    np.testing.assert_allclose(via_disk, direct, atol=1e-6)


def test_prefetching_batches(tmp_path):
    ds = SyntheticShapes(CFG, num_models=4)
    write_npz_dataset(str(tmp_path), "03001627", ds.images, ds.masks,
                      ds.azimuth, ds.elevation, split="train")
    cfg = CFG.replace(dataset="shapenet", data_dir=str(tmp_path),
                      categories=("03001627",))
    loader = ShapeNetViews(cfg)
    batches = list(loader.batches(steps=5, batch_size=2))
    assert len(batches) == 5


def test_category_filter(tmp_path):
    ds = SyntheticShapes(CFG, num_models=2)
    write_npz_dataset(str(tmp_path), "catA", ds.images, ds.masks,
                      ds.azimuth, ds.elevation)
    write_npz_dataset(str(tmp_path), "catB", ds.images, ds.masks,
                      ds.azimuth, ds.elevation)
    cfg = CFG.replace(dataset="shapenet", data_dir=str(tmp_path),
                      categories=("catB",))
    assert len(ShapeNetViews(cfg)) == 2
    cfg_all = cfg.replace(categories=("catA", "catB"))
    assert len(ShapeNetViews(cfg_all)) == 4


def test_factory():
    assert isinstance(make_dataset(CFG, num_models=2), SyntheticShapes)


def test_prefetch_early_exit_does_not_leak(tmp_path):
    """Abandoning a batches() iterator must unblock the producer thread
    (regression: producer used to block forever in q.put)."""
    import threading
    import time
    from tpu_unsup_pc.data.prefetch import prefetch_batches

    before = threading.active_count()
    it = prefetch_batches(lambda: {"x": np.zeros(4)}, steps=10_000,
                          maxsize=1)
    next(it)
    it.close()             # consumer walks away after one batch
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "producer thread leaked"


def test_shapenet_get_batch(tmp_path):
    """Explicit-index batches (the predict/eval path) work on the npz
    loader (regression: predict crashed on shapenet presets)."""
    ds = SyntheticShapes(CFG, num_models=4)
    write_npz_dataset(str(tmp_path), "03001627", ds.images, ds.masks,
                      ds.azimuth, ds.elevation, split="train")
    cfg = CFG.replace(dataset="shapenet", data_dir=str(tmp_path),
                      categories=("03001627",))
    loader = ShapeNetViews(cfg)
    b = loader.get_batch([0, 2])
    assert b["image"].shape[0] == 2
    np.testing.assert_allclose(b["azimuth"],
                               ds.azimuth[[0, 2], :CFG.num_views])
