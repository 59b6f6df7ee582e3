"""Model-layer tests (SURVEY.md §4.2): shapes, finiteness, pose ensemble
semantics, loss assembly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_unsup_pc.configs import presets
from tpu_unsup_pc.models.losses import compute_loss
from tpu_unsup_pc.models.model import DPCModel
from tpu_unsup_pc import training

CFG = presets.get("tiny")


def _dummy_batch(cfg, rng, B=2):
    V, H = cfg.num_views, cfg.image_size
    return {
        "image": jnp.asarray(rng.uniform(size=(B, V, H, H, 3)),
                             jnp.float32),
        "mask": jnp.asarray(rng.uniform(size=(B, V, H, H)) > 0.5,
                            jnp.float32),
        "azimuth": jnp.asarray(rng.uniform(0, 6.28, size=(B, V)),
                               jnp.float32),
        "elevation": jnp.asarray(rng.uniform(-0.3, 0.9, size=(B, V)),
                                 jnp.float32),
    }


def test_forward_shapes(rng):
    model = DPCModel(cfg=CFG)
    batch = _dummy_batch(CFG, rng)
    params = model.init(jax.random.PRNGKey(0), batch["image"])["params"]
    out = model.apply({"params": params}, batch["image"])
    B, V = 2, CFG.num_views
    assert out.latent.shape == (B, V, CFG.latent_dim)
    assert out.cloud.points.shape == (B, V, CFG.pc_num_points, 3)
    assert np.abs(np.asarray(out.cloud.points)).max() <= 0.5
    assert out.cloud.rgb is None and out.pose is None


def test_forward_rgb_pose_scale(rng):
    cfg = CFG.replace(predict_rgb=True, predict_pose=True,
                      predict_scale=True, pose_candidates=3)
    model = DPCModel(cfg=cfg)
    batch = _dummy_batch(cfg, rng)
    params = model.init(jax.random.PRNGKey(0), batch["image"])["params"]
    out = model.apply({"params": params}, batch["image"])
    B, V = 2, cfg.num_views
    assert out.cloud.rgb.shape == (B, V, cfg.pc_num_points, 3)
    assert float(out.cloud.rgb.min()) >= 0 and float(out.cloud.rgb.max()) <= 1
    assert out.cloud.scale.shape == (B, V)
    assert float(out.cloud.scale.min()) > 0
    # scale stays inside the clip rails (runs/c1_scale/SUMMARY.md: the
    # unbounded head defeats the sigma anneal — the bound is load-bearing)
    lo, hi = np.exp(-cfg.scale_clip), np.exp(cfg.scale_clip)
    s = np.asarray(out.cloud.scale)
    assert s.min() >= lo - 1e-6 and s.max() <= hi + 1e-6
    assert out.pose.candidates.shape == (B, V, 3, 4)
    norms = np.linalg.norm(np.asarray(out.pose.candidates), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    assert out.pose.student.shape == (B, V, 4)


def test_translation_head_shapes_and_grads(rng):
    """predict_translation: per-candidate distance offsets inside the
    +-0.5 tanh rails, consumed by the pose pair loss (gradients reach the
    head through the renderer's camera-distance Jacobian)."""
    cfg = CFG.replace(predict_pose=True, predict_translation=True,
                      pose_candidates=3)
    model = DPCModel(cfg=cfg)
    batch = _dummy_batch(cfg, rng)
    params = model.init(jax.random.PRNGKey(0), batch["image"])["params"]
    out = model.apply({"params": params}, batch["image"])
    B, V = 2, cfg.num_views
    assert out.pose.trans_offset.shape == (B, V, 3)
    assert np.abs(np.asarray(out.pose.trans_offset)).max() <= 0.5

    def loss_fn(p):
        o = model.apply({"params": p}, batch["image"])
        return compute_loss(cfg, o, batch, 1.0)[0]

    g = jax.grad(loss_fn)(params)
    gnorm = sum(float(jnp.sum(jnp.abs(v)))
                for v in jax.tree_util.tree_leaves(
                    g["pose_head"]["translation_head"]))
    assert np.isfinite(gnorm) and gnorm > 0


def test_trans_offset_scale_bounds_output(rng):
    """trans_offset_scale sets the tanh rails of the distance offset
    (runs/c3trans: a 0.5 range over +-0.1 jitter amplified noise 5x),
    and validate() rejects a range the data spread can't fit in."""
    cfg = CFG.replace(predict_pose=True, predict_translation=True,
                      pose_candidates=3, trans_offset_scale=0.15)
    model = DPCModel(cfg=cfg)
    batch = _dummy_batch(cfg, rng)
    params = model.init(jax.random.PRNGKey(0), batch["image"])["params"]
    out = model.apply({"params": params}, batch["image"])
    assert np.abs(np.asarray(out.pose.trans_offset)).max() <= 0.15
    with pytest.raises(AssertionError, match="cannot reach"):
        cfg.replace(synth_dist_jitter=0.2).validate()


def test_gt_cameras_use_batch_distance(rng):
    """Known-pose cameras pick up the dataset's per-view distances
    (synth_dist_jitter) and fall back to the configured constant."""
    from tpu_unsup_pc.models.losses import _gt_cameras
    batch = _dummy_batch(CFG, rng)
    cams = _gt_cameras(CFG, batch)
    np.testing.assert_allclose(np.asarray(cams.distance),
                               CFG.camera_distance)
    d = rng.uniform(1.8, 2.2, size=batch["azimuth"].shape
                    ).astype(np.float32)
    cams_j = _gt_cameras(CFG, {**batch, "distance": d})
    np.testing.assert_array_equal(np.asarray(cams_j.distance), d)


def test_candidate_anchors_are_diverse(rng):
    cfg = CFG.replace(predict_pose=True, pose_candidates=4)
    model = DPCModel(cfg=cfg)
    batch = _dummy_batch(cfg, rng)
    params = model.init(jax.random.PRNGKey(0), batch["image"])["params"]
    out = model.apply({"params": params}, batch["image"])
    c = np.asarray(out.pose.candidates)[0, 0]          # (K, 4)
    dots = np.abs(c @ c.T) - np.eye(4)
    assert dots.max() < 0.99  # no two candidates identical at init


def test_known_pose_loss_finite(rng):
    model = DPCModel(cfg=CFG)
    batch = _dummy_batch(CFG, rng)
    params = model.init(jax.random.PRNGKey(0), batch["image"])["params"]
    out = model.apply({"params": params}, batch["image"])
    loss, metrics = compute_loss(CFG, out, batch, 1.0)
    assert np.isfinite(float(loss))
    assert set(metrics) >= {"loss", "loss_sil"}


def test_pose_loss_selects_min_candidate(rng):
    cfg = CFG.replace(predict_pose=True, pose_candidates=2, source_views=1)
    model = DPCModel(cfg=cfg)
    batch = _dummy_batch(cfg, rng)
    params = model.init(jax.random.PRNGKey(0), batch["image"])["params"]
    out = model.apply({"params": params}, batch["image"])
    loss, metrics = compute_loss(cfg, out, batch, 1.0)
    assert np.isfinite(float(loss))
    assert "loss_student" in metrics
    # the teacher loss must be <= the loss of any single fixed candidate;
    # spot-check against candidate 0 by collapsing the ensemble to size 1
    pose0 = out.pose._replace(candidates=out.pose.candidates[:, :, :1])
    out0 = out._replace(pose=pose0)
    cfg0 = cfg.replace(pose_candidates=1)
    _, m0 = compute_loss(cfg0, out0, batch, 1.0)
    assert float(metrics["loss_sil"]) <= float(m0["loss_sil"]) + 1e-6


def test_exclude_self_view_drops_self_pairs(rng):
    """With exclude_self_view, corrupting the mask of a SOURCE view's own
    target slot must leave the known-pose loss unchanged for that pair set
    only when s==t pairs are the corrupted ones."""
    cfg = CFG.replace(source_views=1, exclude_self_view=True)
    model = DPCModel(cfg=cfg)
    batch = _dummy_batch(cfg, rng)
    params = model.init(jax.random.PRNGKey(0), batch["image"])["params"]
    out = model.apply({"params": params}, batch["image"])
    _, m_ref = compute_loss(cfg, out, batch, 1.0)
    # corrupt view 0's mask (the self-target of source 0): loss unchanged
    bad = dict(batch)
    bad["mask"] = batch["mask"].at[:, 0].set(1.0 - batch["mask"][:, 0])
    _, m_bad = compute_loss(cfg, out, bad, 1.0)
    np.testing.assert_allclose(float(m_bad["loss_sil"]),
                               float(m_ref["loss_sil"]), rtol=1e-6)
    # whereas WITHOUT the flag the corruption must change the loss
    cfg_in = cfg.replace(exclude_self_view=False)
    _, m_in_ref = compute_loss(cfg_in, out, batch, 1.0)
    _, m_in_bad = compute_loss(cfg_in, out, bad, 1.0)
    assert abs(float(m_in_bad["loss_sil"]) - float(m_in_ref["loss_sil"])) \
        > 1e-4


def test_pose_teacher_consistent_across_sources(rng):
    """Candidate selection aggregates over sources: with S=2 sources the
    selected candidate is identical for every source of a target view, so
    the teacher loss equals the source-mean loss at one shared argmin."""
    cfg = CFG.replace(predict_pose=True, pose_candidates=3, source_views=2)
    model = DPCModel(cfg=cfg)
    batch = _dummy_batch(cfg, rng)
    params = model.init(jax.random.PRNGKey(0), batch["image"])["params"]
    out = model.apply({"params": params}, batch["image"])
    loss, metrics = compute_loss(cfg, out, batch, 1.0)
    assert np.isfinite(float(loss))
    # teacher loss must be >= the min over candidates of the per-pair loss
    # (shared selection can't beat per-pair selection) and <= any single
    # fixed candidate's loss
    pose0 = out.pose._replace(candidates=out.pose.candidates[:, :, :1])
    _, m0 = compute_loss(cfg.replace(pose_candidates=1),
                         out._replace(pose=pose0), batch, 1.0)
    assert float(metrics["loss_sil"]) <= float(m0["loss_sil"]) + 1e-6


def test_pose_loss_with_exclude_self_view(rng):
    cfg = CFG.replace(predict_pose=True, pose_candidates=2, source_views=2,
                      exclude_self_view=True)
    model = DPCModel(cfg=cfg)
    batch = _dummy_batch(cfg, rng)
    params = model.init(jax.random.PRNGKey(0), batch["image"])["params"]
    out = model.apply({"params": params}, batch["image"])
    loss, metrics = compute_loss(cfg, out, batch, 1.0)
    assert np.isfinite(float(loss))
    assert np.isfinite(float(metrics["loss_student"]))


def test_train_step_updates_params(rng):
    state = training.init_state(CFG)
    batch = _dummy_batch(CFG, rng)
    # snapshot before the step: train_step donates the state buffers
    old = np.asarray(jax.tree_util.tree_leaves(state.params)[0]).copy()
    new_state, metrics = training.train_step(CFG, state, batch)
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    leaf = np.asarray(jax.tree_util.tree_leaves(new_state.params)[0])
    assert not np.allclose(leaf, old)


def test_bfloat16_nets_train(rng):
    """cfg.dtype='bfloat16' computes nets in bf16 (params stay f32) and
    the train step stays finite and updates."""
    cfg = CFG.replace(dtype="bfloat16")
    state = training.init_state(cfg)
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    assert p0.dtype == np.float32          # params stored in f32
    batch = _dummy_batch(cfg, rng)
    state, metrics = training.train_step(cfg, state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_eval_and_predict_steps(rng):
    state = training.init_state(CFG)
    batch = _dummy_batch(CFG, rng)
    metrics = training.eval_step(CFG, state, batch)
    assert np.isfinite(float(metrics["loss"]))
    out = training.predict_step(CFG, state, batch["image"][:, 0])
    assert out.cloud.points.shape == (2, CFG.pc_num_points, 3)


def test_pose_student_warmup_scales_weight(rng):
    """pose_student_warmup_steps ramps the student weight 0 -> full
    (collapse insurance, docs/pose_training.md)."""
    cfg = CFG.replace(predict_pose=True, pose_candidates=2,
                      pose_student_warmup_steps=100)
    model = DPCModel(cfg=cfg)
    batch = _dummy_batch(cfg, rng)
    params = model.init(jax.random.PRNGKey(0), batch["image"])["params"]
    out = model.apply({"params": params}, batch["image"])
    loss0, m0 = compute_loss(cfg, out, batch, 1.0, step=0)
    loss_half, _ = compute_loss(cfg, out, batch, 1.0, step=50)
    loss_full, m_full = compute_loss(cfg, out, batch, 1.0, step=100)
    loss_past, _ = compute_loss(cfg, out, batch, 1.0, step=10_000)
    w, s = cfg.pose_student_weight, float(m0["loss_student"])
    np.testing.assert_allclose(float(loss0), float(m0["loss_teacher"]),
                               rtol=1e-6)
    np.testing.assert_allclose(float(loss_half) - float(loss0), 0.5 * w * s,
                               rtol=1e-4)
    np.testing.assert_allclose(float(loss_full), float(loss_past), rtol=1e-6)
    # no step given (or warmup off) -> full weight
    loss_none, _ = compute_loss(cfg, out, batch, 1.0)
    np.testing.assert_allclose(float(loss_none), float(loss_full), rtol=1e-6)


def test_pose_student_detach_blocks_trunk_grads(rng):
    """pose_student_detach: the student imitation loss must not move the
    encoder/trunk (only the student head)."""
    cfg = CFG.replace(predict_pose=True, pose_candidates=2,
                      pose_student_detach=True)
    model = DPCModel(cfg=cfg)
    batch = _dummy_batch(cfg, rng)
    params = model.init(jax.random.PRNGKey(0), batch["image"])["params"]

    def student_term(p):
        out = model.apply({"params": p}, batch["image"])
        _, m = compute_loss(cfg, out, batch, 1.0)
        return m["loss_student"]

    g = jax.grad(student_term)(params)
    g_student = g["pose_head"]["student_head"]["kernel"]
    assert float(jnp.abs(g_student).max()) > 0
    flat = jax.tree_util.tree_leaves_with_path(g)
    for path, leaf in flat:
        name = jax.tree_util.keystr(path)
        if "student_head" in name:
            continue
        assert float(jnp.abs(leaf).max()) == 0.0, name


def test_pose_student_weight_decay(rng):
    """pose_student_decay_steps ramps the weight to pose_student_weight_end
    (anti-merge insurance, docs/pose_training.md)."""
    cfg = CFG.replace(predict_pose=True, pose_candidates=2,
                      pose_student_weight=10.0,
                      pose_student_weight_end=2.0,
                      pose_student_decay_steps=100)
    model = DPCModel(cfg=cfg)
    batch = _dummy_batch(cfg, rng)
    params = model.init(jax.random.PRNGKey(0), batch["image"])["params"]
    out = model.apply({"params": params}, batch["image"])
    _, m0 = compute_loss(cfg, out, batch, 1.0, step=0)
    teacher, student = float(m0["loss_teacher"]), float(m0["loss_student"])
    for step, w in ((0, 10.0), (50, 6.0), (100, 2.0), (5000, 2.0)):
        loss, _ = compute_loss(cfg, out, batch, 1.0, step=step)
        np.testing.assert_allclose(float(loss), teacher + w * student,
                                   rtol=1e-5)
