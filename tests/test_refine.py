"""Test-time pose refinement (tpu_unsup_pc/refine.py): gradient descent on
camera rotations through the differentiable renderer must (a) recover a
known pose from a perturbed init, (b) select the right basin among
candidate inits by final SSE, and (c) run end-to-end on a model's
predictions, on both the XLA and (interpret-mode) fused Pallas paths."""

import numpy as np

import jax
import jax.numpy as jnp

from tpu_unsup_pc import training
from tpu_unsup_pc.configs import presets
from tpu_unsup_pc.ops.camera import Camera
from tpu_unsup_pc.ops.project import project_pointclouds_batched
from tpu_unsup_pc.ops.quaternion import (quat_angle_between,
                                         quat_from_axis_angle,
                                         quat_from_euler, quat_multiply,
                                         quat_normalize)
from tpu_unsup_pc.refine import refine_output_poses, refine_quats

CFG = presets.get("tiny")
SIGMA = 1.0


def _l_cloud(rng, B, N):
    """Pose-identifiable cloud: an L of two orthogonal bars (no rotational
    symmetry), jittered."""
    n1 = N // 2
    t1 = np.linspace(-0.4, 0.4, n1)
    t2 = np.linspace(0.0, 0.35, N - n1)
    bar1 = np.stack([t1, np.full(n1, -0.3), np.zeros(n1)], -1)
    bar2 = np.stack([np.full(N - n1, -0.4), t2, np.zeros(N - n1)], -1)
    pts = np.concatenate([bar1, bar2])[None] + rng.normal(
        scale=0.02, size=(B, N, 3))
    return jnp.asarray(pts, jnp.float32)


def _gt_masks(cfg, points, q_gt):
    B = points.shape[0]
    cams = Camera(quat=q_gt,
                  distance=jnp.full((B,), cfg.camera_distance, jnp.float32),
                  focal=jnp.full((B,), cfg.focal_length, jnp.float32))
    sig = jnp.full((B,), SIGMA, jnp.float32)
    return project_pointclouds_batched(points, cams, sig, cfg).silhouette


def _perturb(rng, q, degrees):
    axis = quat_normalize(jnp.asarray(
        rng.normal(size=q.shape[:-1] + (3,)), jnp.float32))
    dq = quat_from_axis_angle(
        axis, jnp.full(axis.shape[:-1], np.radians(degrees), jnp.float32))
    return quat_multiply(dq, q)


def test_refine_recovers_perturbed_pose(rng):
    B, N = 3, 128
    points = _l_cloud(rng, B, N)
    q_gt = quat_from_euler(jnp.asarray(rng.uniform(0, 6.28, B), jnp.float32),
                           jnp.asarray(rng.uniform(0.1, 0.8, B), jnp.float32))
    masks = _gt_masks(CFG, points, q_gt)
    init = _perturb(rng, q_gt, 25.0)[:, None]            # (B, 1, 4)
    before = np.degrees(np.asarray(quat_angle_between(init[:, 0], q_gt)))
    refined, sse = refine_quats(CFG, points, init, masks,
                                steps=80, lr=0.03, sigma=SIGMA)
    after = np.degrees(np.asarray(quat_angle_between(refined[:, 0], q_gt)))
    assert np.all(after < before * 0.5), (before, after)
    assert np.median(after) < 8.0, (before, after)


def test_refine_selects_correct_basin(rng):
    """A near-GT candidate must beat a 180°-flipped one on final SSE —
    the mechanism that recovers symmetry-flip misses at eval time."""
    B, N = 3, 128
    points = _l_cloud(rng, B, N)
    q_gt = quat_from_euler(jnp.asarray(rng.uniform(0, 6.28, B), jnp.float32),
                           jnp.asarray(rng.uniform(0.1, 0.8, B), jnp.float32))
    masks = _gt_masks(CFG, points, q_gt)
    flip = quat_multiply(
        quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), np.pi),
        q_gt)
    near = _perturb(rng, q_gt, 15.0)
    inits = jnp.stack([flip, near], axis=1)              # (B, 2, 4)
    refined, sse = refine_quats(CFG, points, inits, masks,
                                steps=80, lr=0.03, sigma=SIGMA)
    best = np.asarray(jnp.argmin(sse, axis=-1))
    assert np.all(best == 1), (best, np.asarray(sse))
    picked = refined[np.arange(B), best]
    err = np.degrees(np.asarray(quat_angle_between(picked, q_gt)))
    assert np.median(err) < 10.0, err


def test_refine_output_poses_end_to_end(rng):
    """Model-level wrapper: shapes, unit quats, and refinement never
    increases the per-view SSE of what it selects."""
    cfg = CFG.replace(predict_pose=True, pose_candidates=2)
    state = training.init_state(cfg, jax.random.PRNGKey(0))
    M, V, H = 2, cfg.num_views, cfg.image_size
    images = jnp.asarray(rng.uniform(size=(M, V, H, H, 3)), jnp.float32)
    masks = jnp.asarray(rng.uniform(size=(M, V, H, H)) > 0.6, jnp.float32)
    out = training.predict_step(cfg, state, images)
    ref = refine_output_poses(cfg, out, masks, steps=5, lr=0.02)
    assert ref["refined_best"].shape == (M, V, 4)
    assert ref["refined_student"].shape == (M, V, 4)
    assert ref["refined_sse"].shape == (M, V, cfg.pose_candidates + 1)
    nrm = np.linalg.norm(np.asarray(ref["refined_best"]), axis=-1)
    np.testing.assert_allclose(nrm, 1.0, atol=1e-5)
    # steps=0 is the identity (returns the inits and their baseline
    # aggregated SSE) — refinement must not make the best init worse
    ref0 = refine_output_poses(cfg, out, masks, steps=0, lr=0.02)
    best0 = np.asarray(jnp.min(ref0["refined_sse"], axis=-1))
    best1 = np.asarray(jnp.min(ref["refined_sse"], axis=-1))
    assert np.all(best1 <= best0 + 1e-4), (best0, best1)
    # "self" mode covers the single-source wrapper path
    ref_s = refine_output_poses(cfg, out, masks, steps=2, lr=0.02,
                                mode="self")
    assert ref_s["refined_best"].shape == (M, V, 4)


def test_refine_cross_multisource(rng):
    """Cross-view evidence: candidates for each view are scored by
    rendering BOTH views' clouds (shared canonical frame); the near-GT
    init must win over the flip in every view."""
    from tpu_unsup_pc.refine import refine_quats_multi
    B, Vv, N = 2, 2, 128
    pts = _l_cloud(rng, B, N)
    points = jnp.stack([pts, pts], axis=1)               # (B,V,N,3) sources
    az = jnp.asarray(rng.uniform(0, 6.28, (B, Vv)), jnp.float32)
    el = jnp.asarray(rng.uniform(0.1, 0.8, (B, Vv)), jnp.float32)
    q_gt = quat_from_euler(az, el)                       # (B,V,4)
    masks = _gt_masks(CFG, points.reshape(B * Vv, N, 3),
                      q_gt.reshape(B * Vv, 4)).reshape(
                          B, Vv, CFG.vox_size, CFG.vox_size)
    flip = quat_multiply(
        quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]),
                             jnp.full((B, Vv), np.pi, jnp.float32)), q_gt)
    near = _perturb(rng, q_gt, 15.0)
    inits = jnp.stack([flip, near], axis=2)              # (B,V,2,4)
    src_w = 1.0 - jnp.eye(Vv, dtype=jnp.float32)         # cross-only
    refined, sse = refine_quats_multi(CFG, points, inits, masks, src_w,
                                      steps=60, lr=0.03, sigma=SIGMA)
    best = np.asarray(jnp.argmin(sse, axis=-1))          # (B,V)
    assert np.all(best == 1), (best, np.asarray(sse))


def test_api_refine_poses(rng):
    """api.refine_poses is the notebook-surface wrapper over
    refine_output_poses — same shapes, same defaults."""
    from tpu_unsup_pc import api
    cfg = CFG.replace(predict_pose=True, pose_candidates=2)
    state = training.init_state(cfg, jax.random.PRNGKey(0))
    M, V, H = 1, cfg.num_views, cfg.image_size
    images = jnp.asarray(rng.uniform(size=(M, V, H, H, 3)), jnp.float32)
    masks = jnp.asarray(rng.uniform(size=(M, V, H, H)) > 0.6, jnp.float32)
    out = api.encode(cfg, state, images)
    ref = api.refine_poses(cfg, out, masks, steps=2)
    assert ref["refined_best"].shape == (M, V, 4)
    assert ref["refined_sse"].shape == (M, V, cfg.pose_candidates + 1)


def test_refine_fused_path_interpret(rng):
    """The fused render+SSE kernel path (interpret mode on CPU) descends:
    pose gradients flow through the one-pass kernel's coordinate
    Jacobians."""
    cfg = CFG.replace(use_pallas=True, force_fused=True, pc_num_points=64,
                      point_chunk=64)
    B, N = 1, 64
    points = _l_cloud(rng, B, N)
    q_gt = quat_from_euler(jnp.asarray([0.7]), jnp.asarray([0.4]))
    masks = _gt_masks(cfg.replace(use_pallas=False), points, q_gt)
    init = _perturb(rng, q_gt, 20.0)[:, None]
    _, sse0 = refine_quats(cfg, points, init, masks, steps=0, lr=0.05,
                           sigma=SIGMA)
    refined, sse = refine_quats(cfg, points, init, masks, steps=10, lr=0.05,
                                sigma=SIGMA)
    assert float(sse[0, 0]) < float(sse0[0, 0]), (sse0, sse)


def _two_color_bar(rng, B, N):
    """Silhouette-symmetric, color-asymmetric cloud: a straight bar along
    x, red on x<0 / blue on x>0. A 180° object rotation about z maps the
    bar onto itself (silhouettes identical) but swaps the colors."""
    t = np.linspace(-0.4, 0.4, N)
    pts = np.stack([t, np.zeros(N), np.zeros(N)], -1)[None] + rng.normal(
        scale=0.005, size=(B, N, 3))
    col = np.where(t[:, None] < 0, np.array([1.0, 0.0, 0.0]),
                   np.array([0.0, 0.0, 1.0]))
    return (jnp.asarray(pts, jnp.float32),
            jnp.asarray(np.broadcast_to(col, (B, N, 3)), jnp.float32))


def _gt_renders(cfg, points, rgb, q_gt):
    B = points.shape[0]
    cams = Camera(quat=q_gt,
                  distance=jnp.full((B,), cfg.camera_distance, jnp.float32),
                  focal=jnp.full((B,), cfg.focal_length, jnp.float32))
    sig = jnp.full((B,), SIGMA, jnp.float32)
    out = project_pointclouds_batched(points, cams, sig, cfg, rgb=rgb)
    return out.silhouette, out.rgb_image


def test_refine_rgb_evidence_discriminates_flip(rng):
    """Color evidence separates flip basins silhouettes cannot: on the
    two-color bar, the flipped init's silhouette SSE ties the correct
    one, but its masked RGB SSE is far larger — min-SSE selection picks
    the right basin only with rgb_w > 0."""
    from tpu_unsup_pc.refine import refine_quats_multi
    B, N = 2, 128
    points, rgb = _two_color_bar(rng, B, N)
    q_gt = quat_from_euler(
        jnp.asarray(rng.uniform(0, 6.28, B), jnp.float32),
        jnp.asarray(rng.uniform(0.1, 0.8, B), jnp.float32))
    masks, images = _gt_renders(CFG, points, rgb, q_gt)
    # object-frame 180° flip about z: q_gt ∘ Rz(pi) — exact silhouette
    # symmetry of the bar, color-swapping
    zpi = quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), np.pi)
    flip = quat_multiply(q_gt, jnp.broadcast_to(zpi, q_gt.shape))
    inits = jnp.stack([flip, q_gt], axis=1)[:, None]     # (B,1,2,4)
    pts_s, rgb_s = points[:, None], rgb[:, None]
    masks_s, images_s = masks[:, None], images[:, None]
    _, sse_sil = refine_quats_multi(CFG, pts_s, inits, masks_s,
                                    steps=0, sigma=SIGMA)
    _, sse_rgb = refine_quats_multi(CFG, pts_s, inits, masks_s,
                                    rgb=rgb_s, images=images_s,
                                    steps=0, sigma=SIGMA, rgb_w=1.0)
    sse_sil, sse_rgb = np.asarray(sse_sil[:, 0]), np.asarray(sse_rgb[:, 0])
    # silhouette evidence against the flip is jitter-level noise —
    # negligible next to the color term (measured ~0.03 vs ~70)...
    assert np.all(sse_sil[:, 0] < 0.01 * sse_rgb[:, 0]), (sse_sil, sse_rgb)
    # ...while color evidence separates the basins decisively
    assert np.all(np.argmin(sse_rgb, axis=-1) == 1), sse_rgb
    assert np.all(sse_rgb[:, 0] > 100.0 * np.maximum(sse_rgb[:, 1], 1e-6)), \
        sse_rgb


def test_refine_rgb_fused_interpret(rng):
    """The fused RGB render+SSE path (interpret mode): same basin
    separation, and gradient descent through the RGB kernel reduces the
    combined SSE."""
    from tpu_unsup_pc.refine import refine_quats_multi
    cfg = CFG.replace(use_pallas=True, force_fused=True, pc_num_points=64,
                      point_chunk=64)
    B, N = 1, 64
    points, rgb = _two_color_bar(rng, B, N)
    q_gt = quat_from_euler(jnp.asarray([0.7]), jnp.asarray([0.4]))
    masks, images = _gt_renders(CFG, points, rgb, q_gt)
    zpi = quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), np.pi)
    flip = quat_multiply(q_gt, jnp.broadcast_to(zpi, q_gt.shape))
    init = _perturb(rng, q_gt, 20.0)
    inits = jnp.stack([flip, init], axis=1)[:, None]     # (B,1,2,4)
    pts_s, rgb_s = points[:, None], rgb[:, None]
    _, sse0 = refine_quats_multi(cfg, pts_s, inits, masks[:, None],
                                 rgb=rgb_s, images=images[:, None],
                                 steps=0, sigma=SIGMA)
    _, sse = refine_quats_multi(cfg, pts_s, inits, masks[:, None],
                                rgb=rgb_s, images=images[:, None],
                                steps=8, lr=0.05, sigma=SIGMA)
    assert np.all(np.argmin(np.asarray(sse[:, 0]), -1) == 1), sse
    assert float(sse[0, 0, 1]) < float(sse0[0, 0, 1]), (sse0, sse)


def test_refine_guard_rejects_basin_hops(rng):
    """tools/refine_guard.py: per-view trust region keeps small refinement
    moves (polish) and rejects large ones (flip-basin hops), so guarded
    Acc@30 matches raw while guarded median matches refined on the
    polished subset."""
    import sys
    sys.path.insert(0, "tools")
    from refine_guard import guard_poses

    M, V = 4, 5
    az = rng.uniform(0, 2 * np.pi, size=(M, V)).astype(np.float32)
    el = rng.uniform(-0.5, 0.5, size=(M, V)).astype(np.float32)
    raw = np.asarray(quat_from_euler(jnp.asarray(az), jnp.asarray(el)))
    zpi = np.asarray(quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]),
                                          np.pi))
    # refined = raw nudged by ~5 deg everywhere, except view 0 of every
    # model which hops 180 deg (a flip-basin walk)
    nudge = np.asarray(quat_from_axis_angle(
        jnp.asarray(rng.normal(size=(M, V, 3)).astype(np.float32)),
        np.full((M, V), np.deg2rad(5.0), np.float32)))
    refined = np.array(quat_multiply(jnp.asarray(raw),
                                     jnp.asarray(nudge)))
    refined[:, 0] = np.asarray(quat_multiply(
        jnp.asarray(raw[:, 0]), jnp.broadcast_to(zpi, raw[:, 0].shape)))

    guarded, frac = guard_poses(raw, refined, guard_deg=15.0)
    # the hop is rejected (kept at raw), the polish is accepted
    assert np.allclose(guarded[:, 0], raw[:, 0]), "flip must be rejected"
    assert np.allclose(guarded[:, 1:], refined[:, 1:]), \
        "small moves must be accepted"
    assert np.isclose(frac, (V - 1) / V), frac
    # degenerate guards: 0 deg keeps everything raw, 360 accepts all
    g0, f0 = guard_poses(raw, refined, guard_deg=0.0)
    assert np.allclose(g0, raw) and f0 == 0.0
    gall, fall = guard_poses(raw, refined, guard_deg=360.0)
    assert np.allclose(gall, refined) and fall == 1.0
