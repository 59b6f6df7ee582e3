"""Fused render kernel tests (splat->DRC collapse in one kernel): fwd/bwd
equivalence vs the composed XLA path, silhouette-only and RGB, including
the H-tiled 128^3 configuration (interpret mode on CPU)."""

import numpy as np
import pytest

# interpret-mode kernel equivalence dominates suite wall time on the 1-core
# host; fast CI tier = `-m "not slow"` (README), full tier = TPUCHECK
pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from tpu_unsup_pc.configs import presets
from tpu_unsup_pc.ops.camera import make_camera
from tpu_unsup_pc.ops.pallas.render_kernel import (
    render_drc_mse_pallas_soa, render_drc_pallas_soa,
    render_drc_rgb_mse_pallas_soa, render_drc_rgb_pallas_soa)
from tpu_unsup_pc.ops.project import project_pointclouds_batched
from tpu_unsup_pc.ops.splat import splat_gauss_separable

# Mosaic needs chunk-slice offsets provably 128-aligned on the lane axis
# (compiled TPU); interpret mode (CPU CI) has no such constraint, so keep
# the fast tiny shapes there and the aligned ones under TPU_TESTS=1.
import os as _os
if _os.environ.get("TPU_TESTS"):
    D, N, P, CHUNK, RADIUS = 16, 256, 3, 128, 9
else:
    D, N, P, CHUNK, RADIUS = 16, 96, 3, 32, 9
# scale-aware kernel-vs-XLA tolerances (measured on-chip margins +
# headroom; see tests/_tolerances.py). Pure-reference computations run
# at highest matmul precision so the bound measures the KERNEL's error,
# not the reference's own MXU rounding (ref_precision docstring has the
# on-chip numbers); loss-level A/B tests share the nets between both
# sides and stay at production precision.
from tests._tolerances import check_fwd, check_grad, ref_precision
# compiled-TPU chunk alignment (see CHUNK above): small-shape
# tests that hardcode chunk/point counts use these instead
SMALL_CHUNK = 128 if _os.environ.get("TPU_TESTS") else 32
SMALL_N = 128 if _os.environ.get("TPU_TESTS") else 64


def _ref_sil(g, sigma):
    with ref_precision():
        occ = jnp.stack([
            splat_gauss_separable(g[i], D, sigma[i], radius=RADIUS,
                                  chunk=CHUNK, hat_correction=False)
            for i in range(g.shape[0])])
        v = jnp.clip(occ, 0, 1 - 1e-6)
        return 1.0 - jnp.prod(1.0 - v, axis=1)


def _soa(g):
    return g[..., 0], g[..., 1], g[..., 2]


def test_fused_sil_fwd_bwd(rng):
    g = jnp.asarray(rng.uniform(-1, D, size=(P, N, 3)).astype(np.float32))
    sigma = jnp.asarray([1.0, 1.6, 0.8], jnp.float32)
    sil = render_drc_pallas_soa(*_soa(g), sigma, D, RADIUS, CHUNK)
    check_fwd(sil, _ref_sil(g, sigma), "render_sil_fwd")
    tgt = jnp.asarray(rng.normal(size=(P, D, D)).astype(np.float32))
    gk = jax.grad(lambda x: jnp.sum(
        render_drc_pallas_soa(*_soa(x), sigma, D, RADIUS, CHUNK) * tgt))(g)
    gr = jax.grad(lambda x: jnp.sum(_ref_sil(x, sigma) * tgt))(g)
    check_grad(gk, gr, "render_sil_grad")


def test_fused_sil_h_tiled(rng):
    """D=128 exercises the multi-H-tile path (4 tiles of 32 rows)."""
    Dg = 128
    g = jnp.asarray(rng.uniform(20, Dg - 20, size=(1, SMALL_N, 3))
                    .astype(np.float32))
    sigma = jnp.asarray([1.5], jnp.float32)
    sil = render_drc_pallas_soa(*_soa(g), sigma, Dg, RADIUS, SMALL_CHUNK)
    with ref_precision():
        occ = splat_gauss_separable(g[0], Dg, 1.5, radius=RADIUS, chunk=32,
                                    hat_correction=False)
        ref = 1.0 - jnp.prod(1.0 - jnp.clip(occ, 0, 1 - 1e-6), axis=0)
    check_fwd(sil[0], ref, "render_sil_h_tiled")


def test_fused_mse_fwd_bwd(rng):
    """Fused render+MSE == unfused render followed by squared error, values
    AND gradients, including the mask-dedup index_map (S=2, K=2 pairs per
    target view share one mask block) and the in-kernel MSE seed."""
    B, S, V, K = 2, 2, 3, 2
    Pn = B * S * V * K
    g = jnp.asarray(rng.uniform(-1, D, size=(Pn, N, 3)).astype(np.float32))
    sigma = jnp.asarray(rng.uniform(0.8, 1.6, size=(Pn,))
                        .astype(np.float32))
    masks = jnp.asarray((rng.uniform(size=(B * V, D, D)) > 0.5)
                        .astype(np.float32))

    def ref_sse(x):
        sil = _ref_sil(x, sigma)                      # (P, H, W)
        m = masks.reshape(B, 1, V, 1, D, D)
        m = jnp.broadcast_to(m, (B, S, V, K, D, D)).reshape(Pn, D, D)
        return jnp.sum((sil - m) ** 2, axis=(-2, -1))

    sse_k = render_drc_mse_pallas_soa(*_soa(g), sigma, masks,
                                      (B, S, V, K), D, RADIUS, CHUNK)
    check_fwd(sse_k, ref_sse(g), "mse_fwd")
    # weighted sum -> per-pair cotangents differ, exercising the seed
    w = jnp.asarray(rng.uniform(0.1, 2.0, size=(Pn,)).astype(np.float32))
    gk = jax.grad(lambda x: jnp.sum(render_drc_mse_pallas_soa(
        *_soa(x), sigma, masks, (B, S, V, K), D, RADIUS, CHUNK) * w))(g)
    gr = jax.grad(lambda x: jnp.sum(ref_sse(x) * w))(g)
    check_grad(gk, gr, "mse_grad")


def _ref_rgb(cfg, pts, rgb, cams, sigma):
    with ref_precision():
        out = project_pointclouds_batched(pts, cams, sigma, cfg, rgb=rgb)
        return out.silhouette, out.rgb_image


def test_fused_rgb_matches_projector(rng):
    """Fused RGB kernel == the XLA batched projector (same normalization
    and compositing semantics), through the world-space entry point."""
    from tpu_unsup_pc.ops.project import render_silhouettes_fused
    cfg = presets.get("tiny").replace(vox_size=16, point_chunk=SMALL_CHUNK,
                                      use_pallas=True)
    pts = jnp.asarray(rng.uniform(-0.35, 0.35, size=(2, 60, 3))
                      .astype(np.float32))
    rgb = jnp.asarray(rng.uniform(size=(2, 60, 3)).astype(np.float32))
    az = jnp.asarray([0.4, 2.2], jnp.float32)
    el = jnp.asarray([0.2, -0.1], jnp.float32)
    cams = make_camera(az, el, cfg.camera_distance, cfg.focal_length)
    sigma = jnp.asarray([1.0, 1.3], jnp.float32)
    # force the fused path even off-TPU (interpret mode)
    sil_k, img_k = render_silhouettes_fused(pts, cams, sigma, cfg, rgb=rgb)
    sil_r, img_r = _ref_rgb(cfg.replace(use_pallas=False), pts, rgb, cams,
                            sigma)
    check_fwd(sil_k, sil_r, "rgb_render_sil_fwd")
    check_fwd(img_k, img_r, "rgb_render_img_fwd")


def test_fused_soa_matches_projector(rng):
    """The SoA silhouette path (the training default under use_pallas) ==
    the XLA batched projector, values and gradients."""
    from tpu_unsup_pc.ops.project import render_silhouettes_fused
    cfg = presets.get("tiny").replace(vox_size=16, image_size=16,
                                      point_chunk=SMALL_CHUNK, use_pallas=True)
    pts = jnp.asarray(rng.uniform(-0.35, 0.35, size=(3, 60, 3))
                      .astype(np.float32))
    az = jnp.asarray([0.4, 2.2, -1.0], jnp.float32)
    el = jnp.asarray([0.2, -0.1, 0.6], jnp.float32)
    cams = make_camera(az, el, cfg.camera_distance, cfg.focal_length)
    sigma = jnp.asarray([1.0, 1.3, 0.8], jnp.float32)
    sil_k, _ = render_silhouettes_fused(pts, cams, sigma, cfg)
    with ref_precision():
        ref = project_pointclouds_batched(pts, cams, sigma,
                                          cfg.replace(use_pallas=False))
    check_fwd(sil_k, ref.silhouette, "soa_render_sil_fwd")
    tgt = jnp.asarray(rng.normal(size=sil_k.shape).astype(np.float32))
    gk = jax.grad(lambda p: jnp.sum(
        render_silhouettes_fused(p, cams, sigma, cfg)[0] * tgt))(pts)
    with ref_precision():
        gr = jax.grad(lambda p: jnp.sum(project_pointclouds_batched(
            p, cams, sigma, cfg.replace(use_pallas=False)).silhouette
            * tgt))(pts)
    check_grad(gk, gr, "soa_render_grad")


def test_fused_loss_matches_unfused(rng, monkeypatch):
    """compute_loss through the fused render+MSE kernel == the unfused
    projector path, loss values and gradients, known-pose AND pose-ensemble
    branches (fused path forced on off-TPU via the availability gate)."""
    import tpu_unsup_pc.models.losses as L
    from tpu_unsup_pc.models.model import DPCModel

    cfg0 = presets.get("tiny").replace(vox_size=16, image_size=16,
                                       point_chunk=SMALL_CHUNK, use_pallas=True,
                                       source_views=1, num_views=2,
                                       pc_num_points=SMALL_N,
                                       enc_channels=(4, 8), fc_dims=(32,),
                                       latent_dim=32)
    for pose in (False, True):
        cfg = cfg0.replace(predict_pose=pose, pose_candidates=2)
        model = DPCModel(cfg=cfg)
        B, V, H = 2, cfg.num_views, cfg.image_size
        batch = {
            "image": jnp.asarray(rng.uniform(size=(B, V, H, H, 3)),
                                 jnp.float32),
            "mask": jnp.asarray(rng.uniform(size=(B, V, H, H)) > 0.5,
                                jnp.float32),
            "azimuth": jnp.asarray(rng.uniform(0, 6.28, size=(B, V)),
                                   jnp.float32),
            "elevation": jnp.asarray(rng.uniform(-0.3, 0.9, size=(B, V)),
                                     jnp.float32),
        }
        params = model.init(jax.random.PRNGKey(0), batch["image"])["params"]

        def loss_of(params, fused):
            monkeypatch.setattr(L, "fused_render_available",
                                lambda c, has_rgb: fused)
            out = model.apply({"params": params}, batch["image"])
            return L.compute_loss(cfg, out, batch, 1.2)[0]

        lf = float(loss_of(params, True))
        lu = float(loss_of(params, False))
        check_fwd(lf, lu, "fused_loss_value")
        if pose:  # grad check on the branch with nontrivial cotangent
            # routing (argmin + take_along_axis over the fused pair SSE)
            gf = jax.grad(lambda p: loss_of(p, True))(params)
            gu = jax.grad(lambda p: loss_of(p, False))(params)
            for a, b in zip(jax.tree_util.tree_leaves(gf),
                            jax.tree_util.tree_leaves(gu)):
                check_grad(a, b, "fused_loss_param_grad")


def test_fused_rgb_grads(rng):
    g = jnp.asarray(rng.uniform(2, D - 3, size=(1, SMALL_N, 3))
                    .astype(np.float32))
    rgb = jnp.asarray(rng.uniform(size=(1, SMALL_N, 3)).astype(np.float32))
    sigma = jnp.asarray([1.1], jnp.float32)
    tgt_s = jnp.asarray(rng.normal(size=(1, D, D)).astype(np.float32))
    tgt_i = jnp.asarray(rng.normal(size=(1, 3, D, D)).astype(np.float32))

    def loss_k(gg, cc):
        sil, img = render_drc_rgb_pallas_soa(*_soa(gg), *_soa(cc), sigma,
                                             D, RADIUS, CHUNK)
        return jnp.sum(sil * tgt_s) + jnp.sum(img * tgt_i)

    def loss_r(gg, cc):
        with ref_precision():
            vals = jnp.concatenate([jnp.ones_like(cc[0][:, :1]), cc[0]],
                                   axis=-1)
            grids = splat_gauss_separable(gg[0], D, sigma[0], values=vals,
                                          radius=RADIUS, chunk=CHUNK,
                                          hat_correction=False)
            occ, col = grids[0], grids[1:]
            v = jnp.clip(occ, 0, 1 - 1e-6)
            trans = jnp.cumprod(1 - v, axis=0)
            tb = jnp.concatenate([jnp.ones_like(trans[:1]), trans[:-1]])
            w = v * tb
            sil = 1 - trans[-1]
            cell = col / jnp.maximum(occ, 1e-6)
            img = jnp.einsum("dhw,cdhw->cdhw", w, cell).sum(1)
            return jnp.sum(sil * tgt_s[0]) + jnp.sum(img * tgt_i[0])

    gk, ck = jax.grad(loss_k, argnums=(0, 1))(g, rgb)
    gr, cr = jax.grad(loss_r, argnums=(0, 1))(g, rgb)
    check_grad(gk, gr, "rgb_render_dcoords")
    check_grad(ck, cr, "rgb_render_dcolors")


def _ref_rgb_render(g, c, sigma):
    """Composed XLA reference: per-pair occupancy + color splats, DRC
    collapse, expected-color compositing. g/c: (P, N, 3)."""
    with ref_precision():
        sils, imgs = [], []
        for i in range(g.shape[0]):
            vals = jnp.concatenate([jnp.ones_like(c[i][:, :1]), c[i]],
                                   axis=-1)
            grids = splat_gauss_separable(g[i], D, sigma[i], values=vals,
                                          radius=RADIUS, chunk=CHUNK,
                                          hat_correction=False)
            occ, col = grids[0], grids[1:]
            v = jnp.clip(occ, 0, 1 - 1e-6)
            trans = jnp.cumprod(1 - v, axis=0)
            tb = jnp.concatenate([jnp.ones_like(trans[:1]), trans[:-1]])
            w = v * tb
            cell = col / jnp.maximum(occ, 1e-6)
            sils.append(1 - trans[-1])
            imgs.append((w[None] * cell).sum(1))
        return jnp.stack(sils), jnp.stack(imgs)     # (P,H,W), (P,3,H,W)


def test_fused_rgb_mse_fwd_bwd(rng):
    """Fused RGB render+MSE == composed render followed by the two squared
    errors (sil SSE + masked color SSE), values AND gradients w.r.t. coords
    and colors, including the (B,S,V,K) mask/image dedup index_maps."""
    B, S, V, K = 2, 2, 2, 2
    Pn = B * S * V * K
    g = jnp.asarray(rng.uniform(-1, D, size=(Pn, N, 3)).astype(np.float32))
    c = jnp.asarray(rng.uniform(size=(Pn, N, 3)).astype(np.float32))
    sigma = jnp.asarray(rng.uniform(0.8, 1.6, size=(Pn,))
                        .astype(np.float32))
    masks = jnp.asarray((rng.uniform(size=(B * V, D, D)) > 0.5)
                        .astype(np.float32))
    imgs = jnp.asarray(rng.uniform(size=(B * V, 3, D, D))
                       .astype(np.float32))

    def dedup(x):
        m = x.reshape(B, 1, V, 1, *x.shape[1:])
        m = jnp.broadcast_to(m, (B, S, V, K) + x.shape[1:])
        return m.reshape(Pn, *x.shape[1:])

    def ref_sse(gg, cc):
        sil, img = _ref_rgb_render(gg, cc, sigma)
        m, t = dedup(masks), dedup(imgs)
        sse_s = jnp.sum((sil - m) ** 2, axis=(-2, -1))
        sse_r = jnp.sum(jnp.sum((img - t) ** 2, axis=1) * m,
                        axis=(-2, -1))
        return jnp.stack([sse_s, sse_r], axis=-1)

    sse_k = render_drc_rgb_mse_pallas_soa(*_soa(g), *_soa(c), sigma,
                                          masks, imgs, (B, S, V, K), D,
                                          RADIUS, CHUNK)
    check_fwd(sse_k, ref_sse(g, c), "rgb_mse_fwd")
    # weighted sum over both loss columns -> distinct per-pair cotangents,
    # exercising both in-kernel seeds
    w = jnp.asarray(rng.uniform(0.1, 2.0, size=(Pn, 2)).astype(np.float32))
    gk, ck = jax.grad(
        lambda gg, cc: jnp.sum(render_drc_rgb_mse_pallas_soa(
            *_soa(gg), *_soa(cc), sigma, masks, imgs, (B, S, V, K), D,
            RADIUS, CHUNK) * w), argnums=(0, 1))(g, c)
    gr, cr = jax.grad(lambda gg, cc: jnp.sum(ref_sse(gg, cc) * w),
                      argnums=(0, 1))(g, c)
    check_grad(gk, gr, "rgb_mse_dcoords")
    check_grad(ck, cr, "rgb_mse_dcolors")


def test_fused_rgb_loss_matches_unfused(rng, monkeypatch):
    """compute_loss through the fused RGB render+MSE kernel == the unfused
    projector path (values + grads), known-pose AND pose-ensemble branches
    with predict_rgb on."""
    import tpu_unsup_pc.models.losses as L
    from tpu_unsup_pc.models.model import DPCModel

    cfg0 = presets.get("tiny").replace(vox_size=16, image_size=16,
                                       point_chunk=SMALL_CHUNK,
                                       use_pallas=True, predict_rgb=True,
                                       source_views=1, num_views=2,
                                       pc_num_points=SMALL_N,
                                       enc_channels=(4, 8), fc_dims=(32,),
                                       latent_dim=32)
    for pose in (False, True):
        cfg = cfg0.replace(predict_pose=pose, pose_candidates=2)
        model = DPCModel(cfg=cfg)
        B, V, H = 2, cfg.num_views, cfg.image_size
        batch = {
            "image": jnp.asarray(rng.uniform(size=(B, V, H, H, 3)),
                                 jnp.float32),
            "mask": jnp.asarray(rng.uniform(size=(B, V, H, H)) > 0.5,
                                jnp.float32),
            "azimuth": jnp.asarray(rng.uniform(0, 6.28, size=(B, V)),
                                   jnp.float32),
            "elevation": jnp.asarray(rng.uniform(-0.3, 0.9, size=(B, V)),
                                     jnp.float32),
        }
        params = model.init(jax.random.PRNGKey(0), batch["image"])["params"]

        def loss_of(params, fused):
            monkeypatch.setattr(L, "fused_render_available",
                                lambda c, has_rgb: fused)
            out = model.apply({"params": params}, batch["image"])
            return L.compute_loss(cfg, out, batch, 1.2)[0]

        lf = float(loss_of(params, True))
        lu = float(loss_of(params, False))
        check_fwd(lf, lu, "fused_rgb_loss_value")
        gf = jax.grad(lambda p: loss_of(p, True))(params)
        gu = jax.grad(lambda p: loss_of(p, False))(params)
        for a, b in zip(jax.tree_util.tree_leaves(gf),
                        jax.tree_util.tree_leaves(gu)):
            check_grad(a, b, "fused_rgb_loss_param_grad")


def test_fused_mse_h_tiled(rng):
    """D=128 multi-H-tile MSE path (D//HT=4): the per-tile SSE output
    must stay (8, W)-tile-aligned — a (1, W) output block fails Mosaic
    lowering on TPU (caught by the c4 128^3 config, round 2)."""
    Dg, Np = 128, SMALL_N
    g = jnp.asarray(rng.uniform(20, Dg - 20, size=(1, Np, 3))
                    .astype(np.float32))
    sigma = jnp.asarray([1.5], jnp.float32)
    mask = jnp.asarray((rng.uniform(size=(1, Dg, Dg)) > 0.5)
                       .astype(np.float32))
    sse = render_drc_mse_pallas_soa(*_soa(g), sigma, mask, (1, 1, 1, 1),
                                    Dg, RADIUS, SMALL_CHUNK)
    with ref_precision():
        occ = splat_gauss_separable(g[0], Dg, 1.5, radius=RADIUS, chunk=32,
                                    hat_correction=False)
        sil = 1.0 - jnp.prod(1.0 - jnp.clip(occ, 0, 1 - 1e-6), axis=0)
        ref = jnp.sum((sil - mask[0]) ** 2)
    check_fwd(float(sse[0]), float(ref), "mse_h_tiled_fwd")
    gk = jax.grad(lambda x: jnp.sum(render_drc_mse_pallas_soa(
        *_soa(x), sigma, mask, (1, 1, 1, 1), Dg, RADIUS, SMALL_CHUNK)))(g)
    occ_f = lambda x: splat_gauss_separable(x[0], Dg, 1.5, radius=RADIUS,
                                            chunk=32, hat_correction=False)
    ref_f = lambda x: jnp.sum((1.0 - jnp.prod(
        1.0 - jnp.clip(occ_f(x), 0, 1 - 1e-6), axis=0) - mask[0]) ** 2)
    with ref_precision():
        gr = jax.grad(ref_f)(g)
    check_grad(gk, gr, "mse_h_tiled_grad")


# ------------------------------------------------------- one-pass MSE

def test_onepass_mse_matches_twopass(rng):
    """One-pass value+Jacobian kernel == the two-kernel custom-VJP op,
    values AND gradients, under a DATA-DEPENDENT cotangent (softmin over
    the per-pair SSE — the pose-ensemble shape): the one-pass op computes
    J with seed=1 in the forward and rescales by the incoming cotangent,
    so any downstream loss must match. Kernel-vs-kernel (both Pallas), no
    ref_precision."""
    from tpu_unsup_pc.ops.pallas.render_kernel import (
        render_drc_mse_onepass, render_drc_mse_pallas_soa)
    B, S, V, K = 2, 2, 2, 2
    Pn = B * S * V * K
    g = jnp.asarray(rng.uniform(-1, D, size=(Pn, N, 3)).astype(np.float32))
    sigma = jnp.asarray(rng.uniform(0.8, 1.6, size=(Pn,))
                        .astype(np.float32))
    masks = jnp.asarray((rng.uniform(size=(B * V, D, D)) > 0.5)
                        .astype(np.float32))
    ps = (B, S, V, K)

    def loss(op, x):
        sse = op(*_soa(x), sigma, masks, ps, D, RADIUS, CHUNK)
        w = jax.nn.softmax(-sse.reshape(B, S, V, K)).reshape(Pn)
        return jnp.sum(sse * w)

    one = lambda x: loss(render_drc_mse_onepass, x)
    two = lambda x: loss(render_drc_mse_pallas_soa, x)
    check_fwd(float(one(g)), float(two(g)), "onepass_mse_value")
    g1 = jax.grad(one)(g)
    g2 = jax.grad(two)(g)
    check_grad(g1, g2, "onepass_mse_grad")


def test_onepass_sigma_grad(rng):
    """sigma_grad=True: the one-pass kernel's analytic per-pair sigma
    Jacobian matches the splat_gauss_separable reference under a weighted
    sse sum (per-pair cotangents differ); the flag must not perturb the
    coordinate gradients, and flag-off keeps the zero-cotangent
    contract."""
    from tpu_unsup_pc.ops.pallas.render_kernel import render_drc_mse_onepass
    B, S, V, K = 1, 2, 3, 1
    Pn = B * S * V * K
    g = jnp.asarray(rng.uniform(-1, D, size=(Pn, N, 3)).astype(np.float32))
    sigma = jnp.asarray(rng.uniform(0.9, 1.7, size=(Pn,))
                        .astype(np.float32))
    masks = jnp.asarray((rng.uniform(size=(B * V, D, D)) > 0.5)
                        .astype(np.float32))
    w = jnp.asarray(rng.uniform(0.1, 2.0, size=(Pn,)).astype(np.float32))
    ps = (B, S, V, K)

    def m_full():
        m = masks.reshape(B, 1, V, 1, D, D)
        return jnp.broadcast_to(m, (B, S, V, K, D, D)).reshape(Pn, D, D)

    def ref_loss(sig):
        return jnp.sum(
            jnp.sum((_ref_sil(g, sig) - m_full()) ** 2, axis=(-2, -1)) * w)

    def one_loss(sig, sg):
        return jnp.sum(render_drc_mse_onepass(
            *_soa(g), sig, masks, ps, D, RADIUS, CHUNK, False, sg) * w)

    gs_k = jax.grad(lambda s: one_loss(s, True))(sigma)
    gs_r = jax.grad(ref_loss)(sigma)
    check_grad(gs_k, gs_r, "onepass_sigma_grad")
    # flag off: zero cotangent by contract
    gs_off = jax.grad(lambda s: one_loss(s, False))(sigma)
    assert float(jnp.max(jnp.abs(gs_off))) == 0.0
    # sse values and coordinate grads identical with the flag on/off
    def coord_loss(x, sg):
        return jnp.sum(render_drc_mse_onepass(
            *_soa(x), sigma, masks, ps, D, RADIUS, CHUNK, False, sg) * w)
    np.testing.assert_allclose(np.asarray(coord_loss(g, True)),
                               np.asarray(coord_loss(g, False)), rtol=1e-6)
    gc_on = jax.grad(lambda x: coord_loss(x, True))(g)
    gc_off = jax.grad(lambda x: coord_loss(x, False))(g)
    check_grad(gc_on, gc_off, "onepass_sigma_grad_coords_unperturbed")


def test_predict_scale_fused_matches_unfused(rng, monkeypatch):
    """predict_scale on the Pallas fast path (one-pass sigma_grad): the
    full compute_loss value AND parameter gradients — including the scale
    head's, which only receive signal through dsigma — match the unfused
    XLA projector path."""
    import tpu_unsup_pc.models.losses as L
    from tpu_unsup_pc.models.model import DPCModel

    cfg = presets.get("tiny").replace(
        vox_size=16, image_size=16, point_chunk=SMALL_CHUNK,
        use_pallas=True, source_views=1, num_views=2,
        pc_num_points=SMALL_N, enc_channels=(4, 8), fc_dims=(32,),
        latent_dim=32, predict_scale=True)
    model = DPCModel(cfg=cfg)
    B, V, H = 2, cfg.num_views, cfg.image_size
    batch = {
        "image": jnp.asarray(rng.uniform(size=(B, V, H, H, 3)),
                             jnp.float32),
        "mask": jnp.asarray(rng.uniform(size=(B, V, H, H)) > 0.5,
                            jnp.float32),
        "azimuth": jnp.asarray(rng.uniform(0, 6.28, size=(B, V)),
                               jnp.float32),
        "elevation": jnp.asarray(rng.uniform(-0.3, 0.9, size=(B, V)),
                                 jnp.float32),
    }
    params = model.init(jax.random.PRNGKey(0), batch["image"])["params"]

    def loss_of(params, fused):
        monkeypatch.setattr(L, "fused_render_available",
                            lambda c, has_rgb: fused)
        out = model.apply({"params": params}, batch["image"])
        return L.compute_loss(cfg, out, batch, 1.2)[0]

    check_fwd(float(loss_of(params, True)), float(loss_of(params, False)),
              "scale_fused_loss_value")
    gf = jax.grad(lambda p: loss_of(p, True))(params)
    gu = jax.grad(lambda p: loss_of(p, False))(params)
    if not _os.environ.get("TPU_TESTS"):
        # strict A/B only in interpret mode: at these tiny decoder-init
        # shapes the occupancy saturates (clip at 1-eps almost
        # everywhere), so gradients flow only through clip-BOUNDARY
        # cells whose (raw < 1-eps) mask is bit-sensitive — on-chip the
        # two paths legitimately pick different boundary sets at
        # production matmul precision. The on-chip numerical contract
        # for dsigma is test_onepass_sigma_grad (well-spread points,
        # ref_precision references).
        for (ka, a), (kb, b) in zip(
                jax.tree_util.tree_leaves_with_path(gf),
                jax.tree_util.tree_leaves_with_path(gu)):
            check_grad(a, b,
                       f"scale_fused_param_grad{jax.tree_util.keystr(ka)}")
    for v in jax.tree_util.tree_leaves(gf):
        assert bool(jnp.all(jnp.isfinite(v)))
    # the scale head grads must be nonzero on BOTH paths (the fused one
    # only gets them through the in-kernel sigma Jacobian)
    flat = dict(jax.tree_util.tree_flatten_with_path(gf)[0])
    scale_leaves = [v for k, v in flat.items() if "scale" in
                    jax.tree_util.keystr(k).lower()]
    assert scale_leaves, "no scale-head params found"
    assert any(float(jnp.max(jnp.abs(v))) > 0 for v in scale_leaves)


def test_onepass_rgb_mse_matches_twopass(rng):
    """One-pass RGB value+ct-weighted-gradient kernel == the two-kernel
    op under its contract loss sum(ct * sse), values and coord/color
    gradients — plus a proportional loss (2x) to exercise the lam
    rescale. Kernel-vs-kernel, no ref_precision."""
    from tpu_unsup_pc.ops.pallas.render_kernel import (
        render_drc_rgb_mse_onepass, render_drc_rgb_mse_pallas_soa)
    B, S, V, K = 2, 2, 2, 1
    Pn = B * S * V * K
    g = jnp.asarray(rng.uniform(-1, D, size=(Pn, N, 3)).astype(np.float32))
    c = jnp.asarray(rng.uniform(size=(Pn, N, 3)).astype(np.float32))
    sigma = jnp.asarray(rng.uniform(0.8, 1.6, size=(Pn,))
                        .astype(np.float32))
    masks = jnp.asarray((rng.uniform(size=(B * V, D, D)) > 0.5)
                        .astype(np.float32))
    imgs = jnp.asarray(rng.uniform(size=(B * V, 3, D, D))
                       .astype(np.float32))
    ps = (B, S, V, K)
    # ct with a zeroed pair (excluded-pair case) and distinct columns
    ct = rng.uniform(0.1, 2.0, size=(Pn, 2)).astype(np.float32)
    ct[1] = 0.0
    ct = jnp.asarray(ct)

    for lam, tag in ((1.0, ""), (2.0, "_lam2")):
        def one(gg, cc):
            sse = render_drc_rgb_mse_onepass(*_soa(gg), *_soa(cc), sigma,
                                             masks, imgs, ct, ps, D,
                                             RADIUS, CHUNK)
            return lam * jnp.sum(sse * ct)

        def two(gg, cc):
            sse = render_drc_rgb_mse_pallas_soa(*_soa(gg), *_soa(cc),
                                                sigma, masks, imgs, ps, D,
                                                RADIUS, CHUNK)
            return lam * jnp.sum(sse * ct)

        check_fwd(float(one(g, c)), float(two(g, c)),
                  f"onepass_rgb_value{tag}")
        g1, c1 = jax.grad(one, argnums=(0, 1))(g, c)
        g2, c2 = jax.grad(two, argnums=(0, 1))(g, c)
        check_grad(g1, g2, f"onepass_rgb_dcoords{tag}")
        check_grad(c1, c2, f"onepass_rgb_dcolors{tag}")


def test_onepass_rgb_ct_nonproportional_boundary(rng):
    """Fence for the one-pass ct-proportionality contract (VERDICT r4
    weak #6): the kernel's backward rescales its stored ct-weighted
    Jacobian by the PER-PAIR scalar gsse/ct, which is exact iff the
    downstream loss is (pairwise-proportional to) sum(ct * sse). A loss
    that weights the sil and rgb columns in a DIFFERENT ratio than ct
    violates the contract — this test pins that boundary by asserting the
    one-pass gradient visibly DISAGREES with the two-kernel op there
    (if this ever starts passing, the kernel grew real two-column
    Jacobians and losses.py's call-site restriction can be lifted)."""
    from tpu_unsup_pc.ops.pallas.render_kernel import (
        render_drc_rgb_mse_onepass, render_drc_rgb_mse_pallas_soa)
    B, S, V, K = 2, 1, 2, 1
    Pn = B * S * V * K
    g = jnp.asarray(rng.uniform(-1, D, size=(Pn, N, 3)).astype(np.float32))
    c = jnp.asarray(rng.uniform(size=(Pn, N, 3)).astype(np.float32))
    sigma = jnp.asarray(rng.uniform(0.8, 1.6, size=(Pn,))
                        .astype(np.float32))
    masks = jnp.asarray((rng.uniform(size=(B * V, D, D)) > 0.5)
                        .astype(np.float32))
    imgs = jnp.asarray(rng.uniform(size=(B * V, 3, D, D))
                       .astype(np.float32))
    ps = (B, S, V, K)
    ct = jnp.asarray(rng.uniform(0.1, 2.0, size=(Pn, 2))
                     .astype(np.float32))
    # non-proportional downstream weights: scale the rgb column 5x
    # relative to what ct promised the kernel
    w = jnp.asarray([[1.0, 5.0]], jnp.float32) * ct

    def one(gg):
        sse = render_drc_rgb_mse_onepass(*_soa(gg), *_soa(c), sigma,
                                         masks, imgs, ct, ps, D,
                                         RADIUS, CHUNK)
        return jnp.sum(sse * w)

    def two(gg):
        sse = render_drc_rgb_mse_pallas_soa(*_soa(gg), *_soa(c),
                                            sigma, masks, imgs, ps, D,
                                            RADIUS, CHUNK)
        return jnp.sum(sse * w)

    # values still agree (the forward doesn't depend on ct's promise)
    check_fwd(float(one(g)), float(two(g)), "ct_boundary_value")
    g1 = jax.grad(one)(g)
    g2 = jax.grad(two)(g)
    rel = float(jnp.max(jnp.abs(g1 - g2)) / jnp.max(jnp.abs(g2)))
    assert rel > 0.05, (
        f"one-pass gradient unexpectedly matched the two-kernel op under "
        f"a non-proportional loss (max rel diff {rel:.4f}) — if the "
        "kernel now emits true two-column Jacobians, update this fence "
        "and lift the losses.py call-site restriction")


def test_onepass2_rgb_matches_twopass(rng):
    """Two-column-Jacobian one-pass RGB kernel == the two-kernel op with
    NO proportionality requirement: values and coord/color gradients
    under (a) a non-proportional per-pair two-column weighting and (b)
    an argmin + take_along_axis candidate selection — the exact
    downstream structure of the pose-ensemble branch that excludes the
    ct kernel. Kernel-vs-kernel, no ref_precision."""
    from tpu_unsup_pc.ops.pallas.render_kernel import (
        render_drc_rgb_mse_onepass2, render_drc_rgb_mse_pallas_soa)
    B, S, V, K = 2, 1, 2, 2
    Pn = B * S * V * K
    g = jnp.asarray(rng.uniform(-1, D, size=(Pn, N, 3)).astype(np.float32))
    c = jnp.asarray(rng.uniform(size=(Pn, N, 3)).astype(np.float32))
    sigma = jnp.asarray(rng.uniform(0.8, 1.6, size=(Pn,))
                        .astype(np.float32))
    masks = jnp.asarray((rng.uniform(size=(B * V, D, D)) > 0.5)
                        .astype(np.float32))
    imgs = jnp.asarray(rng.uniform(size=(B * V, 3, D, D))
                       .astype(np.float32))
    ps = (B, S, V, K)
    # (a) arbitrary non-proportional weights with distinct columns
    w = jnp.asarray(rng.uniform(0.1, 2.0, size=(Pn, 2))
                    .astype(np.float32))

    def loss_weighted(render):
        def f(gg, cc):
            sse = render(*_soa(gg), *_soa(cc), sigma, masks, imgs, ps,
                         D, RADIUS, CHUNK)
            return jnp.sum(sse * w)
        return f

    # (b) the pose-ensemble downstream: per-(b,s,v) argmin over K of the
    # combined column loss, then take_along_axis — cotangents land only
    # on the selected candidates, in a data-dependent pattern
    def loss_argmin(render):
        def f(gg, cc):
            sse = render(*_soa(gg), *_soa(cc), sigma, masks, imgs, ps,
                         D, RADIUS, CHUNK).reshape(B, S, V, K, 2)
            pair = sse[..., 0] / (D * D) + 0.7 * sse[..., 1]
            best = jnp.argmin(pair, axis=-1)                  # (B,S,V)
            sel = jnp.take_along_axis(pair, best[..., None],
                                      axis=-1)[..., 0]
            return jnp.mean(sel)
        return f

    for tag, mk in (("weighted", loss_weighted), ("argmin", loss_argmin)):
        one = mk(render_drc_rgb_mse_onepass2)
        two = mk(render_drc_rgb_mse_pallas_soa)
        check_fwd(float(one(g, c)), float(two(g, c)),
                  f"onepass2_rgb_value_{tag}")
        g1, c1 = jax.grad(one, argnums=(0, 1))(g, c)
        g2, c2 = jax.grad(two, argnums=(0, 1))(g, c)
        check_grad(g1, g2, f"onepass2_rgb_dcoords_{tag}")
        check_grad(c1, c2, f"onepass2_rgb_dcolors_{tag}")


# ------------------------------------------------------- depth-banded MSE

def _banded_refs(rng, Dg, Np, Pn, z_lo, z_hi):
    """Clustered cloud (sorted by depth per pair) + per-pair sigma + mask."""
    z = np.sort(rng.uniform(z_lo, z_hi, size=(Pn, Np)), axis=-1)
    y = rng.uniform(-1, Dg, size=(Pn, Np))
    x = rng.uniform(-1, Dg, size=(Pn, Np))
    g = jnp.asarray(np.stack([z, y, x], axis=-1).astype(np.float32))
    sigma = jnp.asarray(rng.uniform(0.9, 1.5, size=(Pn,))
                        .astype(np.float32))
    masks = jnp.asarray((rng.uniform(size=(Pn, Dg, Dg)) > 0.5)
                        .astype(np.float32))
    return g, sigma, masks


def test_banded_mse_matches_dense(rng):
    """Depth-banded fused MSE == dense fused MSE (values + grads) on a
    clustered cloud at D=128 (the c4 shape class: multi-H-tile, dynamic
    depth windows). Direct kernel-vs-kernel, sorted inputs."""
    from tpu_unsup_pc.ops.pallas.render_kernel import (
        render_drc_mse_banded_soa)
    Dg, Np, Pn, band = 128, SMALL_N * 2, 2, 48
    g, sigma, masks = _banded_refs(rng, Dg, Np, Pn, 30.0, 52.0)
    ps = (Pn, 1, 1, 1)

    def dense(x):
        return render_drc_mse_pallas_soa(*_soa(x), sigma, masks, ps, Dg,
                                         RADIUS, SMALL_CHUNK)

    def banded(x):
        return render_drc_mse_banded_soa(*_soa(x), sigma, masks, ps, Dg,
                                         band, RADIUS, SMALL_CHUNK)

    check_fwd(banded(g), dense(g), "banded_mse_fwd")
    w = jnp.asarray(rng.uniform(0.1, 2.0, size=(Pn,)).astype(np.float32))
    gb = jax.grad(lambda x: jnp.sum(banded(x) * w))(g)
    gd = jax.grad(lambda x: jnp.sum(dense(x) * w))(g)
    check_grad(gb, gd, "banded_mse_grad")


def test_banded_mse_edge_clamp(rng):
    """Clusters hugging the depth edges exercise the window clamp to
    [0, D-band] on both sides."""
    from tpu_unsup_pc.ops.pallas.render_kernel import (
        render_drc_mse_banded_soa)
    Dg, Np, band = 128, SMALL_N, 48
    for lo, hi, tag in ((-2.0, 10.0, "lo"), (118.0, 130.0, "hi")):
        g, sigma, masks = _banded_refs(rng, Dg, Np, 1, lo, hi)
        ps = (1, 1, 1, 1)
        sse_b = render_drc_mse_banded_soa(*_soa(g), sigma, masks, ps, Dg,
                                          band, RADIUS, SMALL_CHUNK)
        sse_d = render_drc_mse_pallas_soa(*_soa(g), sigma, masks, ps, Dg,
                                          RADIUS, SMALL_CHUNK)
        check_fwd(sse_b, sse_d, f"banded_edge_{tag}_fwd")
        gb = jax.grad(lambda x: jnp.sum(render_drc_mse_banded_soa(
            *_soa(x), sigma, masks, ps, Dg, band, RADIUS, SMALL_CHUNK)))(g)
        gd = jax.grad(lambda x: jnp.sum(render_drc_mse_pallas_soa(
            *_soa(x), sigma, masks, ps, Dg, RADIUS, SMALL_CHUNK)))(g)
        check_grad(gb, gd, f"banded_edge_{tag}_grad")


def test_banded_auto_dispatch(rng):
    """render_drc_mse_auto(band=48) == dense on (a) a clustered cloud
    (banded branch taken), (b) a cloud whose sorted chunks straddle a
    depth gap wider than the band budget (cond falls back to dense), and
    (c) with -1e6 padding points mixed in (they sort first and must be
    ignored by the span plan). Gradients route through the sort gather.
    band passed explicitly: the production default is dense (see the
    measured negative result in render_drc_mse_auto's docstring)."""
    from tpu_unsup_pc.ops.pallas.render_kernel import render_drc_mse_auto
    Dg, Np = 128, SMALL_N * 2
    ps = (1, 1, 1, 1)
    masks = jnp.asarray((rng.uniform(size=(1, Dg, Dg)) > 0.5)
                        .astype(np.float32))
    sigma = jnp.asarray([1.2], jnp.float32)
    # (a) clustered; (b) bimodal with a ~90-cell gap; (c) clustered+pad
    z_a = rng.uniform(40, 60, size=(1, Np))
    z_b = np.concatenate([rng.uniform(5, 15, size=(1, Np // 2)),
                          rng.uniform(105, 120, size=(1, Np - Np // 2))],
                         axis=-1)
    z_c = np.concatenate([rng.uniform(40, 60, size=(1, Np - 32)),
                          np.full((1, 32), -1e6)], axis=-1)
    for z, tag in ((z_a, "banded"), (z_b, "fallback"), (z_c, "padded")):
        y = rng.uniform(-1, Dg, size=(1, Np))
        x = rng.uniform(-1, Dg, size=(1, Np))
        g = jnp.asarray(np.stack([z, y, x], axis=-1).astype(np.float32))

        def auto(a):
            return render_drc_mse_auto(*_soa(a), sigma, masks, ps, Dg,
                                       RADIUS, SMALL_CHUNK, band=48)

        def dense(a):
            return render_drc_mse_pallas_soa(*_soa(a), sigma, masks, ps,
                                             Dg, RADIUS, SMALL_CHUNK)

        check_fwd(auto(g), dense(g), f"auto_{tag}_fwd")
        ga = jax.grad(lambda a: jnp.sum(auto(a)))(g)
        gd = jax.grad(lambda a: jnp.sum(dense(a)))(g)
        check_grad(ga, gd, f"auto_{tag}_grad")
