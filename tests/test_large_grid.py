"""Large-grid (>=192^3) dispatch gates (round 4).

The 256^3 scale path (preset c4xl_256grid) has three measured hazards,
each guarded in source; these tests pin the guards at the dispatch level
(the kernels themselves are equivalence-tested on-chip —
tools/band_crossover_bench.py rel_err 0.0, and the banded kernels'
contract tests live in tests/test_render_kernel.py):

1. the standalone splat Pallas kernel fails Mosaic at D=256
   (ops/splat.py gate -> separable XLA path),
2. the one-pass render kernel collapses to ~907ms/10 pairs at 256^3
   (ops/project.py auto-bands D>=192),
3. the synthetic renderer OOMs HBM with 64^3-sized model chunks at
   256^3 (data/synthetic.py scales render_chunk by grid volume).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_unsup_pc.configs import presets
from tpu_unsup_pc.ops import splat as splat_mod
from tpu_unsup_pc.ops import project as project_mod


def test_c4xl_preset_validates():
    cfg = presets.get("c4xl_synth")
    assert cfg.vox_size == 256 and cfg.image_size == 256
    # r5: band 112 — the band must cover realistic per-chunk depth spans
    # plus 2*(radius+2) at the preset's radius (25 at sigma_start 6.0),
    # else the lax.cond silently falls back to dense every step (the r5
    # band-80 finding, BASELINE.md honesty note). Enforce the margin
    # relation rather than a magic number.
    from tpu_unsup_pc.ops.splat import static_gauss_radius
    radius = static_gauss_radius(max(cfg.sigma_start, cfg.sigma_end))
    budget = cfg.pallas_band - 2 * (radius + 2)
    assert cfg.pallas_band == 112 and budget >= 56, (
        f"span budget {budget} must cover the measured realistic max "
        "chunk span (~56 cells at 8k-pt density under perspective)")
    # two extra encoder stages keep the conv stack at a 4x4 final map
    assert len(cfg.enc_channels) == 6


def test_splat_pallas_gated_to_baseline_grids(monkeypatch):
    """use_pallas only reaches the splat kernel at D<=128; above that the
    separable-matmul XLA path serves (Mosaic rejects the kernel's grid
    blocks at 256)."""
    from tpu_unsup_pc.ops.pallas import splat_kernel

    calls = []

    def boom(*a, **k):
        calls.append(a)
        raise AssertionError("splat kernel must not be reached at D>128")

    monkeypatch.setattr(splat_kernel, "splat_gauss_pallas", boom)
    pts = jnp.asarray(np.random.default_rng(0).uniform(
        10, 150, (32, 3)), jnp.float32)
    out = splat_mod.pointcloud_to_voxels(pts, 256, 1.0, use_pallas=True,
                                         chunk=32)
    assert out["occupancy"].shape == (256, 256, 256)
    assert not calls
    # ...and still dispatches to the kernel at a baseline grid size
    with pytest.raises(AssertionError, match="must not be reached"):
        splat_mod.pointcloud_to_voxels(pts[:, :] / 4.0, 64, 1.0,
                                       use_pallas=True, chunk=32)


@pytest.mark.parametrize("vox,autobands", [(64, False), (128, False),
                                           (192, True), (256, True)])
def test_render_sse_fused_autobands_large_grids(monkeypatch, vox,
                                                autobands):
    """pallas_band=-1 means AUTO: one-pass kernel at baseline grids,
    banded two-pass at >=192^3 (measured crossover — see
    render_kernel.render_drc_mse_auto docstring). The auto width derives
    from the radius (render_kernel.auto_band: span budget + planning
    margin — a fixed 56 silently fell back to dense on real clouds,
    the r5 band finding)."""
    from tpu_unsup_pc.ops.pallas import render_kernel
    from tpu_unsup_pc.utils.config import Config

    seen = {}

    def fake_auto(gz, gy, gx, sigma, masks, pair_shape, vox_size,
                  radius=13, chunk=512, bf16=False, band=None):
        seen["auto_band"] = band
        B, S, V, K = pair_shape
        return jnp.zeros((B * S * V * K,), jnp.float32)

    def fake_onepass(gz, gy, gx, sigma, masks, pair_shape, vox_size,
                     radius, chunk, bf16, sigma_grad):
        seen["onepass"] = True
        B, S, V, K = pair_shape
        return jnp.zeros((B * S * V * K, 1), jnp.float32)

    monkeypatch.setattr(render_kernel, "render_drc_mse_auto", fake_auto)
    monkeypatch.setattr(render_kernel, "render_drc_mse_onepass",
                        fake_onepass)
    cfg = Config(vox_size=vox, image_size=vox, pc_num_points=16,
                 point_chunk=16, use_pallas=True)
    B, S, V, K, N = 1, 1, 2, 1, 16
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-0.3, 0.3, (B, S, N, 3)), jnp.float32)
    q = rng.normal(size=(B, V, K, 4)).astype(np.float32)
    quats = jnp.asarray(q / np.linalg.norm(q, axis=-1, keepdims=True))
    dists = jnp.full((B, V, K), cfg.camera_distance, jnp.float32)
    sigma = jnp.ones((B, S), jnp.float32)
    masks = jnp.zeros((B, V, vox, vox), jnp.float32)
    out = project_mod.render_sse_fused(pts, quats, dists, sigma, masks, cfg)
    assert out.shape == (B, S, V, K)
    if not autobands:
        assert seen == {"onepass": True}
    else:
        radius = splat_mod.static_gauss_radius(
            max(cfg.sigma_start, cfg.sigma_end))
        assert seen == {"auto_band": render_kernel.auto_band(radius)}
        # the derived width must leave the measured realistic span budget
        assert (seen["auto_band"] - 2 * (radius + 2)
                >= render_kernel.AUTO_SPAN_BUDGET)


def test_synthetic_render_chunk_scales_with_grid():
    """The per-jit render chunk shrinks with grid volume (32 models of
    64^3 fit; 32 of 256^3 OOM a 16GB chip). Pure arithmetic check of the
    formula used in data/synthetic.py."""
    f = lambda d, rc=32: max(1, min(rc, rc * 128 ** 3 // d ** 3))
    assert f(32) == 32 and f(64) == 32 and f(128) == 32
    assert f(192) == 9
    assert f(256) == 4
