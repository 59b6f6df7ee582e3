"""Named experiment presets — one per BASELINE.json config line
(SURVEY.md §5 "Config / flag system"). `c*_synth` variants swap the dataset
for the procedural one so every preset is runnable with no data on disk."""

from __future__ import annotations

from tpu_unsup_pc.utils.config import Config

_SHAPENET_13 = (
    "02691156", "02828884", "02933112", "02958343", "03001627", "03211117",
    "03636649", "03691459", "04090263", "04256520", "04379243", "04401088",
    "04530566")

_PRESETS = {
    # BASELINE config 1: chairs, 64px, 2k pts, GT pose (CPU-runnable slice)
    "c1_chairs_gt": Config(
        categories=("03001627",), dataset="shapenet", image_size=64,
        vox_size=64, pc_num_points=2000, predict_pose=False, batch_size=8),
    # BASELINE config 2: airplanes+cars, 64px, 8k pts, known pose
    "c2_planes_cars_8k": Config(
        categories=("02691156", "02958343"), dataset="shapenet",
        image_size=64, vox_size=64, pc_num_points=8000, predict_pose=False,
        batch_size=8),
    # BASELINE config 3: unknown pose w/ candidate ensemble, chairs.
    # synth_shapes="asym": the classic synthetic shapes are 180deg-
    # rotationally symmetric, which makes pose unidentifiable from
    # silhouettes — the _synth twin must train on identifiable shapes
    # (ShapeNet chairs are; the knob is a no-op for the shapenet dataset).
    "c3_chairs_pose": Config(
        categories=("03001627",), dataset="shapenet", image_size=64,
        vox_size=64, pc_num_points=2000, predict_pose=True,
        pose_candidates=4, batch_size=8, source_views=2,
        synth_shapes="asym"),
    # BASELINE config 4: 128px + sigma annealing, all 13 categories
    "c4_allcat_128": Config(
        categories=_SHAPENET_13, dataset="shapenet", image_size=128,
        vox_size=128, pc_num_points=8000, predict_pose=False,
        sigma_start=3.0, sigma_end=0.5, sigma_anneal_steps=60000,
        batch_size=4, source_views=1),
    # Beyond-baseline scale demo: 256^3 grid / 256px — the depth-banded
    # projector's regime. Measured (tools/band_crossover_bench.py, v5e-1):
    # dense fwd+bwd 126.6ms vs banded 49.8ms (2.54x, sort tax included) at
    # 20 pairs x 8192 pts; the crossover vs the default dense kernel sits
    # between 128^3 (dense wins) and 192^3 (banded 1.84x). Encoder gets two
    # extra stride-2 stages so the conv stack still lands on a 4x4 map.
    #
    # The r5 collapse at this preset (all 8000 points at one spot,
    # chamfer 0.486 vs 0.227 random; runs/c4xl_collapse) was PRIMARILY a
    # dataset bug — the GT renderer produced near-empty masks at 256px
    # (data/synthetic._mass_scale has the mechanism and numbers) — but
    # the sigma protocol is kept world-equivalent anyway: sigma is in
    # CELL units, so 6.0 at 256^3 is c4's 3.0-at-128^3 coarse-to-fine
    # smoothing at 2x the resolution.
    #
    # band=112, MEASURED (r5): the all-or-nothing lax.cond needs EVERY
    # sorted 512-pt chunk's depth span <= band - 2*(radius+2); radius is
    # 25 at sigma 6.0 (margin 54). Realistic clouds under PERSPECTIVE
    # have fat span tails (nearest/farthest chunks): at 8k-point density
    # spans run ~9-27 cells typical but up to ~56 on spread clouds —
    # band 80's budget (26) sat ON the edge and real training silently
    # fell back to dense (observed 1.1M ppv/s = the dense rate, while
    # the collapsed run's dot-clouds fit the band and ran 1.8M). Band
    # 112's budget (58) covers the measured max with headroom; on
    # fitting clouds banded measures 2.1x dense at band 80 (42 vs 88ms
    # / 10 pairs) and 1.7x at band 112 (51ms) — robustness beats the
    # extra 20%.
    "c4xl_256grid": Config(
        categories=_SHAPENET_13, dataset="shapenet", image_size=256,
        vox_size=256, pc_num_points=8000, predict_pose=False,
        sigma_start=6.0, sigma_end=0.5, sigma_anneal_steps=60000,
        batch_size=2, source_views=1, pallas_band=112,
        enc_channels=(32, 64, 128, 256, 256, 256)),
    # BASELINE config 5: RGB appearance splatting, sharded over v5e-8
    "c5_rgb_sharded": Config(
        categories=("03001627",), dataset="shapenet", image_size=64,
        vox_size=64, pc_num_points=2000, predict_rgb=True,
        predict_pose=False, batch_size=16, mesh_shape=(8,)),
}

# synthetic-data variants (identical model/projector settings, no disk data)
for _name, _cfg in list(_PRESETS.items()):
    _PRESETS[_name.split("_")[0] + "_synth"] = _cfg.replace(
        dataset="synthetic")

# tiny config for CI / integration tests
_PRESETS["tiny"] = Config(
    dataset="synthetic", image_size=32, vox_size=32, pc_num_points=256,
    latent_dim=128, enc_channels=(8, 16, 32), fc_dims=(128,),
    num_views=3, batch_size=2, sigma_start=2.0, sigma_end=0.8,
    sigma_anneal_steps=100, point_chunk=64, learning_rate=3e-4,
    log_every=10, ckpt_every=100)


def get(name: str) -> Config:
    try:
        return _PRESETS[name].validate()
    except KeyError:
        raise KeyError(f"unknown preset {name!r}; "
                       f"available: {sorted(_PRESETS)}") from None


def names():
    return sorted(_PRESETS)


def apply_overrides(cfg: Config, overrides) -> Config:
    """Apply repeatable CLI `--set KEY=VALUE` overrides to a Config.
    Values parse as JSON; Python-style True/False/None are accepted too
    (an easy typo for the JSON literals that would otherwise fall through
    as truthy strings — "False" silently ENABLED the flag it looks like
    it disables); anything else stays a string. Lists become tuples so
    the frozen dataclass stays hashable."""
    import json

    over = {}
    _py = {"True": True, "False": False, "None": None}
    for kv in overrides:
        k, v = kv.split("=", 1)
        if v in _py:
            v = _py[v]
        else:
            try:
                v = json.loads(v)
            except ValueError:
                pass
        over[k] = tuple(v) if isinstance(v, list) else v
    return cfg.replace(**over).validate()
