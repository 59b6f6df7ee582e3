"""Checkpoint/resume tests (SURVEY.md §5): state round trip including the
sigma-schedule position (step)."""

import numpy as np

import jax

from tpu_unsup_pc import training
from tpu_unsup_pc.configs import presets
from tpu_unsup_pc.utils.checkpoint import CheckpointManager

CFG = presets.get("tiny")


def _batch(rng, cfg=CFG, B=2):
    V, H = cfg.num_views, cfg.image_size
    return {
        "image": rng.uniform(size=(B, V, H, H, 3)).astype(np.float32),
        "mask": (rng.uniform(size=(B, V, H, H)) > 0.5).astype(np.float32),
        "azimuth": rng.uniform(0, 6.28, size=(B, V)).astype(np.float32),
        "elevation": rng.uniform(-0.3, 0.9, size=(B, V)).astype(np.float32),
    }


def test_save_restore_roundtrip(tmp_path, rng):
    state = training.init_state(CFG)
    state, _ = training.train_step(CFG, state, _batch(rng))
    state, _ = training.train_step(CFG, state, _batch(rng))

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(state, CFG)
    mgr.wait()
    assert mgr.latest_step() == 2

    restored, step = mgr.restore_latest(CFG)
    assert step == 2 and int(restored.step) == 2
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored state is trainable (optimizer state intact)
    restored = restored.replace(tx=training.make_optimizer(CFG),
                                apply_fn=state.apply_fn)
    new_state, metrics = training.train_step(CFG, restored, _batch(rng))
    assert int(new_state.step) == 3
    assert np.isfinite(float(metrics["loss"]))
    mgr.close()


def test_restore_empty_dir(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "nothing"))
    state, step = mgr.restore_latest(CFG)
    assert state is None and step is None
    mgr.close()


def test_max_to_keep(tmp_path, rng):
    state = training.init_state(CFG)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    for _ in range(4):
        state, _ = training.train_step(CFG, state, _batch(rng))
        mgr.save(state, CFG)
    mgr.wait()
    assert mgr.latest_step() == 4
    mgr.close()


def test_partial_params_npz_load(tmp_path, rng):
    """partial=True fills params present in the npz and leaves a GROWN
    head (absent from the export) at fresh init; a shrunk model (npz has
    keys the model lacks) fails loudly."""
    import pytest

    from tpu_unsup_pc.utils.checkpoint import (flatten_params,
                                               load_params_npz,
                                               save_params_npz)

    cfg_pose = CFG.replace(predict_pose=True, pose_candidates=2)
    state = training.init_state(cfg_pose)
    path = str(tmp_path / "pose.npz")
    save_params_npz(state, path)

    cfg_grown = cfg_pose.replace(predict_translation=True)
    grown, step = load_params_npz(cfg_grown, path, partial=True)
    flat_src = flatten_params(state.params)
    flat_new = flatten_params(grown.params)
    extra = set(flat_new) - set(flat_src)
    assert extra and all("translation_head" in k for k in extra)
    for k, v in flat_src.items():
        np.testing.assert_array_equal(v, flat_new[k])

    # a fully-matching npz loads identically under both modes
    full_a, _ = load_params_npz(cfg_pose, path)
    full_b, _ = load_params_npz(cfg_pose, path, partial=True)
    for a, b in zip(jax.tree_util.tree_leaves(full_a.params),
                    jax.tree_util.tree_leaves(full_b.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # npz exported from the BIGGER model must not silently load into a
    # model that lacks those heads
    save_params_npz(training.init_state(cfg_grown), path)
    with pytest.raises(ValueError, match="lacks"):
        load_params_npz(cfg_pose, path, partial=True)
