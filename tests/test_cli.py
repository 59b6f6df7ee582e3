"""Run-script tests (SURVEY.md L5): train -> resume -> predict ->
eval_chamfer round trip on the tiny synthetic preset, exercising the real
CLI entry points in-process."""

import json
import os

import numpy as np
import pytest

from tpu_unsup_pc import eval_chamfer, predict, train


@pytest.mark.slow
def test_train_predict_eval_pipeline(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    ckpt = str(tmp_path / "ckpt")
    logs = str(tmp_path / "logs")

    # train 30 steps
    train.main(["--preset", "tiny", "--steps", "30", "--ckpt-dir", ckpt,
                "--log-dir", logs, "--num-models", "8"])
    assert os.path.exists(os.path.join(logs, "metrics.jsonl"))
    with open(os.path.join(logs, "metrics.jsonl")) as f:
        recs = [json.loads(line) for line in f]
    assert recs[-1]["step"] == 30
    assert np.isfinite(recs[-1]["loss"])
    assert recs[-1]["points_views_per_sec_per_chip"] > 0

    # resume for 10 more steps (restores step + anneal position)
    train.main(["--preset", "tiny", "--steps", "40", "--ckpt-dir", ckpt,
                "--log-dir", logs, "--num-models", "8"])
    with open(os.path.join(logs, "metrics.jsonl")) as f:
        recs = [json.loads(line) for line in f]
    assert recs[-1]["step"] == 40

    # predict + eval — into a not-yet-existing directory (predict must
    # create it; a missing makedirs once cost an hour-long TPU pose dump)
    out = str(tmp_path / "new_run_dir" / "preds.npz")
    predict.main(["--preset", "tiny", "--ckpt-dir", ckpt, "--out", out,
                  "--num-models", "6"])
    with np.load(out) as z:
        assert z["pred_points"].shape[1:] == (256, 3)
        assert "gt_points" in z
    stats = eval_chamfer.main(["--pred", out])
    assert np.isfinite(stats["chamfer_l1_mean"])
    assert stats["num_models"] == 6


def test_eval_alignment_recovers_rotation(rng):
    """A rotated copy of a cloud must align back to ~zero chamfer."""
    from tpu_unsup_pc.eval_chamfer import evaluate
    from tpu_unsup_pc.ops.quaternion import quat_from_euler, quat_rotate
    import jax.numpy as jnp

    gt = rng.uniform(-0.4, 0.4, size=(300, 3)).astype(np.float32)
    q = quat_from_euler(1.18, 0.0)  # near a grid point of the search
    pred = np.asarray(quat_rotate(q, jnp.asarray(gt)))
    unaligned = evaluate(pred[None], gt[None], align=False)
    aligned = evaluate(pred[None], gt[None], align=True)
    assert aligned["chamfer_l1_mean"] < 0.3 * unaligned["chamfer_l1_mean"]


@pytest.mark.slow
def test_train_warm_start_from_npz(tmp_path, monkeypatch):
    """--init-params-npz: params load from the npz export, optimizer
    state and step counter are fresh, training proceeds (the phase-4
    fine-tune entry path, docs/pose_training.md)."""
    monkeypatch.chdir(tmp_path)
    ckpt_a = str(tmp_path / "a")
    train.main(["--preset", "tiny", "--steps", "10", "--ckpt-dir", ckpt_a,
                "--log-dir", str(tmp_path / "la"), "--num-models", "8",
                "--set", "ckpt_every=10"])
    from tpu_unsup_pc.configs import presets
    from tpu_unsup_pc.utils.checkpoint import (CheckpointManager,
                                               save_params_npz)
    cfg = presets.get("tiny").replace(ckpt_dir=ckpt_a)
    state, step = CheckpointManager(ckpt_a).restore_latest(cfg)
    assert step == 10
    npz = str(tmp_path / "warm.npz")
    save_params_npz(state, npz)

    # warm start into a FRESH ckpt dir; step counter restarts at 0
    ckpt_b = str(tmp_path / "b")
    logs_b = str(tmp_path / "lb")
    train.main(["--preset", "tiny", "--steps", "5", "--ckpt-dir", ckpt_b,
                "--log-dir", logs_b, "--num-models", "8",
                "--init-params-npz", npz])
    with open(os.path.join(logs_b, "metrics.jsonl")) as f:
        recs = [json.loads(line) for line in f]
    assert recs[0]["step"] <= 5 and recs[-1]["step"] == 5
    assert np.isfinite(recs[-1]["loss"])

    # structural mismatch (different preset) must fail loudly
    from tpu_unsup_pc.utils.checkpoint import load_params_npz
    with pytest.raises(ValueError, match="do not match"):
        load_params_npz(presets.get("c3_synth"), npz)


@pytest.mark.slow
def test_best_tracker_survives_resume(tmp_path, monkeypatch):
    """A resumed run re-seeds the best-checkpoint tracker from best.json,
    so the first post-resume eval cannot clobber best_params.npz with a
    worse state (regression: the tracker was in-memory only, and a crash
    + resume silently overwrote the genuinely-best export)."""
    monkeypatch.chdir(tmp_path)
    ckpt = str(tmp_path / "ckpt")
    logs = str(tmp_path / "logs")
    common = ["--preset", "tiny", "--num-models", "8",
              "--ckpt-dir", ckpt, "--log-dir", logs,
              "--eval-every", "5", "--best-ckpt-metric", "val_loss",
              "--set", "ckpt_every=10"]
    train.main(common + ["--steps", "10"])
    bj = os.path.join(ckpt, "best.json")
    with open(bj) as f:
        rec = json.load(f)
    assert rec["metric"] == "val_loss" and np.isfinite(rec["value"])

    # simulate a better historical best than anything the resumed run
    # will achieve; the resumed evals (val_loss >> 1e-12) must NOT win
    rec["value"] = 1e-12
    with open(bj, "w") as f:
        json.dump(rec, f)
    sentinel = b"sentinel-best-params"
    with open(os.path.join(ckpt, "best_params.npz"), "wb") as f:
        f.write(sentinel)

    train.main(common + ["--steps", "20"])
    with open(bj) as f:
        rec2 = json.load(f)
    assert rec2["value"] == 1e-12, "resume clobbered the restored best"
    with open(os.path.join(ckpt, "best_params.npz"), "rb") as f:
        assert f.read() == sentinel


@pytest.mark.slow
def test_params_npz_export_predict(tmp_path, monkeypatch):
    """tools/export_params.py round trip: orbax ckpt -> npz -> predict
    --params-npz produces the same clouds as the orbax path."""
    import subprocess
    import sys

    monkeypatch.chdir(tmp_path)
    ckpt = str(tmp_path / "ckpt")
    train.main(["--preset", "tiny", "--steps", "10", "--ckpt-dir", ckpt,
                "--log-dir", str(tmp_path / "logs"), "--num-models", "8",
                "--set", "ckpt_every=10"])
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    npz = str(tmp_path / "params.npz")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=repo)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "export_params.py"),
         "--preset", "tiny", "--ckpt-dir", ckpt, "--out", npz],
        capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr[-800:]

    out_ckpt = str(tmp_path / "p1.npz")
    out_npz = str(tmp_path / "p2.npz")
    predict.main(["--preset", "tiny", "--ckpt-dir", ckpt, "--out",
                  out_ckpt, "--num-models", "4"])
    predict.main(["--preset", "tiny", "--params-npz", npz, "--out",
                  out_npz, "--num-models", "4"])
    with np.load(out_ckpt) as a, np.load(out_npz) as b:
        np.testing.assert_allclose(a["pred_points"], b["pred_points"],
                                   atol=1e-6)


@pytest.mark.slow
def test_tub_pose_best_ckpt(tmp_path, monkeypatch):
    """Best-checkpoint selection on an ON-DISK dataset: a c3-style run on
    the native TUB loader exercises --pose-eval-every + --best-ckpt-metric
    through the eval_arrays accessor (VERDICT r3 weak #4: the gate was
    hasattr(dataset, 'images'), a silent no-op for tub/shapenet)."""
    monkeypatch.chdir(tmp_path)
    from tpu_unsup_pc.configs import presets
    from tpu_unsup_pc.data import SyntheticShapes
    from tpu_unsup_pc.data.native_loader import write_tub_dataset

    cfg = presets.get("tiny").replace(predict_pose=True,
                                      synth_shapes="asym")
    for split, n in (("train", 8), ("val", 4)):
        ds = SyntheticShapes(cfg, split=split, num_models=n)
        write_tub_dataset(str(tmp_path / f"{split}.tub"), ds.images,
                          ds.masks, ds.azimuth, ds.elevation)
    ckpt = str(tmp_path / "ckpt")
    train.main(["--preset", "tiny", "--dataset", "tub",
                "--data-dir", str(tmp_path), "--steps", "6",
                "--ckpt-dir", ckpt, "--log-dir", str(tmp_path / "logs"),
                "--set", "predict_pose=True", "--set", "synth_shapes=asym",
                "--pose-eval-every", "3", "--pose-eval-split", "val",
                "--pose-eval-models", "4",
                "--best-ckpt-metric", "pose_acc_30deg"])
    assert os.path.exists(os.path.join(ckpt, "best_params.npz"))
    with open(os.path.join(ckpt, "best.json")) as f:
        assert json.load(f)["metric"] == "pose_acc_30deg"
    # requesting the metric without a runnable pose eval fails LOUDLY
    with pytest.raises(SystemExit, match="pose_acc_30deg"):
        train.main(["--preset", "tiny", "--steps", "2",
                    "--ckpt-dir", str(tmp_path / "c2"),
                    "--log-dir", str(tmp_path / "l2"),
                    "--num-models", "4",
                    "--best-ckpt-metric", "pose_acc_30deg"])


def test_apply_overrides_literals():
    """--set parses JSON values, and Python-style True/False/None too (a
    truthy-"False" string silently enabled flags before r3)."""
    from tpu_unsup_pc.configs import presets

    cfg = presets.get("tiny")
    out = presets.apply_overrides(cfg, [
        "use_pallas=False", "predict_scale=true", "sigma_end=0.5",
        "enc_channels=[4, 8]", "dataset=synthetic"])
    assert out.use_pallas is False
    assert out.predict_scale is True
    assert out.sigma_end == 0.5
    assert out.enc_channels == (4, 8)     # list -> tuple (hashable)
    assert out.dataset == "synthetic"
