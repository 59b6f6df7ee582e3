"""Aux-subsystem tests (SURVEY.md §5): schedules, config serialization,
metrics logging (JSONL + TensorBoard), throughput meter, profiler helper."""

import json
import os

import numpy as np

import jax.numpy as jnp

from tpu_unsup_pc.configs import presets
from tpu_unsup_pc.utils.config import Config
from tpu_unsup_pc.utils.metrics import (MetricsLogger, ThroughputMeter,
                                        maybe_profile)
from tpu_unsup_pc.utils.schedule import lr_at_step, sigma_at_step

CFG = presets.get("tiny")


def test_sigma_schedule_exp():
    cfg = Config(sigma_start=3.0, sigma_end=0.5, sigma_anneal_steps=100,
                 sigma_schedule="exp")
    np.testing.assert_allclose(float(sigma_at_step(cfg, 0)), 3.0, rtol=1e-5)
    np.testing.assert_allclose(float(sigma_at_step(cfg, 100)), 0.5,
                               rtol=1e-5)
    np.testing.assert_allclose(float(sigma_at_step(cfg, 10 ** 9)), 0.5,
                               rtol=1e-5)  # clamps past the anneal
    mid = float(sigma_at_step(cfg, 50))
    np.testing.assert_allclose(mid, np.sqrt(3.0 * 0.5), rtol=1e-4)  # geometric
    # monotone decreasing
    sig = [float(sigma_at_step(cfg, s)) for s in range(0, 101, 10)]
    assert all(a >= b for a, b in zip(sig, sig[1:]))


def test_sigma_schedule_linear_const():
    lin = Config(sigma_start=2.0, sigma_end=1.0, sigma_anneal_steps=10,
                 sigma_schedule="linear")
    np.testing.assert_allclose(float(sigma_at_step(lin, 5)), 1.5, rtol=1e-5)
    const = Config(sigma_end=0.7, sigma_schedule="const")
    np.testing.assert_allclose(float(sigma_at_step(const, 3)), 0.7,
                               rtol=1e-6)


def test_lr_schedule():
    cfg = Config(learning_rate=1e-3, lr_schedule="cosine", max_steps=100)
    np.testing.assert_allclose(float(lr_at_step(cfg, 0)), 1e-3, rtol=1e-6)
    assert float(lr_at_step(cfg, 100)) < 1e-8
    np.testing.assert_allclose(float(lr_at_step(Config(learning_rate=2e-4),
                                                50)), 2e-4, rtol=1e-6)


def test_config_json_roundtrip():
    cfg = CFG.replace(categories=("a", "b"), mesh_shape=(4,))
    back = Config.from_json(cfg.to_json())
    assert back == cfg


def test_metrics_logger_jsonl(tmp_path):
    logger = MetricsLogger(str(tmp_path))
    logger.log(5, {"loss": jnp.asarray(0.5), "ignored": "not-a-scalar"},
               echo=False)
    logger.log(10, {"loss": 0.25}, echo=False)
    logger.close()
    with open(tmp_path / "metrics.jsonl") as f:
        recs = [json.loads(line) for line in f]
    assert recs[0] == {"step": 5, "loss": 0.5}
    assert recs[1]["step"] == 10


def test_metrics_logger_tensorboard(tmp_path):
    logger = MetricsLogger(str(tmp_path), use_tensorboard=True)
    logger.log(1, {"loss": 1.0}, echo=False)
    logger.close()
    if logger._tb is not None:  # tf available in this image
        tb_files = os.listdir(tmp_path / "tb")
        assert any("tfevents" in f for f in tb_files)


def test_throughput_meter():
    meter = ThroughputMeter(points_views_per_step=1000, n_chips=2)
    meter.start()
    meter.step(10)
    rate = meter.rate(sync_on=jnp.zeros(1))
    assert rate > 0  # 10k points*views / elapsed / 2 chips


def test_maybe_profile(tmp_path):
    with maybe_profile(str(tmp_path / "trace")):
        jnp.ones(4).block_until_ready()
    assert os.path.isdir(tmp_path / "trace")
    with maybe_profile(None):   # no-op path
        pass
