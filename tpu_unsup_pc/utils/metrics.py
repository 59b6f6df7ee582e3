"""Metrics / logging / observability (SURVEY.md §5): scalar metrics from
the jitted step -> JSONL (driver-readable) + optional TensorBoard, plus the
first-class throughput meter for the headline metric [BASELINE.json:2] and a
jax.profiler trace helper."""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Optional

import jax


class ThroughputMeter:
    """points*views/sec/chip over a sliding window of steps, measured with
    wall-clock between device-synchronized points."""

    def __init__(self, points_views_per_step: int, n_chips: int = 1):
        self.ppv = points_views_per_step
        self.n_chips = max(n_chips, 1)
        self._t0 = None
        self._steps = 0

    def start(self):
        self._t0 = time.perf_counter()
        self._steps = 0

    def step(self, n: int = 1):
        if self._t0 is None:
            self.start()
        self._steps += n

    def rate(self, sync_on=None) -> float:
        """points*views/sec/chip since start(); pass a device array to
        block on before reading the clock."""
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        dt = time.perf_counter() - (self._t0 or time.perf_counter())
        if dt <= 0 or self._steps == 0:
            return 0.0
        return self._steps * self.ppv / dt / self.n_chips


class MetricsLogger:
    """JSONL + console + optional TensorBoard scalar logging."""

    def __init__(self, log_dir: str, use_tensorboard: bool = False):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self._f = open(self.path, "a")
        self._tb = None
        if use_tensorboard:
            try:
                import tensorflow as tf
                self._tb = tf.summary.create_file_writer(
                    os.path.join(log_dir, "tb"))
            except Exception:
                self._tb = None

    def log(self, step: int, metrics: Dict, echo: bool = True):
        scalars = {k: float(v) for k, v in metrics.items()
                   if _is_scalar(v)}
        rec = {"step": int(step), **scalars}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            import tensorflow as tf
            with self._tb.as_default():
                for k, v in scalars.items():
                    tf.summary.scalar(k, v, step=step)
        if echo:
            parts = " ".join(f"{k}={v:.5g}" for k, v in scalars.items())
            print(f"[step {step}] {parts}", flush=True)

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()


def _is_scalar(v) -> bool:
    try:
        float(v)
        return True
    except Exception:
        return False


@contextlib.contextmanager
def maybe_profile(trace_dir: Optional[str]):
    """jax.profiler trace around a code region (xprof/tensorboard-viewable);
    no-op when trace_dir is None (SURVEY §5 "Tracing / profiling")."""
    if trace_dir:
        with jax.profiler.trace(trace_dir):
            yield
    else:
        yield
