"""Device mesh + sharding helpers (SURVEY.md §2.2/§2.3).

The reference is single-device; its only parallelism is batching. The
TPU-native scaling story is pure SPMD: a 1-D `Mesh(('data',))` over the v5e-8
slice, batches sharded on the leading axis, params replicated, and XLA
emitting the gradient all-reduce over ICI from the sharding annotations
alone — there is no hand-written communication layer anywhere (SURVEY §2.3).

Multi-host entry (`jax.distributed.initialize`) is guarded so single-process
runs (laptops, CI, this sandbox) behave identically [SURVEY §2.3]."""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu_unsup_pc.utils.config import Config


def maybe_init_distributed() -> None:
    """Call jax.distributed.initialize() only in a true multi-process
    launch (coordinator env present); no-op locally. Must run before any
    backend use — so the guard checks ONLY environment variables (calling
    jax.process_count() here would itself initialize the backend and make
    initialize() unusable).

    Rendezvous config comes from JAX_COORDINATOR_ADDRESS +
    JAX_NUM_PROCESSES + JAX_PROCESS_ID when all are set (the manual
    launch shape, e.g. two hosts of a multi-host v5e-8 or the 2-process
    CPU test in tests/test_distributed.py); with only the address set,
    initialize() falls back to jax's cluster auto-detection."""
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return
    kw = {}
    n, pid = (os.environ.get("JAX_NUM_PROCESSES"),
              os.environ.get("JAX_PROCESS_ID"))
    if n is not None and pid is not None:
        kw = dict(coordinator_address=addr, num_processes=int(n),
                  process_id=int(pid))
    try:
        jax.distributed.initialize(**kw)
    except RuntimeError as e:  # already initialized / backend already up
        print(f"warning: jax.distributed.initialize skipped: {e}")


def make_mesh(cfg: Config | None = None,
              devices: list | None = None) -> Mesh:
    """1-D data mesh over the requested (or all) devices."""
    devices = devices if devices is not None else jax.devices()
    if cfg is not None:
        want = int(np.prod(cfg.mesh_shape))
        if want > len(devices):
            raise ValueError(
                f"cfg.mesh_shape={cfg.mesh_shape} needs {want} devices, "
                f"have {len(devices)}")
        devices = devices[:want]
    axis_names = cfg.mesh_axis_names if cfg is not None else ("data",)
    shape = cfg.mesh_shape if cfg is not None else (len(devices),)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch onto the mesh, split along the batch axis. The
    single host->device transfer of the train loop (SURVEY §3.1)."""
    s = batch_sharding(mesh)
    return {k: jax.device_put(v, s) for k, v in batch.items()}
