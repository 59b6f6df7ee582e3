"""Checkpoint / resume (SURVEY.md §5): Orbax checkpointing of the full train
state. `state.step` is saved with the params/opt-state, so the sigma-anneal
position restores for free — the one stateful subtlety the reference's
save/load had to handle too. Async save keeps the device busy while the
host writes."""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import orbax.checkpoint as ocp

from tpu_unsup_pc import training
from tpu_unsup_pc.utils.config import Config


def _manager(ckpt_dir: str, max_to_keep: int = 3) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True,
            enable_async_checkpointing=True))


def flatten_params(params, prefix=""):
    """Nested param dict -> flat {'a/b/c': np.ndarray} (the durable .npz
    layout tools/export_params.py writes and predict.py --params-npz
    reads)."""
    import numpy as np
    out = {}
    for k, v in params.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(flatten_params(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def save_params_npz(state: training.TrainState, path: str) -> None:
    """Write params (+step) as a standalone compressed .npz — the durable,
    committable artifact format (orbax dirs are gitignored scratch)."""
    import numpy as np
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, __step__=np.asarray(int(state.step)),
                        **flatten_params(state.params))


def load_params_npz(cfg: Config, path: str, partial: bool = False,
                    ) -> Tuple[training.TrainState, int]:
    """TrainState with params from a save_params_npz/export_params.py
    export (f16 arrays are upcast; optimizer state is FRESH). Returns
    (state, exported_step). Used by predict.py --params-npz and
    train.py --init-params-npz (warm-start fine-tune).

    partial=True loads by flat path and leaves params absent from the npz
    at their fresh init — the warm-start path for fine-tuning a model
    that GREW a head (e.g. phase-N pose params + a new translation head).
    npz keys that don't exist in the model, or shape mismatches, still
    fail loudly; a fully-matching npz loads identically to partial=False."""
    import numpy as np
    import jax.numpy as jnp
    with np.load(path) as z:
        step = int(z["__step__"])
        flat = {k: z[k].astype(np.float32) if z[k].dtype == np.float16
                else z[k] for k in z.files if k != "__step__"}
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p_ in parts[:-1]:
            node = node.setdefault(p_, {})
        node[parts[-1]] = jnp.asarray(v)
    state = training.init_state(cfg)
    if partial:
        ref_flat = flatten_params(state.params)
        extra = sorted(set(flat) - set(ref_flat))
        if extra:
            raise ValueError(
                f"params in {path} have keys the config's model lacks: "
                f"{extra}")
        bad = [k for k in flat if flat[k].shape != ref_flat[k].shape]
        if bad:
            raise ValueError(
                f"shape mismatch loading {path}: "
                + ", ".join(f"{k} {flat[k].shape} vs "
                            f"{ref_flat[k].shape}" for k in sorted(bad)))
        missing = sorted(set(ref_flat) - set(flat))
        if missing:
            print(f"partial warm start: {len(missing)} fresh-init params "
                  f"not in {path}: {missing}")

        def merge(ref_node, got_node):
            if not isinstance(ref_node, dict):
                return ref_node if got_node is None else got_node
            return {k: merge(v, (got_node or {}).get(k))
                    for k, v in ref_node.items()}

        params = merge(state.params, tree)
        return state.replace(params=params, step=step), step
    ref = jax.tree_util.tree_structure(state.params)
    got = jax.tree_util.tree_structure(tree)
    if got != ref:
        # leaves are paired positionally below, so a structural mismatch
        # (renamed/missing/extra keys from a different preset's export)
        # would load silently into the wrong slots — fail loudly instead
        raise ValueError(
            f"params in {path} do not match the config's model: "
            f"npz tree {got} vs expected {ref}")
    params = jax.tree_util.tree_unflatten(
        ref, jax.tree_util.tree_leaves(tree))
    return state.replace(params=params, step=step), step


class CheckpointManager:
    """Thin wrapper: save(state), restore_latest(cfg) -> (state, step)."""

    def __init__(self, ckpt_dir: str, max_to_keep: int = 3):
        self.ckpt_dir = ckpt_dir
        self._mgr = _manager(ckpt_dir, max_to_keep)

    def save(self, state: training.TrainState, cfg: Config | None = None,
             force: bool = False) -> None:
        step = int(state.step)
        composite = {"state": ocp.args.StandardSave(state)}
        if cfg is not None:
            composite["config"] = ocp.args.JsonSave(cfg.to_json())
        self._mgr.save(step, args=ocp.args.Composite(**composite),
                       force=force)

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore_latest(self, cfg: Config, step: Optional[int] = None,
                       ) -> Tuple[Optional[training.TrainState],
                                  Optional[int]]:
        """Restore onto a freshly-initialized state template (shapes/dtypes
        from cfg). Returns (None, None) when no checkpoint exists —
        resume-by-default semantics for the train loop. Pass `step` to
        restore a specific retained checkpoint instead of the latest."""
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            return None, None
        template = jax.eval_shape(lambda: training.init_state(cfg))
        restored = self._mgr.restore(
            step, args=ocp.args.Composite(
                state=ocp.args.StandardRestore(template)))
        return restored["state"], step

    def close(self):
        self._mgr.close()
