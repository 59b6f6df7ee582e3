"""Export a run's latest checkpoint params to a standalone .npz (durable,
committable artifact — the orbax checkpoint dirs under runs/*/ckpt are
gitignored and round-scoped scratch like /tmp does not survive sessions).

    python tools/export_params.py --preset c3_synth --ckpt-dir runs/c3_long/ckpt \
        --out runs/c3_long/final_params.npz [--f16]

Reload with tools/load_params (flatten-inverse) or predict.py --params-npz.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def flatten_params(params, prefix=""):
    from tpu_unsup_pc.utils.checkpoint import flatten_params as _fp
    return _fp(params, prefix)


def unflatten_params(flat):
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--preset", required=True)
    p.add_argument("--ckpt-dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--f16", action="store_true",
                   help="store float16 (halves size; ~1e-3 relative noise)")
    p.add_argument("--step", type=int, default=None,
                   help="export this checkpoint step (default: latest)")
    p.add_argument("--set", action="append", dest="overrides", default=[],
                   metavar="KEY=VALUE",
                   help="Config overrides (same as train.py --set); must "
                        "match the run's param-structure-changing fields")
    args = p.parse_args(argv)

    from tpu_unsup_pc.configs import presets
    from tpu_unsup_pc.utils.checkpoint import CheckpointManager

    cfg = presets.apply_overrides(presets.get(args.preset), args.overrides)
    cfg = cfg.replace(ckpt_dir=args.ckpt_dir)
    mgr = CheckpointManager(args.ckpt_dir)
    state, step = mgr.restore_latest(cfg, step=args.step)
    if state is None:
        raise SystemExit(f"no checkpoint in {args.ckpt_dir}")
    flat = flatten_params(state.params)
    if args.f16:
        flat = {k: v.astype(np.float16) if v.dtype == np.float32 else v
                for k, v in flat.items()}
    np.savez_compressed(args.out, __step__=np.asarray(step), **flat)
    size = os.path.getsize(args.out) / 2 ** 20
    print(f"wrote {args.out}: step={step}, {len(flat)} arrays, "
          f"{size:.1f} MiB")


if __name__ == "__main__":
    main()
