"""Fast diagnostic harness for the unknown-pose (config 3) training axis.

Trains c3_synth (or overridden) for a few thousand steps and periodically
evaluates, in-process, the signals that matter for the pose ensemble:

- train sil loss (does even teacher-selected reconstruction learn?)
- relative-pose error of the STUDENT head (test-time prediction)
- relative-pose error of each CANDIDATE head k (is any head learning pose?)
- best single head (lower bound on what selection could deliver)

Prints one JSONL line per eval so runs are easy to diff/grep. This is a
diagnostic tool, not a training entry point — long runs go through
`python -m tpu_unsup_pc.train --preset c3_synth`.

    python tools/pose_probe.py --steps 3000 --eval-every 500 \
        --set learning_rate=3e-5 --set pose_candidates=8 --tag lr3e-5_k8
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from tpu_unsup_pc import training
from tpu_unsup_pc.configs import presets
from tpu_unsup_pc.data.synthetic import SyntheticShapes


def parse_overrides(pairs):
    out = {}
    for p in pairs or ():
        k, v = p.split("=", 1)
        try:
            v = json.loads(v)
        except json.JSONDecodeError:
            pass  # keep as string
        if isinstance(v, list):
            v = tuple(v)
        out[k] = v
    return out


def pose_metrics(cfg, state, images, az, el, chunk=16):
    """Relative-pose stats for the student and every candidate head."""
    from tpu_unsup_pc.eval_pose import evaluate_state_poses
    r = evaluate_state_poses(cfg, state, images, az, el, chunk=chunk)
    return {"student_med": r["pose_err_median_deg"],
            "student_acc30": r["pose_acc_30deg"],
            "head_med": r["head_med_deg"],
            "best_head_med": r["best_head_med_deg"]}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="c3_synth")
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--eval-every", type=int, default=500)
    p.add_argument("--num-models", type=int, default=256)
    p.add_argument("--eval-models", type=int, default=64)
    p.add_argument("--tag", default="probe")
    p.add_argument("--set", action="append", dest="overrides", default=[])
    args = p.parse_args(argv)

    over = parse_overrides(args.overrides)
    cfg = presets.get(args.preset).replace(**over).validate()
    print(json.dumps({"tag": args.tag, "overrides": over}), flush=True)

    ds = SyntheticShapes(cfg, num_models=args.num_models)
    ev = slice(0, args.eval_models)
    ev_img, ev_az, ev_el = ds.images[ev], ds.azimuth[ev], ds.elevation[ev]

    state = training.init_state(cfg)
    t0, losses = time.time(), []
    for step, batch in enumerate(ds.batches(args.steps)):
        state, m = training.train_step(cfg, state, batch)
        losses.append(m["loss_sil"])
        if (step + 1) % args.eval_every == 0 or step + 1 == args.steps:
            sil = float(np.mean([jax.device_get(x) for x in losses[-200:]]))
            rec = {"tag": args.tag, "step": step + 1,
                   "sil": round(sil, 4),
                   "sec": round(time.time() - t0, 1)}
            if cfg.predict_pose:
                pm = pose_metrics(cfg, state, ev_img, ev_az, ev_el)
                rec.update(student_med=round(pm["student_med"], 1),
                           student_acc30=round(pm["student_acc30"], 3),
                           best_head_med=round(pm["best_head_med"], 1),
                           head_med=pm["head_med"])
            print(json.dumps(rec), flush=True)
    return state


if __name__ == "__main__":
    main()
