"""One-command config-3 pose reproduction (VERDICT r3 next #4): the full
RGB-evidence recipe — seed lottery -> auto-select -> phase-2 refinement ->
phase-3 sharp-sigma fine-tune [-> phase-4 more-data] -> held-out test eval
— as a single driver with no manual seed picks.

    python tools/pose_recipe.py --out-root runs/recipe_r4

Protocol constants come from docs/pose_training.md ("RGB-evidence pose
training"); the measured budgets at c3 throughput (~25 steps/s on v5e-1):
probes 6 x 3k steps ~ 15 min, phase 2 15k steps ~ 15 min, phase 3 12k
steps ~ 12 min, plus in-train pose evals (coarse cadence — each val eval
costs tens of seconds through the TPU tunnel). End-to-end ~ 1-1.5 h for
the 3-phase recipe that lands 0.848 test Acc@30 with 256 models
(BASELINE.md); --phase4-models 1024 adds the 24k-step data fine-tune
(0.858).

Training is bit-deterministic per (config, seed, data path), so a re-run
reproduces the committed trajectories exactly; the lottery is the one
stochastic gate.

MEASURED END TO END (r4): `--phase4-models 1024 --sharp` ran through
all six stages with no manual intervention (phases 1b-3 re-trained
from the cached probes after the earlier session cleaned the ckpt
dirs) and landed held-out test **9.88deg / 0.8984 Acc@30**
(runs/pose_recipe/{summary.json,pose_eval_test.json}) — above even the
committed hand-driven lineage (c3rgb_sharp 9.99/0.880). Wall clock:
~1.7 h for phases 1b-4 + sharp + eval on v5e-1 (the chip was shared
with other jobs for part of it; treat as an upper bound). The phase-3
and sharp endpoints (best_params.npz) are now committed, so future
extensions warm-start instead of re-training. MEASURED (runs/pose_recipe, round 4): neither probe
Acc@30 nor phase-2 val rank basin quality — seed 0 probed 0.428 and
held the best phase-2 val (0.7125) yet plateaued at phase-3 val 0.716 /
test 0.65, while a 0.692 phase-2 basin reached 0.834/0.848. Entrenched
flips only become visible once sigma sharpens. The driver therefore
probes the WHOLE initial pool, carries the top --carry takeoff seeds
through phases 2 AND 3, and selects on phase-3 val best — the first
point where basin quality is actually observable. Every stage is
cached on disk, so re-runs and extensions only pay for new work.

Carried seeds run their phases to FULL depth — no val-trend early
stopping. Measured offline (r5, docs/pose_training.md "Recipe
wall-clock"): the committed winner's own val trajectory swings −0.14
mid-phase-4 before finishing at its global best, so any drop margin
tight enough to save time also drops winners; and val-best lands at
the final step in 2 of 4 stages, so there is no wasted tail to trim.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

# Probe/phase-1 constants: NOTE the student weight stays at the preset
# default w=20 — the committed winning lottery ran at w=20 (verified
# from runs/c3rgb_seed5/train.out loss decomposition: step-1 total
# 10.26 = teacher 0.87 + 20 x student 0.47), and a w=2 lottery explores
# DIFFERENT, measurably worse basins (runs/pose_recipe seeds 0/2:
# phase-3 val 0.70-0.72 vs 0.834). w=2 enters at phase 2 (step 8k).
LOTTERY_SETS = [
    "predict_rgb=True",
    "pose_head_init_scale=1.0", "sigma_end=1.4",
    "sigma_anneal_steps=20000",
]


def _read_metric(log_dir, key, at_step=None):
    path = os.path.join(log_dir, "metrics.jsonl")
    best = None
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if key in rec and (at_step is None or rec["step"] == at_step):
                best = rec[key]
    return best


def _read_best(ckpt_dir):
    """Val metric of the best-checkpoint tracker (train.py best.json)."""
    with open(os.path.join(ckpt_dir, "best.json")) as f:
        return json.load(f)["value"]


def _train(args_list):
    from tpu_unsup_pc import train
    print("+ train " + " ".join(args_list), flush=True)
    train.main(args_list)


def probe_seed(root, seed, probe_steps, num_models):
    d = os.path.join(root, f"seed{seed}")
    log_dir = os.path.join(d, "logs")
    done = os.path.join(d, "probe.json")
    if os.path.exists(done):                      # resumable driver
        with open(done) as f:
            return json.load(f)["acc30"]
    _train(["--preset", "c3_synth", "--use-pallas",
            "--num-models", str(num_models),
            "--steps", str(probe_steps),
            "--pose-eval-every", "2500", "--ckpt-keep", "10",
            "--ckpt-dir", os.path.join(d, "ckpt"), "--log-dir", log_dir]
           + [x for s in LOTTERY_SETS + [f"seed={seed}"]
              for x in ("--set", s)])
    acc = _read_metric(log_dir, "pose_acc_30deg")
    with open(done, "w") as f:
        json.dump({"seed": seed, "acc30": acc}, f)
    return acc


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out-root", default="runs/pose_recipe")
    p.add_argument("--num-models", type=int, default=256)
    p.add_argument("--probe-steps", type=int, default=3000)
    p.add_argument("--min-takeoff", type=float, default=0.25,
                   help="probe Acc@30 that counts as lottery takeoff")
    p.add_argument("--initial-seeds", type=int, default=6)
    p.add_argument("--max-seeds", type=int, default=12,
                   help="auto-extend the pool up to this many seeds when "
                        "no probe clears --min-takeoff")
    p.add_argument("--carry", type=int, default=2,
                   help="how many top-probe seeds get a full phase 2 "
                        "(probe rank does not predict basin quality "
                        "above the takeoff threshold — measured r4)")
    p.add_argument("--phase2-steps", type=int, default=18000)
    p.add_argument("--phase3-steps", type=int, default=12000)
    p.add_argument("--phase4-models", type=int, default=0,
                   help="0 = stop after phase 3; 1024 reproduces the "
                        "phase-4 data fine-tune (docs/pose_training.md)")
    p.add_argument("--phase4-steps", type=int, default=24000)
    p.add_argument("--sharp", action="store_true",
                   help="finish with the sigma->0.6 + student-weight-"
                        "decay anneal (tools/sharp_anneal.sh — the "
                        "shipped-headline final stage)")
    p.add_argument("--sharp-steps", type=int, default=14000)
    p.add_argument("--test-models", type=int, default=64)
    args = p.parse_args(argv)
    root = args.out_root
    os.makedirs(root, exist_ok=True)

    # ---- phase 1: lottery — probe the whole pool ----
    probes = {}
    for seed in range(args.initial_seeds):
        probes[seed] = probe_seed(root, seed, args.probe_steps,
                                  args.num_models)
        print(f"[lottery] seed {seed}: probe acc30={probes[seed]}",
              flush=True)
    while (max((v for v in probes.values() if v is not None), default=0.0)
           < args.min_takeoff and len(probes) < args.max_seeds):
        seed = len(probes)
        probes[seed] = probe_seed(root, seed, args.probe_steps,
                                  args.num_models)
        print(f"[lottery] seed {seed}: probe acc30={probes[seed]} "
              "(extended pool)", flush=True)
    took_off = sorted(
        (s for s, v in probes.items()
         if v is not None and v >= args.min_takeoff),
        key=lambda s: -probes[s])
    if not took_off:
        raise SystemExit(
            f"no probe cleared min-takeoff={args.min_takeoff} in "
            f"{len(probes)} seeds: {probes}. Extend --max-seeds "
            "(P(takeoff)~1/6 per seed at rgb_loss_weight=1.0).")
    carry = took_off[:args.carry]
    print(f"[lottery] takeoffs {took_off} -> carrying {carry} "
          "through phase 2", flush=True)

    # ---- phase 1b + 2 per carried seed (the committed two-stage
    # structure, docs/pose_training.md): w=20 symmetry breaking to step
    # 8000, then w=2 refinement to 18k with val best-ckpt selection ----
    p2_val = {}
    for seed in carry:
        wdir = os.path.join(root, f"seed{seed}")
        _train(["--preset", "c3_synth", "--use-pallas",
                "--num-models", str(args.num_models),
                "--steps", "8000",
                "--pose-eval-every", "2500", "--ckpt-keep", "10",
                "--ckpt-dir", os.path.join(wdir, "ckpt"),
                "--log-dir", os.path.join(wdir, "logs")]
               + [x for s in LOTTERY_SETS + [f"seed={seed}"]
                  for x in ("--set", s)])
        _train(["--preset", "c3_synth", "--use-pallas",
                "--num-models", str(args.num_models),
                "--steps", str(args.phase2_steps),
                "--pose-eval-every", "2000", "--pose-eval-split", "val",
                "--best-ckpt-metric", "pose_acc_30deg",
                "--ckpt-keep", "10",
                "--ckpt-dir", os.path.join(wdir, "ckpt"),
                "--log-dir", os.path.join(wdir, "logs")]
               + [x for s in LOTTERY_SETS
                  + ["pose_student_weight=2", f"seed={seed}"]
                  for x in ("--set", s)])
        p2_val[seed] = _read_best(os.path.join(wdir, "ckpt"))
        print(f"[phase2] seed {seed}: val best acc30={p2_val[seed]}",
              flush=True)

    # ---- phase 3: sharp-sigma fine-tune for EVERY carried seed ----
    # Selection happens HERE, not at phase 2: basin quality (entrenched
    # flips vs clean takeoff) is only observable once sigma sharpens —
    # measured r4: seed 0 beat the eventual winner on phase-2 val
    # (0.7125 vs 0.692) yet plateaued at phase-3 val 0.716 / test 0.65,
    # while a 0.692 phase-2 basin reached 0.834/0.848.
    p3_val = {}
    for seed in carry:
        p3 = os.path.join(root, f"phase3_s{seed}")
        _train(["--preset", "c3_synth", "--use-pallas",
                "--num-models", str(args.num_models),
                "--steps", str(args.phase3_steps),
                "--init-params-npz", os.path.join(
                    root, f"seed{seed}", "ckpt", "best_params.npz"),
                "--pose-eval-every", "2000", "--pose-eval-split", "val",
                "--best-ckpt-metric", "pose_acc_30deg",
                "--ckpt-dir", os.path.join(p3, "ckpt"),
                "--log-dir", os.path.join(p3, "logs")]
               + [x for s in ["predict_rgb=True",
                              "pose_student_weight=2",
                              "pose_head_init_scale=1.0",
                              "sigma_start=1.63", "sigma_end=1.0",
                              "sigma_anneal_steps=8000",
                              "learning_rate=5e-5", f"seed={seed}"]
                  for x in ("--set", s)])
        p3_val[seed] = _read_best(os.path.join(p3, "ckpt"))
        print(f"[phase3] seed {seed}: val best acc30={p3_val[seed]}",
              flush=True)
    winner = max(p3_val, key=p3_val.get)
    print(f"[phase3] winner: seed {winner} (val {p3_val[winner]})",
          flush=True)
    final = os.path.join(root, f"phase3_s{winner}", "ckpt",
                         "best_params.npz")

    # ---- optional phase 4: more-data fine-tune ----
    if args.phase4_models:
        p4 = os.path.join(root, f"phase4_s{winner}")
        _train(["--preset", "c3_synth", "--use-pallas",
                "--num-models", str(args.phase4_models),
                "--steps", str(args.phase4_steps),
                "--init-params-npz", final,
                "--pose-eval-every", "2000", "--pose-eval-split", "val",
                "--best-ckpt-metric", "pose_acc_30deg",
                "--ckpt-dir", os.path.join(p4, "ckpt"),
                "--log-dir", os.path.join(p4, "logs")]
               + [x for s in ["predict_rgb=True", "pose_student_weight=2",
                              "pose_head_init_scale=1.0",
                              "sigma_start=1.0", "sigma_end=1.0",
                              "sigma_anneal_steps=8000",
                              "learning_rate=5e-5", f"seed={winner}"]
                  for x in ("--set", s)])
        final = os.path.join(p4, "ckpt", "best_params.npz")

    # ---- optional sharp anneal: sigma -> 0.6 with w 2 -> 0.2 ----
    if args.sharp:
        ps = os.path.join(root, f"sharp_s{winner}")
        _train(["--preset", "c3_synth", "--use-pallas",
                "--num-models", str(args.phase4_models or
                                    args.num_models),
                "--steps", str(args.sharp_steps),
                "--init-params-npz", final,
                "--pose-eval-every", "2000", "--pose-eval-split", "val",
                "--best-ckpt-metric", "pose_acc_30deg",
                "--ckpt-dir", os.path.join(ps, "ckpt"),
                "--log-dir", os.path.join(ps, "logs")]
               + [x for s in ["predict_rgb=True", "pose_student_weight=2",
                              "pose_head_init_scale=1.0",
                              "sigma_schedule=exp", "sigma_start=1.0",
                              "sigma_end=0.6", "sigma_anneal_steps=10000",
                              "pose_student_weight_end=0.2",
                              "pose_student_decay_steps=10000",
                              "learning_rate=5e-5", f"seed={winner}"]
                  for x in ("--set", s)])
        final = os.path.join(ps, "ckpt", "best_params.npz")

    # ---- held-out test eval ----
    from tpu_unsup_pc import eval_pose, predict
    preds = os.path.join(root, "test_preds.npz")
    predict.main(["--preset", "c3_synth", "--params-npz", final,
                  "--all-views", "--num-models", str(args.test_models),
                  "--split", "test", "--batch-size", "16",
                  "--set", "use_pallas=True", "--set", "predict_rgb=True",
                  "--poses-only", "--out", preds])
    stats = eval_pose.main(["--pred", preds,
                            "--out", os.path.join(root,
                                                  "pose_eval_test.json")])
    summary = {"probes": probes, "carried": carry, "phase2_val": p2_val,
               "phase3_val": p3_val, "winner_seed": winner,
               "final_params": final, "test": stats}
    with open(os.path.join(root, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))
    return summary


if __name__ == "__main__":
    main()
