#!/bin/bash
# Seed lottery for the c3+RGB unknown-pose run (docs/pose_training.md
# "RGB evidence" section): same protocol as pose_lottery.sh but with
# predict_rgb=True — per-point position-coded color (data/synthetic.py)
# enters the candidate-selection objective (models/losses.py pair loss =
# sil + rgb_loss_weight*rgb), so symmetry flips that silhouettes cannot
# distinguish become visibly wrong. Hypothesis: the teacher picks correct
# basins from the start and Acc@30's flip ceiling (~0.67) lifts.
set -u
cd "$(dirname "$0")/.."
STEPS_PROBE=3000
# RGB_W / PREFIX env overrides: the rgb_loss_weight=0.5 from-scratch
# experiment (docs/pose_training.md "shape caveat") re-runs the lottery
# at a lower color weight under runs/${PREFIX}$seed.
RGB_W=${RGB_W:-1.0}
PREFIX=${PREFIX:-c3rgb_seed}
COMMON=(--preset c3_synth --use-pallas --pose-eval-every 2500
        --ckpt-keep 10 --num-models 256
        --set predict_rgb=True --set rgb_loss_weight=$RGB_W
        --set sigma_end=1.4 --set sigma_anneal_steps=20000
        --set pose_head_init_scale=1.0)
SEEDS=${*:-"0 1 2 3 4 5"}
for seed in $SEEDS; do
  dir=runs/${PREFIX}$seed
  mkdir -p "$dir"
  echo "=== probing seed $seed ==="
  probe_log="$dir/probe_$(date +%s).out"
  JAX_COMPILATION_CACHE_DIR=$PWD/.jax_cache \
  python -m tpu_unsup_pc.train "${COMMON[@]}" --steps $STEPS_PROBE \
      --set seed=$seed --ckpt-dir "$dir/ckpt" --log-dir "$dir/logs" \
      > "$probe_log" 2>&1
  cat "$probe_log" >> "$dir/train.out"
  acc=$(grep -o 'pose_acc_30deg=[0-9.]*' "$probe_log" | tail -1 | cut -d= -f2)
  if [ -z "${acc:-}" ]; then
    echo "seed $seed: NO pose_acc_30deg line in $probe_log (probe crashed?)"
    tail -5 "$probe_log"
    continue
  fi
  echo "seed $seed: acc30=$acc"
done
echo "probe sweep done — inspect runs/${PREFIX}*/probe_*.out"
