#!/bin/bash
# Seed lottery for the c3 unknown-pose run (docs/pose_training.md): the
# ensemble's symmetry-breaking phase is stochastic — probe seeds with
# 3k-step runs, declare the first whose step-2500 eval shows takeoff
# (pose_acc_30deg above chance band), and train that seed onward.
set -u
cd "$(dirname "$0")/.."
STEPS_PROBE=3000 STEPS_FULL=${STEPS_FULL:-16000}
COMMON=(--preset c3_synth --use-pallas --pose-eval-every 2500
        --ckpt-keep 10 --num-models 256
        --set sigma_end=1.4 --set sigma_anneal_steps=20000
        --set pose_head_init_scale=1.0)
SEEDS=${*:-"3 4 5 6 7 8"}
for seed in $SEEDS; do
  dir=runs/c3_seed$seed
  mkdir -p "$dir"
  echo "=== probing seed $seed ==="
  # fresh log per probe: append-mode reuse of train.out let a stale
  # pose_acc_30deg line from a prior (possibly full-length) run in the
  # same dir falsely declare takeoff
  probe_log="$dir/probe_$(date +%s).out"
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
  if python -c "exit(0 if float('${acc:-0}') > 0.14 else 1)"; then
    echo "=== seed $seed TAKES OFF — training to $STEPS_FULL ==="
    python -m tpu_unsup_pc.train "${COMMON[@]}" --steps $STEPS_FULL \
        --set seed=$seed --ckpt-dir "$dir/ckpt" --log-dir "$dir/logs" \
        >> "$dir/train.out" 2>&1
    echo "=== done: seed $seed ==="
    grep -o 'pose_err[^ ]* pose_acc[^ ]*' "$dir/train.out" | tail -3
    exit 0
  fi
done
echo "no seed took off"; exit 1
