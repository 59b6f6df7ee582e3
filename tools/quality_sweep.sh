#!/bin/bash
# Round-scoped quality sweep: re-establish the BASELINE.md synthetic
# anchors as DURABLE artifacts (runs/<name>/{train.out,logs,final_params
# .npz,eval.json}) — round-1 quality checkpoints lived in /tmp and died
# with the session. Serialized: the TPU host has one CPU core (CLAUDE.md).
#
#   bash tools/quality_sweep.sh [c1|c4|c5 ...]   # default: all three
set -u
cd "$(dirname "$0")/.."

run_one() {  # name preset steps extra-train-args...
  local name=$1 preset=$2 steps=$3; shift 3
  local dir=runs/$name
  mkdir -p "$dir"
  echo "=== $name: train $preset $steps steps ==="
  python -m tpu_unsup_pc.train --preset "$preset" --steps "$steps" \
      --use-pallas --ckpt-dir "$dir/ckpt" --log-dir "$dir/logs" \
      --num-models 256 "$@" >> "$dir/train.out" 2>&1 || return 1
  python tools/export_params.py --preset "$preset" --ckpt-dir "$dir/ckpt" \
      --out "$dir/final_params.npz" --f16 >> "$dir/train.out" 2>&1
  echo "=== $name: predict + chamfer ==="
  python -m tpu_unsup_pc.predict --preset "$preset" --ckpt-dir "$dir/ckpt" \
      --out "$dir/preds.npz" --num-models 64 >> "$dir/train.out" 2>&1 \
      || return 1
  python -m tpu_unsup_pc.eval_chamfer --pred "$dir/preds.npz" \
      --out "$dir/eval.json" | tail -1
}

WHICH=${*:-"c1 c2 c4 c5"}
for which in $WHICH; do
  case $which in
    c1) run_one c1_quality c1_synth 12000 ;;
    c2) run_one c2_quality c2_synth 12000 ;;
    c4) run_one c4_quality c4_synth 6000 ;;
    # r5 re-anchor: the r2 c4_quality trained on GT masks degraded by the
    # fixed-mass renderer bug (data/synthetic._mass_scale) — 128px masks
    # were eroded (sil ~0.46 vs the 0.4 threshold). Fresh dir so the r2
    # artifact stays comparable.
    c4r5) run_one c4_quality_r5 c4_synth 6000 ;;
    # 256^3 scale demo (r4): same protocol as c4 for an apples-to-apples
    # chamfer anchor; dataset gen at 256 models is a one-time ~15 min
    # cost through the tunnel (cached in .synth_cache thereafter)
    c4xl) run_one c4xl_quality c4xl_synth 6000 ;;
    c5) run_one c5_quality c5_synth 4000 --set "mesh_shape=[1]" ;;
  esac
done
