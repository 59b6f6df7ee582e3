#!/bin/bash
# Pseudo-known-pose distillation (VERDICT r3 next #1): unify shape and
# pose into ONE config-3 pipeline. A fresh c1-recipe shape model trains
# with its cameras FIXED to the pose specialist's guard-refined
# predictions over the train split — structurally the proven known-pose
# recipe with ~9deg-noisy cameras, outside the measured fine-tune dead
# ends (docs/pose_training.md phases 5-7).
#
# Stage 1 (dump) is slow through the TPU tunnel (~40 min dataset gen +
# ~20 min guarded refinement at 1024 models); stages 2-3 reuse the
# synthetic render cache. Artifacts land in runs/distill/.
set -eu
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=$PWD/.jax_cache
MODELS=${MODELS:-1024}
STEPS=${STEPS:-16000}
OUT=${OUT:-runs/distill}
# trust-region guard for the stage-1 refinement. 15 was val-selected for
# the phase-4 model; the sharp model's val sweep picked 10 (higher Acc
# AND lower mean than 15 — runs/c3rgb_sharp/guard_sweep_val.jsonl).
GUARD=${GUARD:-15}
# pose specialist whose predictions become the cameras. Default = the
# phase-4 model that produced runs/distill (reproducibility); pass
# POSE_PARAMS=runs/c3rgb_sharp/best_params.npz OUT=runs/distill2 for
# the sharp-anneal-model refresh (tools/sharp_anneal.sh).
POSE_PARAMS=${POSE_PARAMS:-runs/c3rgb_phase4/best_params.npz}

if [ ! -f $OUT/train_poses.npz ]; then
  echo "=== stage 1: dump guard-refined train-split poses ==="
  python -m tpu_unsup_pc.predict --preset c3_synth \
      --params-npz $POSE_PARAMS --all-views \
      --num-models $MODELS --split train --batch-size 16 \
      --set use_pallas=True --set predict_rgb=True \
      --refine-steps 60 --refine-sigma 1.0 --refine-mode cross \
      --refine-lr 0.03 --refine-guard-deg $GUARD --poses-only \
      --out $OUT/train_poses.npz
  # record the supervision quality the shape model will train under
  python -m tpu_unsup_pc.eval_pose --pred $OUT/train_poses.npz \
      --key pred_pose_guarded --out $OUT/pose_train_guarded.json
fi

echo "=== stage 2: fresh shape model under predicted cameras ==="
python -m tpu_unsup_pc.train --preset c3_synth --use-pallas \
    --num-models $MODELS --steps $STEPS \
    --set predict_pose=False --set source_views=0 \
    --set pose_npz=$OUT/train_poses.npz \
    --set sigma_schedule=exp --set sigma_start=3.0 --set sigma_end=1.0 \
    --set sigma_anneal_steps=12000 \
    --ckpt-dir $OUT/ckpt --log-dir $OUT/logs

echo "=== stage 3: held-out test eval (GT-free pipeline) ==="
python tools/export_params.py --preset c3_synth \
    --set predict_pose=False --set source_views=0 \
    --ckpt-dir $OUT/ckpt --out $OUT/final_params.npz
python -m tpu_unsup_pc.predict --preset c3_synth \
    --params-npz $OUT/final_params.npz \
    --set predict_pose=False --set source_views=0 \
    --set use_pallas=True \
    --num-models 64 --split test --batch-size 16 --out $OUT/test_preds.npz
python -m tpu_unsup_pc.eval_chamfer --pred $OUT/test_preds.npz --align \
    --out $OUT/chamfer_test.json
echo "distill done — compare chamfer_test.json vs the 0.065 target"
