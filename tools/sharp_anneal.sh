#!/bin/bash
# VERDICT r4 ask #3: push the c3 sigma anneal toward the 0.6 contract
# endpoint (utils/config.py sigma_end, SURVEY §2) on the RGB pose model,
# WITH the student weight decayed to ~0 — RECONCILE §1.15's untested
# hypothesis. The sil-lineage phase-6 negative (docs/pose_training.md)
# annealed to 0.8 at CONSTANT w=2; this run removes the student merge
# pressure as sigma sharpens (w 2 -> 0.2 over the anneal window) and
# val-selects every 2k so the known sharp-sigma retreat cannot destroy
# the artifact. Done criterion: Acc@30 within +-0.02 of phase 4's 0.858
# test (else a measured negative upgrading RECONCILE §1.15 to resolved).
set -eu
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=$PWD/.jax_cache
OUT=runs/c3rgb_sharp

python -m tpu_unsup_pc.train --preset c3_synth --steps 14000 \
    --use-pallas --num-models 1024 \
    --init-params-npz runs/c3rgb_phase4/best_params.npz \
    --pose-eval-every 2000 --pose-eval-split val \
    --best-ckpt-metric pose_acc_30deg \
    --set predict_rgb=True --set pose_head_init_scale=1.0 \
    --set sigma_schedule=exp --set sigma_start=1.0 --set sigma_end=0.6 \
    --set sigma_anneal_steps=10000 \
    --set pose_student_weight=2 --set pose_student_weight_end=0.2 \
    --set pose_student_decay_steps=10000 \
    --set learning_rate=5e-5 \
    --ckpt-dir $OUT/ckpt --log-dir $OUT/logs

# held-out test eval of the val-selected checkpoint: pose + aligned chamfer
python -m tpu_unsup_pc.predict --preset c3_synth \
    --params-npz $OUT/ckpt/best_params.npz --all-views \
    --num-models 64 --split test --batch-size 16 \
    --set use_pallas=True --set predict_rgb=True \
    --out $OUT/test_preds.npz
python -m tpu_unsup_pc.eval_pose --pred $OUT/test_preds.npz \
    --out $OUT/pose_eval_test.json
python -m tpu_unsup_pc.eval_chamfer --pred $OUT/test_preds.npz --align \
    --out $OUT/chamfer_test.json
echo "sharp_anneal done"
