#!/bin/bash
# Refresh the 6-DoF-lite model (rotation + camera-distance offsets) on
# top of the round-4 sharp-anneal pose headline (runs/c3rgb_sharp,
# 9.99deg/0.880). Same proven recipe as runs/c3trans2 (docs/
# pose_training.md "Translation head"): --init-partial fresh-inits only
# the translation head, encoder/decoder frozen, jitter 0.1 with the
# calibrated 0.15 offset scale, sigma held at the donor's 0.6 endpoint.
set -eu
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=$PWD/.jax_cache
OUT=runs/c3trans_sharp

python -m tpu_unsup_pc.train --preset c3_synth --use-pallas \
    --num-models 1024 --steps 8000 \
    --init-params-npz runs/c3rgb_sharp/best_params.npz --init-partial \
    --pose-eval-every 2000 --pose-eval-split val \
    --best-ckpt-metric pose_acc_30deg \
    --set predict_rgb=True --set pose_head_init_scale=1.0 \
    --set predict_translation=True --set synth_dist_jitter=0.1 \
    --set trans_offset_scale=0.15 --set freeze=encoder,decoder \
    --set sigma_start=0.6 --set sigma_end=0.6 \
    --set pose_student_weight=2 --set pose_student_weight_end=0.2 \
    --set pose_student_decay_steps=1 \
    --set learning_rate=1e-4 \
    --ckpt-dir $OUT/ckpt --log-dir $OUT/logs

python -m tpu_unsup_pc.predict --preset c3_synth \
    --params-npz $OUT/ckpt/best_params.npz --all-views \
    --num-models 64 --split test --batch-size 16 \
    --set use_pallas=True --set predict_rgb=True \
    --set predict_translation=True --set synth_dist_jitter=0.1 \
    --set trans_offset_scale=0.15 \
    --out $OUT/test_preds.npz
python -m tpu_unsup_pc.eval_pose --pred $OUT/test_preds.npz \
    --out $OUT/pose_eval_test.json
python tools/trans_probe.py --params-npz $OUT/ckpt/best_params.npz \
    --set predict_rgb=True --set predict_translation=True \
    --set synth_dist_jitter=0.1 --set trans_offset_scale=0.15 \
    --set use_pallas=True \
    > $OUT/trans_probe_test.json || true
echo "trans_sharp done"
