#!/bin/bash
# Continuation of tools/distill_shape.sh: anneal the distilled shape
# model from sigma 1.0 to the 0.6 contract endpoint (utils/config.py,
# SURVEY §2 — the c1 known-pose recipe's operating point). The model has
# no pose ensemble, so none of the c3 sharp-sigma hazards apply; the
# question is purely whether sharper rendering under ~8deg-noisy
# pseudo-cameras helps or hurts chamfer vs the sigma-1.0 endpoint
# (runs/distill, 0.0375/0.0282).
set -eu
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=$PWD/.jax_cache
OUT=runs/distill_sharp

python -m tpu_unsup_pc.train --preset c3_synth --use-pallas \
    --num-models 1024 --steps 6000 \
    --init-params-npz runs/distill/final_params.npz \
    --set predict_pose=False --set source_views=0 \
    --set pose_npz=runs/distill/train_poses.npz \
    --set sigma_schedule=exp --set sigma_start=1.0 --set sigma_end=0.6 \
    --set sigma_anneal_steps=4000 \
    --ckpt-dir $OUT/ckpt --log-dir $OUT/logs

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
echo "distill_sharp done"
