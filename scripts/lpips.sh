#!/bin/bash
# Compute the per-timestep LPIPS calibration curves (tsv tables that
# interval selection consumes) — the reference's script_get_lpips.sh
# workflow. LPIPS weights: convert the torch `lpips` package's AlexNet+lin
# ckpts via losses.lpips_jax.params_from_torch and np.savez(..., params=tree).
set -e
cd "$(dirname "$0")/.."
. scripts/common.sh

python main.py --lpips $COMMON_ARGS \
  --do_train 1 --do_test 1 \
  --lpips_ckpt pretrained/lpips_alex.npz \
  --sh_file_name scripts/lpips.sh
