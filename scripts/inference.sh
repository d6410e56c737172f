#!/bin/bash
# Edit images with a trained (or released) Δh checkpoint — the reference's
# script_inference.sh workflow. The 35 released reference .pth checkpoints
# load as-is. Latency mode: TP_SPATIAL=1 DP=4 ./scripts/inference.sh
set -e
cd "$(dirname "$0")/.."
. scripts/common.sh

python main.py --run_test $COMMON_ARGS \
  --train_delta_block --get_h_num 1 --n_test_step 50 --n_iter 5 \
  --do_train 1 --do_test 1 --dt_lambda 1.0 \
  --manual_checkpoint_name "smiling_LC_CelebA_HQ_t999_ninv40_ngen40_0.pth" \
  --user_defined_t_edit 500 --user_defined_t_addnoise 200 \
  --save_x0 --use_x0_tensor --hs_coeff_delta_h 1.0 \
  --sh_file_name scripts/inference.sh
