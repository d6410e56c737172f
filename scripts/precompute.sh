#!/bin/bash
# Precompute the DDIM-inverted latent-pair cache only — the reference's
# script_precompute.sh workflow. The cache interoperates with
# reference-format .pth pair files; throughput mode: DP=4 ./scripts/precompute.sh
set -e
cd "$(dirname "$0")/.."
. scripts/common.sh

python main.py --run_train $COMMON_ARGS \
  --just_precompute --train_delta_block --get_h_num 1 --n_test_step 50 \
  --do_train 1 --do_test 1 \
  --sh_file_name scripts/precompute.sh
