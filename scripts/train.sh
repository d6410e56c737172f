#!/bin/bash
# Train a DeltaBlock for one attribute (the reference's script_train.sh
# workflow). CLIP weights drive the directional loss; thresholds here are
# the user-defined pair — run scripts/lpips.sh first to use calibrated
# curves instead (--add_noise_from_xt --lpips_edit_th/--lpips_addnoise_th).
set -e
cd "$(dirname "$0")/.."
. scripts/common.sh

python main.py --run_train $COMMON_ARGS \
  --train_delta_block --get_h_num 1 --n_test_step 100 --n_iter 5 \
  --do_train 1 --do_test 1 --retrain 1 \
  --user_defined_t_edit 500 --user_defined_t_addnoise 200 \
  --lr_training 0.5 --clip_loss_w 1.0 --l1_loss_w 3.0 \
  --clip_ckpt pretrained/ViT-B-16.pt \
  --save_x0 --use_x0_tensor --hs_coeff_delta_h 1.0 \
  --sh_file_name scripts/train.sh
