#!/bin/bash
# Asyrp-TPU port of the reference's script_train.sh (same workflow, same
# flags — /root/reference/script_train.sh). The reference's own script also
# runs unchanged against this repo via the root main.py shim.
#
# TPU extras (all optional):
#   --bf16                run the UNet in bfloat16 (serving-grade; ~1.4% eps err)
#   --dp N                shard batches over an N-chip mesh
#   --model_path PATH     converted base ckpt (REQUIRED for meaningful edits;
#                         or --download_weights; --allow_random_weights for
#                         plumbing tests only)

sh_file_name="scripts/script_train.sh"

config="custom.yml"   # asyrp_official_tpu/configs/; paths in configs/paths.py
guid="smiling"        # must exist in assets/src_trg_prompts.json

python main.py --run_train                                                  \
                        --config $config                                    \
                        --exp ./runs/$guid                                  \
                        --edit_attr $guid                                   \
                        --do_train 1                                        \
                        --do_test 1                                         \
                        --n_train_img 100                                   \
                        --n_test_img 32                                     \
                        --n_iter 5                                          \
                        --bs_train 1                                        \
                        --t_0 999                                           \
                        --n_inv_step 50                                     \
                        --n_train_step 50                                   \
                        --n_test_step 100                                   \
                        --get_h_num 1                                       \
                        --user_defined_t_edit 500                           \
                        --user_defined_t_addnoise 200                       \
                        --train_delta_block                                 \
                        --save_x0                                           \
                        --use_x0_tensor                                     \
                        --hs_coeff_delta_h 1.0                              \
                        --lr_training 0.5                                   \
                        --clip_loss_w 1.0                                   \
                        --l1_loss_w 3.0                                     \
                        --retrain 1                                         \
                        --custom_train_dataset_dir "test_images/celeba/train" \
                        --custom_test_dataset_dir "test_images/celeba/test" \
                        --model_path "pretrained/celeba_hq.ckpt"            \
                        --clip_ckpt "pretrained/ViT-B-16.pt"                \
                        --sh_file_name $sh_file_name

                        # --add_noise_from_xt        # after running script_get_lpips.sh
                        # --lpips_addnoise_th 1.2    # (instead of user_defined_t_*)
                        # --lpips_edit_th 0.33
                        # --target_class_num $class_num  # for imagenet
