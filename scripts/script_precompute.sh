#!/bin/bash
# Asyrp-TPU port of the reference's script_precompute.sh — precompute the
# DDIM-inverted latent pairs cache only (/root/reference/script_precompute.sh).
# The cache interoperates with reference-format .pth pair files.

sh_file_name="scripts/script_precompute.sh"
config="custom.yml"
guid="smiling"

python main.py --run_train                                                  \
                        --config $config                                    \
                        --exp ./runs/$guid                                  \
                        --edit_attr $guid                                   \
                        --do_train 1                                        \
                        --do_test 1                                         \
                        --n_train_img 100                                   \
                        --n_test_img 32                                     \
                        --bs_train 1                                        \
                        --get_h_num 1                                       \
                        --train_delta_block                                 \
                        --t_0 999                                           \
                        --n_inv_step 50                                     \
                        --n_train_step 50                                   \
                        --n_test_step 50                                    \
                        --just_precompute                                   \
                        --custom_train_dataset_dir "test_images/celeba/train" \
                        --custom_test_dataset_dir "test_images/celeba/test" \
                        --model_path "pretrained/celeba_hq.ckpt"            \
                        --sh_file_name $sh_file_name
