#!/bin/bash
# Asyrp-TPU port of the reference's script_inference.sh (same workflow and
# flags — /root/reference/script_inference.sh). Works with the 35 released
# reference Δh checkpoints as-is (compat/delta_ckpt reads/writes the .pth
# format).
#
# TPU extras (optional): --bf16, --dp N, --tp_spatial (latency mode:
# shard ONE image's activations over the mesh).

sh_file_name="scripts/script_inference.sh"
config="custom.yml"
guid="smiling"
test_step=50    # if large, it takes long time
dt_lambda=1.0

python main.py --run_test                                                   \
                        --config $config                                    \
                        --exp ./runs/${guid}                                \
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
                        --n_test_step $test_step                            \
                        --get_h_num 1                                       \
                        --train_delta_block                                 \
                        --save_x0                                           \
                        --use_x0_tensor                                     \
                        --hs_coeff_delta_h 1.0                              \
                        --dt_lambda $dt_lambda                              \
                        --custom_train_dataset_dir "test_images/celeba/train" \
                        --custom_test_dataset_dir "test_images/celeba/test" \
                        --manual_checkpoint_name "smiling_LC_CelebA_HQ_t999_ninv40_ngen40_0.pth" \
                        --model_path "pretrained/celeba_hq.ckpt"            \
                        --user_defined_t_edit 500                           \
                        --user_defined_t_addnoise 200                       \
                        --sh_file_name $sh_file_name

                        # with computed lpips curves instead:
                        # --add_noise_from_xt
                        # --lpips_addnoise_th 1.2
                        # --lpips_edit_th 0.33
