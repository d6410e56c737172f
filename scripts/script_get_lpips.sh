#!/bin/bash
# Asyrp-TPU port of the reference's script_get_lpips.sh — compute the
# per-timestep LPIPS calibration curves and write the tsv tables interval
# selection consumes (/root/reference/script_get_lpips.sh).
# LPIPS weights: convert the torch `lpips` package's AlexNet+lin ckpts via
# losses.lpips_jax.params_from_torch and np.savez(..., params=tree).

sh_file_name="scripts/script_get_lpips.sh"
config="custom.yml"
guid="smiling"          # unused by the stage but required to run main.py
inv_step=1000           # if large, it takes long time

python main.py --lpips                                                      \
                        --config $config                                    \
                        --exp ./runs/tmp                                    \
                        --edit_attr $guid                                   \
                        --do_train 1                                        \
                        --do_test 1                                         \
                        --n_train_img 100                                   \
                        --n_test_img 32                                     \
                        --t_0 999                                           \
                        --n_inv_step $inv_step                              \
                        --custom_train_dataset_dir "test_images/celeba/train" \
                        --custom_test_dataset_dir "test_images/celeba/test" \
                        --model_path "pretrained/celeba_hq.ckpt"            \
                        --lpips_ckpt "pretrained/lpips_alex.npz"            \
                        --sh_file_name $sh_file_name
