# Shared configuration for the Asyrp-TPU workflow scripts.
# Sourced by train.sh / inference.sh / precompute.sh / lpips.sh.
#
# The reference's own four shell scripts also run unchanged against this
# repo via the root main.py shim (tests/test_cli_script_compat.py pins
# both sets). These scripts express the same four workflows with the
# real-weights inputs filled in and the TPU knobs surfaced.

CONFIG=${CONFIG:-custom.yml}          # asyrp_official_tpu/configs/
ATTR=${ATTR:-smiling}                 # key into assets/src_trg_prompts.json
BASE_CKPT=${BASE_CKPT:-pretrained/celeba_hq.ckpt}   # converted torch base model
TRAIN_DIR=${TRAIN_DIR:-test_images/celeba/train}
TEST_DIR=${TEST_DIR:-test_images/celeba/test}

# TPU knobs — export to enable, e.g. `DP=4 BF16=1 ./scripts/train.sh`
TPU_FLAGS=""
[ -n "$DP" ] && TPU_FLAGS="$TPU_FLAGS --dp $DP"
[ -n "$BF16" ] && TPU_FLAGS="$TPU_FLAGS --bf16"
[ -n "$TP_SPATIAL" ] && TPU_FLAGS="$TPU_FLAGS --tp_spatial"
[ -n "$SP" ] && TPU_FLAGS="$TPU_FLAGS --sp $SP"   # 2D data x spatial mesh

COMMON_ARGS="--config $CONFIG --exp ./runs/$ATTR --edit_attr $ATTR
  --custom_train_dataset_dir $TRAIN_DIR --custom_test_dataset_dir $TEST_DIR
  --model_path $BASE_CKPT
  --n_train_img 100 --n_test_img 32 --bs_train 1
  --t_0 999 --n_inv_step 50 --n_train_step 50
  $TPU_FLAGS"
