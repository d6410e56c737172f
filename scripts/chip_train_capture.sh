#!/usr/bin/env bash
# VERDICT r2 item 7: full-size training demonstration on the chip, captured.
#
# Runs ONE real `--run_train` through the CLI at 256² (CelebA-HQ DDPM++,
# 113.7M params) for 2 outer iterations with --trace_dir, on 2 synthetic
# images (egress-blocked env: no real weights/datasets — random init via
# --allow_random_weights; the TIMING is weight-independent). run_train logs
# ms/batch, ms/edit-timestep, and the jit cache size (must stay 1) per
# iteration — reference training loop: diffusion_latent.py:129-441.
#
# Usage:  bash scripts/chip_train_capture.sh [workdir]   (ONE TPU process
# at a time — stop any bench/probe first, CLAUDE.md)
set -euo pipefail
cd "$(dirname "$0")/.."
WS="${1:-/tmp/fullws}"

python - "$WS" <<'PY'
import os, shutil, sys
import numpy as np, yaml
from PIL import Image

ws = sys.argv[1]
shutil.rmtree(ws, ignore_errors=True)
imgs = os.path.join(ws, "imgs")
os.makedirs(imgs)
rng = np.random.RandomState(0)
for i in range(2):
    Image.fromarray((rng.rand(256, 256, 3) * 255).astype(np.uint8)).save(
        os.path.join(imgs, f"{i}.png"))
cfg = yaml.safe_load(open("asyrp_official_tpu/configs/celeba.yml"))
cfg["data"]["category"] = "CUSTOM"  # route the custom_*_dataset_dir flags
yaml.safe_dump(cfg, open(os.path.join(ws, "celeba_custom.yml"), "w"))
print("workspace ready:", ws)
PY

exec python main.py \
  --config "$WS/celeba_custom.yml" \
  --exp "$WS/runs/full_capture" \
  --edit_attr smiling \
  --custom_train_dataset_dir "$WS/imgs" \
  --custom_test_dataset_dir "$WS/imgs" \
  --work_dir "$WS/w" \
  --run_train --train_delta_block --get_h_num 1 --do_test 0 \
  --n_inv_step 40 --n_train_step 40 --n_test_step 40 \
  --n_train_img 2 --n_test_img 2 --bs_train 1 \
  --user_defined_t_edit 516 --user_defined_t_addnoise 200 \
  --lr_training 0.5 --n_iter 2 \
  --clip_loss_w 0 --id_loss_w 0 --l1_loss_w 3.0 \
  --seed 0 --ni --allow_random_weights \
  --trace_dir "$WS/w/trace"
