#!/usr/bin/env bash
# VERDICT r3 item 5: full-size training scaling at bs > 1. The round-3 chip
# record is bs 1 (the reference's default recipe); this captures the same
# 256² CLI `--run_train` (bf16 + remat + origin cache, 2 outer iterations)
# at bs 1/2/4/8, one batch per iteration, logging ms/batch and
# ms/edit-timestep per bs — whether batched Δ-training scales like serving
# (conv-bound knee at 8, BASELINE.md) or trips the 4 GiB origin-stack
# budget first (it doesn't: 19 steps x 8 x 256² x 3 x f32 ≈ 478 MB).
# Reference bs_train semantics: diffusion_latent.py:264-279.
#
# Usage: bash scripts/chip_train_bs_scaling.sh [workdir] [bs list...]
# (ONE TPU process at a time — stop any bench/probe first, CLAUDE.md)
set -euo pipefail
cd "$(dirname "$0")/.."
WS="${1:-/tmp/bsws}"
shift || true
BSL=("${@:-}")
if [ -z "${BSL[*]:-}" ]; then BSL=(1 2 4 8); fi

python - "$WS" <<'PY'
import os, shutil, sys
import numpy as np, yaml
from PIL import Image

ws = sys.argv[1]
shutil.rmtree(ws, ignore_errors=True)
imgs = os.path.join(ws, "imgs")
os.makedirs(imgs)
rng = np.random.RandomState(0)
for i in range(8):
    Image.fromarray((rng.rand(256, 256, 3) * 255).astype(np.uint8)).save(
        os.path.join(imgs, f"{i}.png"))
cfg = yaml.safe_load(open("asyrp_official_tpu/configs/celeba.yml"))
cfg["data"]["category"] = "CUSTOM"
yaml.safe_dump(cfg, open(os.path.join(ws, "celeba_custom.yml"), "w"))
print("workspace ready:", ws)
PY

for BS in "${BSL[@]}"; do
  echo "================ bs_train=$BS ================" >&2
  python main.py \
    --config "$WS/celeba_custom.yml" \
    --exp "$WS/runs/bs$BS" \
    --edit_attr smiling \
    --custom_train_dataset_dir "$WS/imgs" \
    --custom_test_dataset_dir "$WS/imgs" \
    --work_dir "$WS/w$BS" \
    --run_train --train_delta_block --get_h_num 1 --do_test 0 \
    --n_inv_step 40 --n_train_step 40 --n_test_step 40 \
    --n_train_img "$BS" --n_test_img 1 --bs_train "$BS" \
    --user_defined_t_edit 516 --user_defined_t_addnoise 200 \
    --lr_training 0.5 --n_iter 3 \
    --clip_loss_w 0 --id_loss_w 0 --l1_loss_w 3.0 \
    --seed 0 --ni --allow_random_weights --bf16
done
