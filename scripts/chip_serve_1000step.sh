#!/usr/bin/env bash
# VERDICT r5 item 2: on-chip capture of the reference's BEST-QUALITY serving
# point — `--run_test --n_test_step 1000` (README.md:219 "1000 shows best
# quality"; every released Δ ckpt is t999) at 256² flagship scale through the
# product CLI: 40-step inversion precompute, then the 1000-step edited
# generation chain (dual decode above t_edit=516, eta noise boost below
# t_addnoise=200). Egress-blocked env: random base weights + a synthesized
# Δ-block checkpoint (--allow_random_weights) — the TIMING is
# weight-independent. run_test logs first-grid (compile) and steady-state
# p50 ms/image + ms/gen-step; the first grid is warmup, the rest are honest
# host-fetch-bounded batches.
#
# Usage: bash scripts/chip_serve_1000step.sh [workdir] [n_img] [bs]
# (ONE TPU process at a time — stop any bench/probe first, CLAUDE.md)
set -euo pipefail
cd "$(dirname "$0")/.."
WS="${1:-/tmp/serve1000ws}"
BS="${3:-1}"
N_IMG="${2:-$((4 * BS))}"
# run_test drops partial batches and the steady-state timing line needs at
# least 2 full batches after the compile one — refuse a no-measurement run
if (( N_IMG < 3 * BS )); then
  echo "N_IMG=$N_IMG < 3*BS=$((3 * BS)): zero steady-state samples would be" \
       "captured (run_test drops partial batches). Raise N_IMG." >&2
  exit 2
fi

python - "$WS" "$N_IMG" <<'PY'
import os, shutil, sys
import numpy as np, yaml
from PIL import Image

ws = sys.argv[1]
shutil.rmtree(ws, ignore_errors=True)
imgs = os.path.join(ws, "imgs")
os.makedirs(imgs)
rng = np.random.RandomState(0)
# enough sources for the requested batch count (bs-8 throughput capture
# needs >= 3 full batches; run_test drops partial batches)
for i in range(max(8, int(sys.argv[2]))):
    Image.fromarray((rng.rand(256, 256, 3) * 255).astype(np.uint8)).save(
        os.path.join(imgs, f"{i}.png"))
cfg = yaml.safe_load(open("asyrp_official_tpu/configs/celeba.yml"))
cfg["data"]["category"] = "CUSTOM"
yaml.safe_dump(cfg, open(os.path.join(ws, "celeba_custom.yml"), "w"))

# synthesized trained-Δ checkpoint at flagship bottleneck size (the timing
# stand-in for a released t999 ckpt; hostrng: zero device compiles)
sys.path.insert(0, ".")
import jax
from asyrp_official_tpu.compat.delta_ckpt import save_delta_checkpoint
from asyrp_official_tpu.models.delta import delta_block_init
from asyrp_official_tpu.utils import hostrng

os.makedirs(os.path.join(ws, "w", "checkpoint"), exist_ok=True)
block = delta_block_init(hostrng.PRNGKey(7), 512, 512)
save_delta_checkpoint(
    os.path.join(ws, "w", "checkpoint",
                 "serve1000_LC_CUSTOM_t999_ninv40_ngen40_0.pth"),
    blocks=[jax.tree.map(np.asarray, block)], flavor="ddpm",
)
print("workspace ready:", ws)
PY

exec python main.py \
  --config "$WS/celeba_custom.yml" \
  --exp "$WS/runs/serve1000" \
  --edit_attr smiling \
  --custom_train_dataset_dir "$WS/imgs" \
  --custom_test_dataset_dir "$WS/imgs" \
  --work_dir "$WS/w" \
  --run_test --train_delta_block --get_h_num 1 \
  --do_train 0 --do_test 1 \
  --n_inv_step 40 --n_train_step 40 --n_test_step 1000 \
  --n_train_img 2 --n_test_img "$N_IMG" --bs_train "$BS" \
  --user_defined_t_edit 516 --user_defined_t_addnoise 200 \
  --manual_checkpoint_name "serve1000_LC_CUSTOM_t999_ninv40_ngen40_0.pth" \
  --seed 0 --ni --allow_random_weights --bf16
