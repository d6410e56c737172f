#!/usr/bin/env bash
# VERDICT r3 item 4: on-chip capture of the `--lpips` calibration stage —
# the reference's most expensive pipeline (a full 1000-step inversion with
# TWO LPIPS evals per timestep per image, diffusion_latent.py:1190-1303),
# run at production shape (256² CelebA-HQ DDPM++, n_inv_step 1000) through
# the product CLI. Egress-blocked env: random base weights
# (--allow_random_weights) and a random-init AlexNet+lin LPIPS tree
# (losses/lpips_jax.init) — the TIMING is weight-independent; the real
# curves need the real weights (ROUND3.md). Logs ms/image and writes the
# 4 reference-format tsvs.
#
# Usage: bash scripts/chip_lpips_capture.sh [workdir] [n_img] [bs]
# (ONE TPU process at a time — stop any bench/probe first, CLAUDE.md)
# bs defaults to 8: this chip's conv efficiency at bs 8 is ~1.7x bs 1
# (BASELINE.md round 2); the r3 capture ran bs 1 (VERDICT r5 item 3).
set -euo pipefail
cd "$(dirname "$0")/.."
WS="${1:-/tmp/lpipsws}"
N_IMG="${2:-24}"
BS="${3:-8}"

python - "$WS" "$N_IMG" <<'PY'
import os, shutil, sys
import numpy as np, yaml
from PIL import Image

ws = sys.argv[1]
shutil.rmtree(ws, ignore_errors=True)
imgs = os.path.join(ws, "imgs")
os.makedirs(imgs)
rng = np.random.RandomState(0)
# enough sources for >=3 full batches at the default bs 8 (first batch
# carries the chain compile; steady state needs at least two more)
for i in range(max(8, int(sys.argv[2]))):
    Image.fromarray((rng.rand(256, 256, 3) * 255).astype(np.uint8)).save(
        os.path.join(imgs, f"{i}.png"))
cfg = yaml.safe_load(open("asyrp_official_tpu/configs/celeba.yml"))
cfg["data"]["category"] = "CUSTOM"
yaml.safe_dump(cfg, open(os.path.join(ws, "celeba_custom.yml"), "w"))

# random-init LPIPS params on the CPU backend (perf artifact; real weights
# are env-blocked — losses/lpips_jax.params_from_torch converts them when
# available)
import jax
with jax.default_device(jax.local_devices(backend="cpu")[0]):
    from asyrp_official_tpu.losses import lpips_jax
    tree = jax.tree.map(np.asarray, lpips_jax.init(jax.random.PRNGKey(0)))
np.savez(os.path.join(ws, "lpips_rand.npz"),
         params=np.array(tree, dtype=object))
print("workspace ready:", ws)
PY

exec python main.py \
  --config "$WS/celeba_custom.yml" \
  --exp "$WS/runs/lpips_capture" \
  --edit_attr smiling \
  --custom_train_dataset_dir "$WS/imgs" \
  --custom_test_dataset_dir "$WS/imgs" \
  --work_dir "$WS/w" \
  --lpips --lpips_ckpt "$WS/lpips_rand.npz" \
  --n_inv_step 1000 --t_0 999 \
  --n_train_img "$N_IMG" --bs_train "$BS" \
  --custom_dataset_name celeba_chipcapture \
  --seed 0 --ni --allow_random_weights --bf16
