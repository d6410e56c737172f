"""Central dataset / model path registry (the reference
`configs/paths_config.py:1-19` analog). Edit for your machine, or override
per-run with CLI flags / the ASYRP_TPU_DATA environment variable."""
import os

_DATA = os.environ.get("ASYRP_TPU_DATA", "./data")

DATASET_PATHS = {
    "CelebA_HQ": f"{_DATA}/celeba_hq",
    "AFHQ": f"{_DATA}/afhq",
    "FFHQ": f"{_DATA}/ffhq",
    "LSUN": f"{_DATA}/lsun",
    "IMAGENET": f"{_DATA}/imagenet",
    "MetFACE": f"{_DATA}/metfaces",
    "CelebA_HQ_Dialog": f"{_DATA}/celeba_dialog",
    "custom_train": "./train_images",
    "custom_test": "./test_images",
}

MODEL_PATHS = {
    "AFHQ": "pretrained/afhqdog_p2.pt",
    "FFHQ": "pretrained/ffhq_p2.pt",
    "IMAGENET": "pretrained/256x256_diffusion_uncond.pt",
    "MetFACE": "pretrained/metface_p2.pt",
    "CelebA_HQ_P2": "pretrained/celebahq_p2.pt",
    "ir_se50": "pretrained/model_ir_se50.pth",
    "clip_vit_b16": "pretrained/ViT-B-16.pt",
    "clip_rn50": "pretrained/RN50.pt",
    "lpips_alex": "pretrained/lpips_alex.npz",
    "shape_predictor": "pretrained/shape_predictor_68_face_landmarks.dat",
}
