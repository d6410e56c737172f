"""Released Δh checkpoint loading: golden-value test against the real
`checkpoint/*.pth` artifacts shipped by the reference."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asyrp_official_tpu.compat.delta_ckpt import (
    blocks_to_torch_sd,
    checkpoint_name,
    load_delta_checkpoint,
    load_delta_npz,
    save_delta_checkpoint,
    save_delta_npz,
)
from asyrp_official_tpu.models.delta import delta_block_apply

RELEASED = "/root/reference/checkpoint/smiling_LC_CelebA_HQ_t999_ninv40_ngen40_0.pth"


def test_checkpoint_name_convention():
    assert (
        checkpoint_name("smiling", "CelebA_HQ", 999, 40, 40, 0)
        == "smiling_LC_CelebA_HQ_t999_ninv40_ngen40_0.pth"
    )
    assert checkpoint_name("a", "b", 999, 40, 40, 0, extra=3).endswith("_0_3.pth")


@pytest.mark.skipif(not os.path.exists(RELEASED), reason="released ckpt unavailable")
def test_load_released_smiling_checkpoint():
    ck = load_delta_checkpoint(RELEASED)
    assert "blocks" in ck and len(ck["blocks"]) == 1
    b = ck["blocks"][0]
    # verified released shapes (SURVEY.md §2.1 #8): conv1 (512,512,1,1) → [512,512]
    assert b["conv1"]["w"].shape == (512, 512)
    assert b["temb_proj"]["w"].shape == (512, 512)
    assert b["norm2"]["scale"].shape == (512,)
    assert b["conv2"]["w"].shape == (512, 512)
    assert "optimizer" in ck and "scheduler" in ck


@pytest.mark.skipif(not os.path.exists(RELEASED), reason="released ckpt unavailable")
def test_released_deltablock_golden_forward(reference_path):
    """Run the released smiling DeltaBlock weights through BOTH the torch
    reference module and ours — outputs must match."""
    import torch
    from models.ddpm.diffusion import DeltaBlock

    raw = torch.load(RELEASED, map_location="cpu", weights_only=False)
    tb = DeltaBlock(in_channels=512, out_channels=512, temb_channels=512, dropout=0.0)
    tb.load_state_dict(raw["0"])
    tb.eval()

    ours = load_delta_checkpoint(RELEASED)["blocks"][0]

    rng = np.random.RandomState(0)
    h = rng.randn(2, 512, 8, 8).astype(np.float32)
    temb = rng.randn(2, 512).astype(np.float32)

    with torch.no_grad():
        out_t = tb(torch.from_numpy(h), torch.from_numpy(temb)).numpy()

    out_j = delta_block_apply(
        jax.tree.map(jnp.asarray, ours),
        jnp.asarray(np.transpose(h, (0, 2, 3, 1))),
        jnp.asarray(temb),
        flavor="ddpm",
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(out_j), (0, 3, 1, 2)), out_t, rtol=1e-4, atol=1e-5
    )


@pytest.mark.skipif(not os.path.exists(RELEASED), reason="released ckpt unavailable")
def test_roundtrip_reference_format(tmp_path, reference_path):
    """Our saver writes a .pth the reference module can load verbatim."""
    import torch
    from models.ddpm.diffusion import DeltaBlock

    ck = load_delta_checkpoint(RELEASED)
    out = str(tmp_path / "rt.pth")
    save_delta_checkpoint(out, blocks=ck["blocks"], flavor="ddpm")

    raw = torch.load(out, map_location="cpu", weights_only=False)
    tb = DeltaBlock(in_channels=512, out_channels=512, temb_channels=512, dropout=0.0)
    tb.load_state_dict(raw["0"])  # raises on key/shape mismatch

    orig = torch.load(RELEASED, map_location="cpu", weights_only=False)["0"]
    for k in orig:
        np.testing.assert_allclose(raw["0"][k].numpy(), orig[k].numpy(), rtol=1e-6)


DOG_RELEASED = "/root/reference/checkpoint/dog_happy_LC_dog_t999_ninv40_ngen40_0.pth"


@pytest.mark.skipif(not os.path.exists(DOG_RELEASED), reason="released ckpt unavailable")
def test_released_openai_flavor_golden_forward(reference_path):
    """AFHQ-dog released DeltaBlock (OpenAI flavor) — golden forward vs the
    torch reference module with the real released weights."""
    import torch
    from models.improved_ddpm.unet import DeltaBlock

    raw = torch.load(DOG_RELEASED, map_location="cpu", weights_only=False)
    tb = DeltaBlock(channels=512, emb_channels=512, dropout=0.0)
    tb.load_state_dict(raw["0"])
    tb.eval()

    ours = load_delta_checkpoint(DOG_RELEASED)["blocks"][0]
    assert "in_norm" in ours  # openai flavor auto-detected

    rng = np.random.RandomState(0)
    h = rng.randn(2, 512, 8, 8).astype(np.float32)
    emb = rng.randn(2, 512).astype(np.float32)
    with torch.no_grad():
        out_t = tb(torch.from_numpy(h), torch.from_numpy(emb)).numpy()
    out_j = delta_block_apply(
        jax.tree.map(jnp.asarray, ours),
        jnp.asarray(np.transpose(h, (0, 2, 3, 1))),
        jnp.asarray(emb),
        flavor="openai",
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(out_j), (0, 3, 1, 2)), out_t, rtol=1e-4, atol=1e-5
    )


CKPT_DIR = "/root/reference/checkpoint"


@pytest.mark.skipif(not os.path.isdir(CKPT_DIR), reason="released ckpts unavailable")
def test_all_released_checkpoints_golden_forward(reference_path):
    """Sweep EVERY released Δh checkpoint the reference ships (35 .pth,
    SURVEY.md §2.1 #27): each must load, auto-detect the right DeltaBlock
    flavor for its model family, and golden-match the corresponding torch
    reference module's forward on the real released weights."""
    import torch

    names = sorted(f for f in os.listdir(CKPT_DIR) if f.endswith(".pth"))
    assert len(names) == 35, names

    # category (from `{attr}_LC_{category}_t999_...`) → torch module + flavor
    from models.ddpm.diffusion import DeltaBlock as DDPMDelta
    from models.guided_diffusion.unet import DeltaBlock as ADMDelta
    from models.improved_ddpm.unet import DeltaBlock as IDDPMDelta

    def family(name):
        cat = name.split("_LC_")[1].rsplit("_t999_", 1)[0]
        if cat in ("CelebA_HQ", "church_outdoor", "bedroom"):
            return "ddpm", DDPMDelta(in_channels=512, out_channels=512,
                                     temb_channels=512, dropout=0.0)
        if cat == "dog":
            return "openai", IDDPMDelta(channels=512, emb_channels=512, dropout=0.0)
        if cat == "metfaces":
            return "openai", ADMDelta(channels=512, emb_channels=512, dropout=0.0)
        raise AssertionError(f"unknown released category {cat!r} in {name}")

    rng = np.random.RandomState(0)
    h = rng.randn(1, 512, 8, 8).astype(np.float32)
    emb = rng.randn(1, 512).astype(np.float32)
    h_j = jnp.asarray(np.transpose(h, (0, 2, 3, 1)))
    emb_j = jnp.asarray(emb)

    for name in names:
        flavor, tb = family(name)
        raw = torch.load(os.path.join(CKPT_DIR, name),
                         map_location="cpu", weights_only=False)
        tb.load_state_dict(raw["0"])  # raises on key/shape mismatch
        tb.eval()
        ours = load_delta_checkpoint(os.path.join(CKPT_DIR, name))["blocks"][0]
        with torch.no_grad():
            out_t = tb(torch.from_numpy(h), torch.from_numpy(emb)).numpy()
        out_j = delta_block_apply(
            jax.tree.map(jnp.asarray, ours), h_j, emb_j, flavor=flavor
        )
        np.testing.assert_allclose(
            np.transpose(np.asarray(out_j), (0, 3, 1, 2)), out_t,
            rtol=1e-4, atol=1e-5, err_msg=name,
        )


def test_delta_rows_roundtrip(tmp_path):
    rows = {516: np.random.RandomState(0).randn(8, 8, 512).astype(np.float32)}
    p = str(tmp_path / "rows.pth")
    save_delta_checkpoint(p, delta_rows=rows)
    back = load_delta_checkpoint(p)
    np.testing.assert_allclose(back["delta_rows"][516], rows[516], rtol=1e-6)


def test_npz_roundtrip(tmp_path):
    blocks = [
        {
            "conv1": {"w": np.ones((4, 4), np.float32), "b": np.zeros(4, np.float32)},
            "norm2": {"scale": np.ones(4, np.float32), "bias": np.zeros(4, np.float32)},
        }
    ]
    rows = {100: np.random.RandomState(1).randn(2, 2, 4).astype(np.float32)}
    p = str(tmp_path / "d.npz")
    save_delta_npz(p, blocks=blocks, delta_rows=rows)
    back = load_delta_npz(p)
    np.testing.assert_allclose(back["blocks"][0]["conv1"]["w"], blocks[0]["conv1"]["w"])
    np.testing.assert_allclose(back["delta_rows"][100], rows[100])


def test_load_delta_h_ckpt_with_none_holes(tmp_path):
    """--ignore_timesteps train_delta_h checkpoints keep None values for
    every non-zero timestep (the reference saves the whole delta_h_dict
    incl. its None inits, diffusion_latent.py:172-174,188-189,398-400);
    loading must skip the holes, not crash."""
    import torch

    from asyrp_official_tpu.compat.delta_ckpt import load_delta_checkpoint

    p = str(tmp_path / "holes.pth")
    torch.save(
        {"0": torch.ones(8, 4, 4), "200": None, "400": None,
         "optimizer": {}, "scheduler": {}},
        p,
    )
    loaded = load_delta_checkpoint(p)
    assert list(loaded["delta_rows"]) == [0]
    assert loaded["delta_rows"][0].shape == (4, 4, 8)  # NHWC transpose
