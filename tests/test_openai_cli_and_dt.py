"""Coverage extensions: OpenAI family end-to-end through the CLI
(learn_sigma path in the runner), dt_lambda chain parity vs the reference,
ImageNet config plan sanity."""
import os

import numpy as np
import pytest
import yaml
from PIL import Image

import jax
import jax.numpy as jnp

from asyrp_official_tpu.cli.main import main as cli_main
from asyrp_official_tpu.core.schedule import make_schedule, uniform_seq
from asyrp_official_tpu.models import ddpmpp, openai_unet
from asyrp_official_tpu.models.registry import ModelSpec
from asyrp_official_tpu.pipelines import engine

OPENAI_TINY_CONFIG = {
    "data": {"dataset": "CelebA_HQ", "category": "CUSTOM", "image_size": 32,
             "channels": 3},
    "model": {"family": "openai", "in_channels": 3, "out_ch": 6, "ch": 32,
              "ch_mult": [1, 2], "num_res_blocks": 1, "attn_resolutions": [16],
              "dropout": 0.0, "var_type": "fixedsmall", "learn_sigma": True,
              "num_head_channels": 16, "use_scale_shift_norm": True,
              "resblock_updown": True, "class_cond": False},
    "diffusion": {"beta_schedule": "linear", "beta_start": 0.0001,
                  "beta_end": 0.02, "num_diffusion_timesteps": 1000},
}


@pytest.fixture(scope="module")
def ws(tmp_path_factory):
    ws = tmp_path_factory.mktemp("wso")
    (ws / "imgs").mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):
        Image.fromarray((rng.rand(32, 32, 3) * 255).astype(np.uint8)).save(
            ws / "imgs" / f"{i}.png"
        )
    with open(ws / "oai.yml", "w") as f:
        yaml.safe_dump(OPENAI_TINY_CONFIG, f)
    return ws

@pytest.mark.slow
def test_cli_openai_family_train_test(ws):
    """The iDDPM/ADM path through the WHOLE runner: learn_sigma channel
    split, openai DeltaBlock flavor, checkpointing, grids."""
    args = [
        "--config", str(ws / "oai.yml"), "--exp", str(ws / "runs" / "o"),
        "--edit_attr", "smiling",
        "--custom_train_dataset_dir", str(ws / "imgs"),
        "--custom_test_dataset_dir", str(ws / "imgs"),
        "--work_dir", str(ws),
        "--n_inv_step", "4", "--n_train_step", "4", "--n_test_step", "4",
        "--n_train_img", "2", "--n_test_img", "2", "--bs_train", "1",
        "--user_defined_t_edit", "500", "--user_defined_t_addnoise", "100",
        "--lr_training", "0.01", "--n_iter", "1", "--clip_loss_w", "0", "--ni", "--allow_random_weights",
        "--run_train", "--train_delta_block", "--get_h_num", "1",
        "--do_test", "1", "--save_x_origin",
    ]
    rc = cli_main(args)
    assert rc == 0
    ckpts = os.listdir(ws / "checkpoint")
    assert any(c.endswith("_0.pth") for c in ckpts)
    # the saved DeltaBlock must be the OpenAI flavor (reference-loadable)
    from asyrp_official_tpu.compat.delta_ckpt import load_delta_checkpoint

    ck = load_delta_checkpoint(
        str(ws / "checkpoint" / [c for c in ckpts if c.endswith("_0.pth")][0])
    )
    assert "in_norm" in ck["blocks"][0]


def test_dt_lambda_chain_parity(reference_path):
    """dt_lambda calibration branch (utils/diffusion_utils.py:99-100) over a
    full chain vs the reference loop."""
    import torch
    from types import SimpleNamespace
    from models.ddpm.diffusion import DDPM
    from utils.diffusion_utils import denoising_step

    config = SimpleNamespace(
        model=SimpleNamespace(ch=32, out_ch=3, ch_mult=[1, 2], num_res_blocks=1,
                              attn_resolutions=[16], dropout=0.0, in_channels=3,
                              resamp_with_conv=True),
        data=SimpleNamespace(image_size=32),
    )
    torch.manual_seed(0)
    model = DDPM(config)
    torch.manual_seed(1)
    model.setattr_layers(1)
    model.eval()

    sched = make_schedule()
    seq = uniform_seq(5, 999)
    seq_next = [-1] + list(seq[:-1])
    x0 = np.random.RandomState(5).randn(1, 3, 32, 32).astype(np.float32)
    dt_lambda, dt_end = 0.7, 500

    betas = torch.from_numpy(sched.betas)
    logvar = torch.from_numpy(sched.logvar)
    x = torch.from_numpy(x0)
    with torch.no_grad():
        for i, j in zip(reversed(seq), reversed(seq_next)):
            x, *_ = denoising_step(
                x, t=torch.full((1,), float(i)), t_next=torch.full((1,), float(j)),
                models=model, logvars=logvar, b=betas, sampling_type="ddim",
                eta=0.0, learn_sigma=False, index=0, t_edit=400,
                hs_coeff=(1.0, 1.0), dt_lambda=dt_lambda, dt_end=dt_end,
            )
    ref = x.numpy()

    from asyrp_official_tpu.compat.torch_convert import convert_ddpmpp, convert_delta_block
    from asyrp_official_tpu.models.delta import EditState

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    cfg = ddpmpp.DDPMppConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                              attn_resolutions=(16,), resolution=32)
    spec = ModelSpec("ddpmpp", cfg, False, "ddpm")
    params = convert_ddpmpp(sd, cfg)
    edit = EditState(
        blocks=(jax.tree.map(jnp.asarray, convert_delta_block(sd, "layer_0")),),
        hs_coeff=jnp.array([1.0, 1.0]),
    )
    run = engine.make_edit_generate(
        spec, sched, seq, t_edit=400, dt_lambda=dt_lambda, dt_end=dt_end
    )
    ours, _ = run(
        params, edit, jnp.asarray(np.transpose(x0, (0, 2, 3, 1))),
        jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(ours), (0, 3, 1, 2)), ref, rtol=2e-3, atol=2e-3
    )


def test_imagenet_plan_sanity():
    plan = openai_unet.build_plan(openai_unet.IMAGENET_CONFIG)
    attn_counts = sum(
        1 for block in plan["input"] for l in block if l["kind"] == "attn"
    )
    assert attn_counts == 6  # 2 res blocks x 3 attention scales (ds 8,16,32)
    assert plan["middle"][1]["kind"] == "attn"
    # class-conditional embedding present
    tiny = openai_unet.OpenAIUNetConfig(
        image_size=32, model_channels=32, out_channels=6, num_res_blocks=1,
        attention_ds=(2,), channel_mult=(1, 2), num_classes=10,
    )
    params = openai_unet.init(jax.random.PRNGKey(0), tiny)
    assert "label_emb" in params
    t = jnp.full((2,), 100.0)
    y = jnp.array([3, 7])
    # at zero-init every residual branch is dead (zero_module out convs),
    # so class conditioning is checked at the embedding level
    emb_y = openai_unet.get_temb(params, tiny, t, y)
    emb_n = openai_unet.get_temb(params, tiny, t)
    assert not np.allclose(np.asarray(emb_y), np.asarray(emb_n))
    assert not np.allclose(np.asarray(emb_y[0]), np.asarray(emb_y[1]))  # per-class
