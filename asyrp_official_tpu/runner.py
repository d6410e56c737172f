"""AsyrpRunner — the orchestration layer (the reference `Asyrp` class,
diffusion_latent.py:31-874, re-designed around the compiled engines).

Implements the three dispatched entry paths (main.py:332-337):
  * run_training  — Δ training with resume, per-outer-iteration StepLR,
    checkpointing in the reference `.pth` format, post-train test sweep;
  * run_test      — checkpoint resolution (exp naming / load_from_checkpoint /
    manual / choose_num), Δh test-grid remapping and n_train/n_test scaling,
    multi-attribute mixing, delta-interpolation sweeps, mean-of-Δh global
    directions, random-noise latents, grid writing;
  * run_lpips     — LPIPS calibration tables.

TPU-first differences from the reference:
  * trajectories run as compiled scans (engines); per-image batches are
    real batches, not concatenated bs-1 loader output;
  * params can be packed into one device buffer (parallel/packing.py);
  * heavy external towers (CLIP / ArcFace / LPIPS) are injected as contexts
    so environments without their weights still run every other path.
"""
from __future__ import annotations

import dataclasses
import logging
import os
import time
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from asyrp_official_tpu.compat import delta_ckpt
from asyrp_official_tpu.core.schedule import Schedule, make_schedule, train_seq, uniform_seq
from asyrp_official_tpu.data import datasets as data
from asyrp_official_tpu.data.imageio import save_image
from asyrp_official_tpu.models import ddpmpp, openai_unet
from asyrp_official_tpu.models.delta import EditState, delta_block_init
from asyrp_official_tpu.models.registry import ModelSpec, PRETRAINED_URLS
from asyrp_official_tpu.parallel import mesh as pmesh
from asyrp_official_tpu.pipelines import engine, precompute as pc
from asyrp_official_tpu.pipelines import train as tr
from asyrp_official_tpu.pipelines.interval import select_interval
from asyrp_official_tpu.utils import assets, hostrng

log = logging.getLogger(__name__)


def spec_from_config(config) -> ModelSpec:
    """Build the ModelSpec from a parsed YAML config (model section).

    For the OpenAI-family datasets the reference IGNORES the yml model
    section and uses hardcoded dicts ('Sorry but we did hard coding it' —
    script_util.py; routing at diffusion_latent.py:109-120). A pristine
    reference yml (whose model values are stale SDEdit leftovers) must
    therefore build the registry architecture; an explicit `family:` key
    in the yml opts into yml-driven construction (our shipped configs and
    tiny test models)."""
    m = config["model"]
    d = config["data"]
    if (
        d["dataset"] in ("FFHQ", "AFHQ", "IMAGENET", "MetFACE", "CelebA_HQ_P2")
        and "family" not in m
    ):
        from asyrp_official_tpu.models.registry import resolve

        return resolve(d["dataset"])
    if m.get("family", "ddpmpp") == "ddpmpp":
        cfg = ddpmpp.DDPMppConfig(
            ch=m["ch"],
            out_ch=m["out_ch"],
            ch_mult=tuple(m["ch_mult"]),
            num_res_blocks=m["num_res_blocks"],
            attn_resolutions=tuple(m["attn_resolutions"]),
            dropout=m.get("dropout", 0.0),
            in_channels=m["in_channels"],
            resolution=d["image_size"],
            resamp_with_conv=m.get("resamp_with_conv", True),
        )
        return ModelSpec("ddpmpp", cfg, False, "ddpm")
    img = d["image_size"]
    cfg = openai_unet.OpenAIUNetConfig(
        image_size=img,
        in_channels=m["in_channels"],
        model_channels=m["ch"],
        out_channels=m["out_ch"],
        num_res_blocks=m["num_res_blocks"],
        # config stores attention RESOLUTIONS; OpenAI models key on ds rate
        attention_ds=tuple(img // r for r in m["attn_resolutions"]),
        channel_mult=tuple(m["ch_mult"]),
        num_classes=1000 if m.get("class_cond") else None,
        num_head_channels=m.get("num_head_channels", 64),
        use_scale_shift_norm=m.get("use_scale_shift_norm", True),
        resblock_updown=m.get("resblock_updown", True),
        dropout=m.get("dropout", 0.0),
    )
    return ModelSpec("openai", cfg, m.get("learn_sigma", True), "openai")


def _dataset_key(config) -> str:
    """The LPIPS-curve key for a config (reference keys tables by config
    file stem, diffusion_latent.py:1336-1339)."""
    return {
        "CelebA_HQ": "celeba",
        "CUSTOM": "celeba",
        "CelebA_HQ_Dialog": "celeba",
        "LSUN_church_outdoor": "church",
        "LSUN_bedroom": "bedroom",
        "AFHQ": "afhq",
        "FFHQ": "afhq",
        "MetFACE": "metface",
        "CelebA_HQ_P2": "metface",
        "IMAGENET": "celeba",
    }.get(_route_key(config), "celeba")


def serving_batch_advisory(bs_train: int, n_steps: int) -> Optional[str]:
    """Advisory for batching-hostile serving shapes (BASELINE.md round 5).

    The 256² serving chain is near MXU-saturation at batch 1, so long
    edited-generation chains gain nothing per image from batching (bs 4
    measured 1.44x WORSE per image at n_test_step=1000), and the
    1000-step x bs-8 dual-decode program crashed the relay-side TPU
    worker outright. Returns a warning string for bs_train > 1 on chains
    of >= 500 steps, None otherwise. Warning only — other hardware may
    behave differently; the math is unaffected either way."""
    if bs_train > 1 and n_steps >= 500:
        return (
            f"serving a {n_steps}-step chain at bs_train={bs_train}: "
            "batch 1 is measured-optimal for long chains on TPU (bs 4 ran "
            "1.44x worse per image at 1000 steps, and bs 8 exceeded the "
            "relay worker's limits — BASELINE.md round 5); consider "
            "--bs_train 1"
        )
    return None


def _route_key(config) -> str:
    d = config["data"]
    if d["dataset"] == "LSUN":
        return f"LSUN_{d['category']}"
    return d["dataset"]


class AsyrpRunner:
    def __init__(
        self,
        args,
        config: Dict[str, Any],
        *,
        clip_ctx=None,
        id_params=None,
        lpips_params=None,
        work_dir: str = ".",
    ):
        self.args = args
        self.config = config
        self.spec = spec_from_config(config)
        if getattr(args, "remat", False):
            # product knob for the model-config remat flag bench.py sets
            # directly — resblock activations recomputed in the backward
            self.spec = dataclasses.replace(
                self.spec,
                config=dataclasses.replace(self.spec.config, remat=True),
            )
        diff = config["diffusion"]
        self.schedule = make_schedule(
            num_timesteps=diff["num_diffusion_timesteps"],
            beta_start=diff["beta_start"],
            beta_end=diff["beta_end"],
            var_type=config["model"].get("var_type", "fixedsmall"),
        )
        self.clip_ctx = clip_ctx
        self.id_params = id_params
        self.lpips_params = lpips_params
        self.work_dir = work_dir
        self.compute_dtype = (
            jnp.bfloat16 if getattr(args, "bf16", False) else jnp.float32
        )

        # multi-chip: the reference wraps the model in DataParallel inside
        # the runner (diffusion_latent.py:179,195,591,1201); our equivalent
        # is a data-axis mesh owned by the runner — batches sharded, frozen
        # UNet + Δ params replicated, Δ-grad psum inserted by GSPMD.
        dp = int(getattr(args, "dp", 0) or 0)
        sp = int(getattr(args, "sp", 0) or 0)
        self.mesh = None
        self.tp_spatial = bool(getattr(args, "tp_spatial", False))
        self.sp = 0
        if sp and sp < 2:
            # a silently-ignored flag contradicts the loud-failure
            # convention — sp=1 would be an 8x-slower no-op
            raise ValueError(
                f"--sp {sp}: the spatial axis needs >= 2 ways "
                "(use --dp alone for pure data parallelism)"
            )
        if sp and self.tp_spatial:
            raise ValueError(
                "--sp and --tp_spatial are exclusive: --tp_spatial spreads "
                "the WHOLE --dp mesh over the height axis; --sp carves a 2D "
                "data x spatial mesh"
            )
        if sp:
            # 2D (data, spatial) mesh — throughput x latency composed:
            # --dp D image groups in parallel, each image's activation
            # height split over --sp S chips (D*S devices; --dp -1 or
            # absent sizes the data axis as all_devices // S)
            if dp in (0, -1):
                n_avail = len(jax.devices())
                if n_avail % sp:
                    # 'all devices' must mean ALL — silently idling
                    # n_avail % sp chips contradicts make_mesh's own
                    # no-silent-truncation contract
                    raise ValueError(
                        f"--sp {sp} does not divide the {n_avail} available "
                        "devices; pass --dp D explicitly to use a subset"
                    )
                d = n_avail // sp
            else:
                d = dp
            if d < 1:
                raise ValueError(
                    f"--sp {sp} exceeds the {len(jax.devices())} available devices"
                )
            if config["data"]["image_size"] % sp:
                raise ValueError(
                    f"--sp: image_size={config['data']['image_size']} "
                    f"must divide by --sp {sp}"
                )
            if getattr(args, "bs_train", 1) % d:
                raise ValueError(
                    f"bs_train={args.bs_train} must divide by the data "
                    f"axis {d} (--dp)"
                )
            self.mesh = pmesh.make_mesh(d * sp, spatial=sp)
            self.sp = sp
        elif dp:
            n = len(jax.devices()) if dp == -1 else dp
            self.mesh = pmesh.make_mesh(n)
            if self.tp_spatial:
                # latency mode, serving AND training: the activation height
                # axis sharded across the chips (parallel/spatial.py) —
                # divides the per-image conv work, the only multi-chip
                # lever at the reference's default bs=1 recipe
                if config["data"]["image_size"] % n:
                    raise ValueError(
                        f"--tp_spatial: image_size={config['data']['image_size']} "
                        f"must divide by --dp {n}"
                    )
            elif getattr(args, "bs_train", 1) % n:
                # the reference asserts the same (main.py:326-327)
                raise ValueError(
                    f"bs_train={args.bs_train} must divide by --dp {n}"
                )
        elif self.tp_spatial:
            raise ValueError("--tp_spatial requires --dp")

        # prompt resolution (diffusion_latent.py:65-73)
        if getattr(args, "edit_attr", None) not in (None, "attribute"):
            self.src_txts, self.trg_txts = assets.src_trg_prompts()[args.edit_attr]
        else:
            self.src_txts = getattr(args, "src_txts", None)
            self.trg_txts = getattr(args, "trg_txts", None)

        self._params = None
        self._engine_cache = {}

    # ------------------------------------------------------------------
    # placement (single-device pin, or mesh sharding under --dp)
    # ------------------------------------------------------------------
    def _put(self, x) -> jax.Array:
        """Commit a [B, H, W, C] batch: data-axis sharded on the mesh,
        height-sharded under --tp_spatial, both under --sp (2D mesh);
        device-pinned otherwise."""
        x = jnp.asarray(x)
        if self.mesh is None:
            return jax.device_put(x, jax.local_devices()[0])
        if self.sp:
            from asyrp_official_tpu.parallel.spatial import batch_spatial_shard

            return batch_spatial_shard(self.mesh, x)
        if self.tp_spatial:
            from asyrp_official_tpu.parallel.spatial import spatial_shard

            return spatial_shard(self.mesh, x)
        return pmesh.shard_batch(self.mesh, x)

    def _put_padded(self, x) -> Tuple[jax.Array, int]:
        """Like _put but pads the batch axis to the data-axis multiple;
        returns (committed, n_real) — callers slice outputs back to
        n_real."""
        x = np.asarray(x)
        n = x.shape[0]
        if self.mesh is not None and not self.tp_spatial:
            m = (
                self.mesh.shape[pmesh.DATA_AXIS]
                if self.sp
                else self.mesh.devices.size
            )
            x, _ = pmesh.pad_to_multiple(x, m)
        return self._put(x), n

    def _replicate(self, tree):
        """Replicate params / Δ state / optimizer state onto the mesh;
        single-device, COMMIT to the device — uncommitted arrays dispatch
        ~50x slower through the relay (CLAUDE.md), and converted torch
        weights arrive as plain numpy."""
        if self.mesh is None:
            return jax.device_put(tree, jax.local_devices()[0])
        return pmesh.replicate(self.mesh, tree)

    # ------------------------------------------------------------------
    # model loading
    # ------------------------------------------------------------------
    def load_pretrained(self):
        """Frozen base-model params. Resolution order:
          1. --model_path (torch ckpt, converted) — must exist: a mistyped
             path must fail, not silently edit with garbage (the reference
             fails on torch.load, diffusion_latent.py:104-114);
          2. --download_weights → fetch registry.PRETRAINED_URLS into
             pretrained/ (the reference auto-downloads unconditionally,
             diffusion_latent.py:81-106; we gate it for zero-egress hosts);
          3. --allow_random_weights → random init (plumbing tests ONLY —
             explicitly opted into, loudly logged);
          4. otherwise raise with the exact artifact needed."""
        if self._params is not None:
            return self._params
        path = getattr(self.args, "model_path", None)
        if path and not os.path.exists(path):
            raise FileNotFoundError(
                f"--model_path {path!r} does not exist "
                f"(pretrained ckpt URL for this dataset: "
                f"{PRETRAINED_URLS.get(_route_key(self.config))})"
            )
        if not path and getattr(self.args, "download_weights", False):
            from asyrp_official_tpu.utils.download import download_pretrained

            path = download_pretrained(
                _route_key(self.config), dest_dir=self._dir("pretrained")
            )
            log.info("downloaded pretrained diffusion model to %s", path)
        if path:
            from asyrp_official_tpu.compat.torch_convert import load_state_dict_numpy

            sd = load_state_dict_numpy(path)
            params = self.spec.params_from_torch(sd)
            log.info("loaded pretrained diffusion model from %s", path)
        elif getattr(self.args, "allow_random_weights", False):
            log.warning(
                "--allow_random_weights: using RANDOM weights — outputs are "
                "NOT meaningful edits (pretrained ckpt for this dataset: %s)",
                PRETRAINED_URLS.get(_route_key(self.config)),
            )
            with jax.default_device(jax.local_devices(backend="cpu")[0]):
                params = self.spec.init(hostrng.PRNGKey(self.args.seed))
        else:
            url = PRETRAINED_URLS.get(_route_key(self.config))
            hint = (
                f"pass --model_path <ckpt> (auto-download URL: {url}), or "
                "--download_weights to fetch it"
                if url
                else "pass --model_path <ckpt> (no auto-download URL for this "
                "dataset — see utils.download.GDRIVE_NOTES for manual sources)"
            )
            raise FileNotFoundError(
                f"no pretrained diffusion weights for "
                f"{_route_key(self.config)}: {hint}; --allow_random_weights "
                "runs with random weights (tests/plumbing only)"
            )
        self._params = self._replicate(params)
        return self._params

    # ------------------------------------------------------------------
    # interval
    # ------------------------------------------------------------------
    def set_interval(self) -> float:
        a = self.args
        if a.user_defined_t_edit and a.user_defined_t_addnoise and self.clip_ctx is None:
            self.t_edit, self.t_addnoise = a.user_defined_t_edit, a.user_defined_t_addnoise
            return 1.0
        cosine = 1.0
        if self.clip_ctx is not None:
            cosine = self.clip_ctx.text_cosine(self.src_txts, self.trg_txts)
        # calibration-curve resolution (diffusion_latent.py:1336-1360):
        # custom datasets key curves by --custom_dataset_name; a fresh
        # on-disk `--lpips` tsv takes precedence over the bundled tables.
        from asyrp_official_tpu.utils.assets import load_lpips_tsv, lpips_curve

        candidates = []
        custom_name = getattr(a, "custom_dataset_name", None)
        if self.config["data"]["category"] == "CUSTOM" and custom_name:
            candidates.append(custom_name)
        candidates.append(_dataset_key(self.config))

        key = candidates[-1]
        curve_x0_t = curve_x = None
        for cand in candidates:
            tsv = os.path.join(
                self.work_dir, "utils", f"{cand}_LPIPS_distance_x0_t.tsv"
            )
            if os.path.exists(tsv):
                key = cand
                curve_x0_t = load_lpips_tsv(tsv)
                tsv_x = os.path.join(
                    self.work_dir, "utils", f"{cand}_LPIPS_distance_x.tsv"
                )
                if os.path.exists(tsv_x):
                    curve_x = load_lpips_tsv(tsv_x)
                break
            try:
                lpips_curve(cand, "x0_t")
                key = cand
                break
            except KeyError:
                continue
        self.t_edit, self.t_addnoise = select_interval(
            key,
            cosine,
            lpips_edit_th=a.lpips_edit_th,
            lpips_addnoise_th=a.lpips_addnoise_th,
            add_noise_from_xt=getattr(a, "add_noise_from_xt", False),
            user_defined_t_edit=a.user_defined_t_edit or None,
            user_defined_t_addnoise=a.user_defined_t_addnoise or None,
            curve_x0_t=curve_x0_t,
            curve_x=curve_x,
        )
        log.info("t_edit=%d t_addnoise=%d cosine=%.4f", self.t_edit, self.t_addnoise, cosine)
        return cosine

    # ------------------------------------------------------------------
    # data
    # ------------------------------------------------------------------
    def get_pairs(self, params, mode: str) -> Dict[str, np.ndarray]:
        a = self.args
        d = self.config["data"]
        # the reference sizes + names the latent cache by --n_precomp_img,
        # independent of the train/test image counts that consume it
        # (diffusion_latent.py:967-970,988); precompute at least what the
        # consuming split needs so an undersized default cannot starve it
        n_consume = a.n_train_img if mode == "train" else a.n_test_img
        n_img = max(n_consume, getattr(a, "n_precomp_img", 0) or 0)
        if getattr(a, "load_random_noise", False):
            return pc.random_noise_pairs(
                self.spec, params, self.schedule,
                n_img=n_img, n_inv_step=a.n_inv_step,
                image_size=d["image_size"], mode=mode,
                category=d["category"], cache_dir=self._dir("precomputed"),
                saved_noise=getattr(a, "saved_random_noise", False),
                batch_size=a.bs_train, seed=a.seed, t_0=a.t_0,
                compute_dtype=self.compute_dtype,
                put=lambda c: self._put_padded(c)[0],
            )
        from asyrp_official_tpu.configs.paths import DATASET_PATHS

        paths = dict(DATASET_PATHS)
        paths.update(getattr(a, "dataset_paths", {}) or {})
        if d["category"] == "CUSTOM":
            paths["custom_train"] = a.custom_train_dataset_dir
            paths["custom_test"] = a.custom_test_dataset_dir
        train_ds, test_ds = data.get_dataset(
            d["dataset"], paths, category=d["category"],
            image_size=d["image_size"],
            target_class_num=getattr(a, "target_class_num", None),
        )
        ds = train_ds if mode == "train" else test_ds
        save_dir = None
        if getattr(a, "save_precomputed_images", False):
            save_dir = self._dir(os.path.join(a.exp, "image_samples"))
        class_name = None
        if d["dataset"] == "IMAGENET" and getattr(a, "target_class_num", None) is not None:
            # cache name embeds the class (diffusion_latent.py:966-968)
            class_name = data.imagenet_classes()[str(a.target_class_num)][1]
        return pc.precompute_pairs(
            self.spec, params, self.schedule, ds,
            n_img=n_img, n_inv_step=a.n_inv_step, t_0=a.t_0, mode=mode,
            category=d["category"], cache_dir=self._dir("precomputed"),
            batch_size=a.bs_train,
            re_precompute=getattr(a, "re_precompute", False),
            compute_dtype=self.compute_dtype,
            save_imgs_dir=save_dir,
            class_name=class_name,
            shuffle_seed=(
                a.seed
                if mode == "train" and getattr(a, "shuffle_train_dataloader", False)
                else None
            ),
            put=lambda c: self._put_padded(c)[0],
        )

    def _dir(self, name: str) -> str:
        p = os.path.join(self.work_dir, name)
        os.makedirs(p, exist_ok=True)
        return p

    def _ckpt_path(self, it: int, extra: Optional[int] = None) -> str:
        a = self.args
        d = self.config["data"]
        if getattr(a, "load_from_checkpoint", None):
            name = delta_ckpt.checkpoint_name(
                a.load_from_checkpoint, d["category"], a.t_0, a.n_inv_step,
                a.n_train_step, it, extra,
            )
        else:
            exp_id = os.path.split(a.exp)[-1]
            name = f"{exp_id}_{it}.pth" if extra is None else f"{exp_id}_{it}_{extra}.pth"
        return os.path.join(self._dir("checkpoint"), name)

    # ------------------------------------------------------------------
    # training (diffusion_latent.py:129-441)
    # ------------------------------------------------------------------
    def run_training(self):
        a = self.args
        cosine = self.set_interval()
        seq_train, _ = train_seq(a.n_train_step, a.t_0, self.t_edit)
        # n_train_step == 0 is the reference's 'no skip' mode
        # (diffusion_latent.py:157-159)
        seq_test = (
            uniform_seq(a.n_train_step, a.t_0)
            if a.n_train_step
            else list(range(0, a.t_0))
        )
        params = self.load_pretrained()

        # trainable state
        train_target = "rows" if a.train_delta_h else "blocks"
        # from the resolved spec, NOT config['model']: OpenAI-family ymls
        # carry stale SDEdit model sections that spec_from_config ignores
        bottleneck_hw = self.spec.bottleneck_hw
        extra_blocks = ()
        if train_target == "blocks" and a.get_h_num < 1:
            # reference parity: get_h_num defaults to 0 (main.py:185) and
            # --train_delta_block without it crashes torch's SGD with
            # "optimizer got an empty parameter list" — fail as loudly
            raise ValueError(
                "--train_delta_block needs --get_h_num >= 1 (the reference "
                "default 0 leaves the optimizer with no parameters)"
            )
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            if train_target == "blocks":
                blocks = tuple(
                    delta_block_init(
                        hostrng.PRNGKey(a.seed + i),
                        self.spec.bottleneck_ch, self.spec.temb_ch,
                        flavor=self.spec.delta_flavor,
                    )
                    for i in range(a.get_h_num)
                )
                # the reference trains with index=0 — only layer_0 receives
                # gradient even when get_h_num > 1 (diffusion_latent.py:314,
                # models/ddpm/diffusion.py:513-516); the remaining blocks
                # stay at init and are saved untouched
                extra_blocks = blocks[1:]
                edit = EditState(
                    blocks=blocks[:1],
                    hs_coeff=jnp.array([1.0, 1.0]),
                    flavor=self.spec.delta_flavor,
                    ignore_timestep=a.ignore_timesteps,
                )
            else:
                k = 1 if a.ignore_timesteps else len(seq_train)
                rows = 0.2 * jax.random.normal(
                    jax.random.PRNGKey(a.seed),
                    (k, bottleneck_hw, bottleneck_hw, self.spec.bottleneck_ch),
                )
                edit = EditState(
                    mode="input", delta_rows=rows,
                    hs_coeff=jnp.array([1.0, 1.0]),
                    input_style=getattr(a, "delta_injection", "add"),
                    ignore_timestep=a.ignore_timesteps,
                    # times of the stacked rows — save_grid maps generation
                    # timesteps onto these (declared static field: survives
                    # jit round-trips and dataclasses.replace)
                    times=None if a.ignore_timesteps else tuple(seq_train),
                )

        # loss
        extra_loss = None
        if self.clip_ctx is not None and a.clip_loss_w:
            from asyrp_official_tpu.losses.clip_loss import train_clip_term

            extra_loss = train_clip_term(
                self.clip_ctx, self.src_txts[0], self.trg_txts[0], a.clip_loss_w
            )
        if self.id_params is not None and a.id_loss_w:
            from asyrp_official_tpu.losses.id_loss import id_loss as idl

            id_p = self.id_params
            clip_extra = extra_loss

            def extra_loss(x0, x0_t, x0_t_origin, _clip=clip_extra, _idp=id_p):  # noqa: F811
                # reference anchors identity to the UN-edited denoising
                # x0_t_origin, not the source image (diffusion_latent.py:346)
                out = a.id_loss_w * idl(_idp, x0_t, x0_t_origin).mean()
                if _clip is not None:
                    out = out + _clip(x0, x0_t, x0_t_origin)
                return out

        def loss_fn(x0_t, x0_t_origin, x0):
            return tr.default_loss(
                x0_t, x0_t_origin, x0, l1_w=a.l1_loss_w, cosine=cosine,
                extra=extra_loss,
            )

        opt = tr.make_optimizer(a.lr_training, a.scheduler_step_size, a.sch_gamma)
        edit = self._replicate(edit)
        trainable = edit.blocks if train_target == "blocks" else edit.delta_rows
        opt_state = self._replicate(opt.init(trainable))

        pairs = self.get_pairs(params, "train")
        if getattr(a, "just_precompute", False):
            log.info("pre-computed done.")
            return edit

        x_lat_all = pairs["x_lat"][: a.n_train_img]
        x0_all = pairs["x0"][: a.n_train_img]
        target_ids = self._parse_target_ids(getattr(a, "target_image_id", None))
        if target_ids is not None:  # diffusion_latent.py:265-268
            keep = [i for i in range(x_lat_all.shape[0]) if i in target_ids]
            x_lat_all, x0_all = x_lat_all[keep], x0_all[keep]

        if not getattr(a, "do_train", 1):
            # the reference gates the ENTIRE per-iteration train block —
            # resume-checkpoint loading, batches, saves — on do_train
            # (diffusion_latent.py:237); only the post-train do_test sweep
            # runs when it is 0
            log.info("--do_train 0: skipping the training loop")
            if a.do_test:
                self._test_sweep(params, edit, seq_test)
            return edit

        if x_lat_all.shape[0] < a.bs_train:
            raise ValueError(
                f"no full batch to train on: bs_train={a.bs_train} > "
                f"{x_lat_all.shape[0]} available training images "
                "(drop_last would skip every batch and save an UNTRAINED "
                "checkpoint)"
            )

        # The no-grad plain-DDIM reference trajectory depends only on the
        # FROZEN UNet and x_lat, so it is constant across outer iterations;
        # the reference recomputes it every iteration (diffusion_latent.py:
        # 322-329). With >1 iteration, compute it once per batch and reuse —
        # saves one plain UNet forward per edit timestep (~13% of the step)
        # in every iteration after the first, with identical training math.
        # Device-memory budget: the x0_t_origin stacks for all batches stay
        # resident, so cap the cache and fall back to in-step recompute.
        n_outer = a.n_iter - a.start_iter_when_you_use_pretrained
        n_batches = max(1, x_lat_all.shape[0] // a.bs_train)
        origin_bytes = (
            n_batches * len(seq_train) * a.bs_train
            * int(np.prod(x_lat_all.shape[1:])) * 4
        )
        use_origin_cache = (
            n_outer > 1
            and origin_bytes <= 4 * 2**30
            and not os.environ.get("ASYRP_TPU_NO_ORIGIN_CACHE")
        )
        step = tr.make_train_step(
            self.spec, self.schedule, seq_train, t_edit=self.t_edit,
            optimizer=opt, loss_fn=loss_fn, train_target=train_target,
            ignore_timesteps=a.ignore_timesteps,
            compute_dtype=self.compute_dtype,
            cached_origin=use_origin_cache,
        )
        origin_cache: Dict[int, Any] = {}
        if use_origin_cache:
            log.info(
                "origin-trajectory cache ON: %d batch(es) x %d steps "
                "(%.0f MB), reused across %d outer iterations",
                n_batches, len(seq_train), origin_bytes / 2**20, n_outer,
            )

        for it_out in range(a.start_iter_when_you_use_pretrained, a.n_iter):
            save_name = self._ckpt_path(it_out)
            if not a.retrain and os.path.exists(save_name):
                log.info("%s exists; loading checkpoint and skipping iter", save_name)
                # prefer the native orbax sidecar (restores optimizer state
                # bit-exactly); fall back to the .pth Δ params alone
                try:
                    from asyrp_official_tpu.pipelines.checkpoint import load_train_state

                    trainable0 = edit.blocks if train_target == "blocks" else edit.delta_rows
                    restored = load_train_state(
                        save_name + ".orbax",
                        like={
                            "trainable": trainable0,
                            "opt_state": opt_state,
                            "meta": {"it_out": np.asarray(0)},
                        },
                    )
                except Exception as e:
                    log.warning(
                        "orbax sidecar restore failed (%s: %s) — falling "
                        "back to the .pth delta params; optimizer state "
                        "resets", type(e).__name__, e,
                    )
                    restored = None
                if restored is not None:
                    opt_state = restored["opt_state"]
                    if train_target == "blocks":
                        edit = dataclasses.replace(
                            edit, blocks=tuple(restored["trainable"])
                        )
                    else:
                        edit = dataclasses.replace(
                            edit, delta_rows=restored["trainable"]
                        )
                else:
                    loaded = delta_ckpt.load_delta_checkpoint(save_name)
                    edit, extras = self._apply_loaded_delta(
                        edit, loaded, seq_train
                    )
                    if extras:
                        extra_blocks = extras
                edit = self._replicate(edit)
                opt_state = self._replicate(opt_state)
                continue
            lr = tr.steplr_lr(a.lr_training, it_out, a.scheduler_step_size, a.sch_gamma)
            losses = []
            save_counter = 0
            batch_ms: List[float] = []
            # timesteps the optimizer actually edits per batch: every seq
            # step carries a Δ row in rows mode; blocks gate on t >= t_edit
            # (core/steptable.generation_table)
            n_edit_steps = (
                len(seq_train) if train_target == "rows"
                else sum(1 for t in seq_train if t >= self.t_edit)
            ) or 1
            for bi, ofs in enumerate(range(0, len(x_lat_all), a.bs_train)):
                if x_lat_all[ofs : ofs + a.bs_train].shape[0] != a.bs_train:
                    break  # drop_last semantics
                xb = self._put(x_lat_all[ofs : ofs + a.bs_train])
                x0b = self._put(x0_all[ofs : ofs + a.bs_train])
                t0 = time.perf_counter()
                if use_origin_cache:
                    org = origin_cache.get(ofs)
                    if org is None:
                        org = step.compute_origins(params, xb)
                        origin_cache[ofs] = org
                    edit, opt_state, metrics = step(
                        params, edit, opt_state, xb, x0b, lr, org
                    )
                else:
                    edit, opt_state, metrics = step(
                        params, edit, opt_state, xb, x0b, lr
                    )
                # the float() host fetch is the honest completion barrier
                # (block_until_ready is a no-op through the TPU relay)
                losses.append(float(metrics["loss"]))
                batch_ms.append((time.perf_counter() - t0) * 1e3)
                # reference checks its counter BEFORE incrementing — saves at
                # batches 0, step, 2*step ... (diffusion_latent.py:367-381)
                if a.save_checkpoint_during_iter and bi % a.save_checkpoint_step == 0:
                    self._save_delta(
                        edit, self._ckpt_path(it_out, save_counter),
                        train_target, seq_train, extra_blocks,
                    )
                    save_counter += 1
                if (
                    getattr(a, "save_train_image", False)
                    and (len(losses) - 1) % a.save_train_image_step == 0
                    and it_out % a.save_train_image_iter == 0
                ):  # training-time visual checkpoints (diffusion_latent.py:358-365)
                    self.save_grid(
                        params, edit, pmesh.fetch(xb), seq_test,
                        # last-image index, like the reference's
                        # train_{step}_{it_out} at batch-fire time (:364)
                        file_name=f"train_{ofs + a.bs_train - 1}_{it_out}",
                        # --save_to_folder overrides the folder (main.py:292-293)
                        folder=getattr(a, "save_to_folder", None)
                        or self._dir(os.path.join(a.exp, "training_images")),
                        x0=pmesh.fetch(x0b),
                    )
            # steady-state batch time excludes the compile-bearing first call
            # of the program's life (jit cache must stay at 1 — a growing
            # cache means a signature leak recompiling mid-run, CLAUDE.md)
            first_iter = it_out == a.start_iter_when_you_use_pretrained
            steady = sorted(batch_ms[1:] if first_iter and len(batch_ms) > 1 else batch_ms)
            timing = ""
            if steady:
                med = steady[len(steady) // 2]
                note = " incl. compile" if first_iter and len(batch_ms) == 1 else ""
                timing = (
                    f", {med:.0f} ms/batch{note} -> {med / n_edit_steps:.1f} "
                    f"ms/edit-timestep ({n_edit_steps} edited), "
                    f"jit cache {step.cache_size()}"
                )
            log.info(
                "iter %d: mean loss %.4f (lr %.4g%s)",
                it_out, float(np.mean(losses or [0.0])), lr, timing,
            )
            self._save_delta(edit, save_name, train_target, seq_train, extra_blocks)
            try:
                from asyrp_official_tpu.pipelines.checkpoint import save_train_state

                save_train_state(
                    save_name + ".orbax",
                    trainable=edit.blocks if train_target == "blocks" else edit.delta_rows,
                    opt_state=opt_state,
                    it_out=it_out,
                )
            except Exception as e:  # orbax is optional for .pth-only flows
                log.warning("orbax sidecar save failed: %s", e)
            if a.save_checkpoint_only_last_iter and it_out > 0:
                prev = self._ckpt_path(it_out - 1)
                if os.path.exists(prev):
                    os.remove(prev)
                if os.path.isdir(prev + ".orbax"):
                    import shutil

                    shutil.rmtree(prev + ".orbax", ignore_errors=True)

        if a.do_test:
            self._test_sweep(params, edit, seq_test)
        return edit

    def _save_delta(self, edit: EditState, path: str, train_target: str,
                    seq_train, extra_blocks=()):
        if train_target == "blocks":
            all_blocks = list(edit.blocks) + list(extra_blocks)
            delta_ckpt.save_delta_checkpoint(
                path, blocks=[jax.tree.map(np.asarray, b) for b in all_blocks],
                flavor=self.spec.delta_flavor,
            )
        else:
            rows = np.asarray(edit.delta_rows)
            keys = [0] if self.args.ignore_timesteps else list(seq_train)
            delta_ckpt.save_delta_checkpoint(
                path, delta_rows={t: rows[i] for i, t in enumerate(keys)}
            )
        log.info("saved %s", path)

    def _apply_loaded_delta(self, edit: EditState, loaded, seq_train):
        """Returns (edit, extra_blocks). `_save_delta` stores the trained
        block(s) first and the untrained get_h_num>1 extras after them
        (the reference trains index 0 only, diffusion_latent.py:314), so
        only the first len(edit.blocks) may re-enter the train state —
        opt_state and hs_coeff were built for exactly those."""
        if "blocks" in loaded:
            lb = tuple(
                jax.tree.map(jnp.asarray, b) for b in loaded["blocks"]
            )
            k = len(edit.blocks)
            return dataclasses.replace(edit, blocks=lb[:k]), lb[k:]
        rows_dict = loaded["delta_rows"]
        keys = [0] if self.args.ignore_timesteps else list(seq_train)
        rows = jnp.asarray(np.stack([rows_dict[t] for t in keys]))
        return dataclasses.replace(edit, delta_rows=rows), ()

    # ------------------------------------------------------------------
    # generation / grids (save_image, diffusion_latent.py:445-544)
    # ------------------------------------------------------------------
    def save_grid(
        self,
        params,
        edit: Optional[EditState],
        x_lat: np.ndarray,
        seq,
        *,
        file_name: str,
        folder: str,
        hs_coeff_list: Optional[List] = None,
        x0: Optional[np.ndarray] = None,
        collect_delta: bool = False,
        rng: Optional[jax.Array] = None,
    ):
        a = self.args
        rng = rng if rng is not None else jax.random.PRNGKey(a.seed)
        x_dev, n_real = self._put_padded(x_lat)
        rows = []
        if a.save_x0 and x0 is not None:
            rows.append(np.asarray(x0))
        if a.save_x_origin:
            gen = self._cached_engine(
                "gen",
                tuple(seq),
                t_addnoise=self.t_addnoise if a.origin_process_addnoise else -1,
                sample_type=a.sample_type,
                collect=("x", "x0_t") if getattr(a, "save_process_origin", False) else (),
            )
            x, ys = gen(params, x_dev, rng)
            rows.append(pmesh.fetch(x)[:n_real])
            if getattr(a, "save_process_origin", False):
                self._dump_process(ys, seq, folder, file_name, "origin", n_real)

        harvested = None
        if not getattr(a, "pass_editing", False) and edit is not None:
            delta_times = None
            if edit.mode == "input" and not a.ignore_timesteps:
                delta_times = list(edit.times) if edit.times else list(seq)
            collect = ()
            if collect_delta:
                collect += ("delta_h",)
            if getattr(a, "save_process_delta_h", False):
                collect += ("x", "x0_t")
            run = self._cached_engine(
                "edit",
                tuple(seq),
                t_edit=self.t_edit, t_addnoise=self.t_addnoise,
                delta_times=tuple(delta_times) if delta_times else None,
                ignore_timesteps=a.ignore_timesteps,
                sample_type=a.sample_type, dt_lambda=a.dt_lambda,
                dt_end=a.dt_end, collect=collect,
            )
            coeff_items = list(hs_coeff_list) if hs_coeff_list else [None]
            # multi-coefficient sweeps batch into ONE compiled chain: all
            # coefficients share xT and the frozen params, and hs_coeff is
            # an EditState leaf — stacking the sweep along the batch axis
            # replaces N sequential chains with ~N/chunk dispatches at
            # batch-efficiency (the reference serializes one full chain per
            # coefficient, diffusion_latent.py:500-534 x :726-755). Linear
            # injections only; spatial meshes, process dumps, and the
            # slerp/mask styles keep the per-coefficient loop.
            can_batch = (
                len(coeff_items) > 1
                and (
                    edit.mode == "deltablock"
                    or (edit.mode == "input" and edit.input_style == "add")
                )
                and not getattr(a, "save_process_delta_h", False)
                and not (self.sp or self.tp_spatial)
                and not os.environ.get("ASYRP_TPU_NO_BATCHED_SWEEP")
            )
            if can_batch:
                new_rows, h_new = self._batched_sweep(
                    run, params, edit, x_lat, coeff_items, rng,
                    collect_delta=collect_delta,
                )
                rows += new_rows
                if collect_delta:
                    harvested = h_new if harvested is None else harvested + h_new
            else:
                for coeff in coeff_items:
                    if coeff is None:
                        # no sweep: pass the already-committed/replicated
                        # edit through untouched (a host round-trip +
                        # uncommitted hs_coeff leaf here cost a slow relay
                        # dispatch PER batch)
                        e = edit
                    else:
                        e = dataclasses.replace(
                            edit,
                            hs_coeff=self._replicate(
                                jnp.asarray(coeff, jnp.float32)
                            ),
                        )
                    x, ys = run(params, e, x_dev, rng)
                    rows.append(pmesh.fetch(x)[:n_real])
                    if collect_delta:
                        # [S, B, h, w, C], un-padded batch; SUMMED over
                        # coeff passes — the reference accumulates
                        # delta_h_dict[t] += delta_h inside the per-hs_coeff
                        # loop and divides by the image count only
                        # (diffusion_latent.py:528-532, :811-815)
                        h_new = pmesh.fetch(ys["delta_h"])[:, :n_real]
                        harvested = (
                            h_new if harvested is None else harvested + h_new
                        )
                    if getattr(a, "save_process_delta_h", False):
                        self._dump_process(
                            ys, seq, folder, file_name, "delta_h", n_real
                        )

        if not rows:
            raise ValueError(
                "nothing to draw: --pass_editing (or edit=None) with neither "
                "--save_x0 nor --save_x_origin leaves zero grid rows — the "
                "reference crashes on the same combination (torch.cat over an "
                "empty x_list, diffusion_latent.py:539)"
            )
        grid = np.concatenate(rows, axis=0)
        out = os.path.join(folder, f"{file_name}_ngen{a.n_train_step}.png")
        save_image(grid, out, nrow=max(1, x_lat.shape[0]), pm1=True)
        log.info("%s saved (%d rows)", out, len(rows))
        return harvested

    def _batched_sweep(
        self, run, params, edit, x_lat, coeffs, rng, *, collect_delta
    ):
        """Evaluate a multi-coefficient sweep as batched chains.

        Tiles xT n_coeff times along the batch axis and attaches PER-SAMPLE
        hs_coeff rows ([B, K] — models/delta.apply_edit broadcasts per
        sample), chunked so each dispatch stays near the conv-bound
        batch-efficiency knee (ASYRP_TPU_SWEEP_MAX_BATCH, default 16; every
        chunk is padded to the same size so ONE compiled program serves the
        whole sweep). Returns (rows, harvested) shaped exactly like the
        per-coefficient loop's output. Eta-boost noise is drawn per batched
        sample, where the loop reuses the same rng per pass — identical
        whenever the boost window is off (the deterministic default)."""
        a = self.args
        x_lat = np.asarray(x_lat)
        b = x_lat.shape[0]
        cap = max(b, int(os.environ.get("ASYRP_TPU_SWEEP_MAX_BATCH", "16")))
        group = max(1, cap // b)
        rows, harvested = [], None
        coeff_arr = np.asarray(coeffs, np.float32)  # [N, K]
        for ofs in range(0, len(coeffs), group):
            chunk = coeff_arr[ofs : ofs + group]
            n = chunk.shape[0]
            if n < group and ofs:  # pad the tail chunk: reuse the compile
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], group - n, axis=0)]
                )
            xt = np.tile(x_lat, (chunk.shape[0], 1, 1, 1))
            per_sample = np.repeat(chunk, b, axis=0)  # [n*B, K]
            x_dev, _ = self._put_padded(xt)
            if x_dev.shape[0] != per_sample.shape[0]:  # mesh batch padding
                pad = x_dev.shape[0] - per_sample.shape[0]
                per_sample = np.concatenate(
                    [per_sample, np.repeat(per_sample[-1:], pad, axis=0)]
                )
            e = dataclasses.replace(
                edit, hs_coeff=self._put(jnp.asarray(per_sample))
            )
            x, ys = run(params, e, x_dev, rng)
            xs = pmesh.fetch(x)[: n * b].reshape((n, b) + x_lat.shape[1:])
            rows += list(xs)
            if collect_delta:
                h = pmesh.fetch(ys["delta_h"])[:, : n * b]  # [S, n*B, ...]
                h = h.reshape((h.shape[0], n, b) + h.shape[2:]).sum(axis=1)
                harvested = h if harvested is None else harvested + h
        return rows, harvested

    def _cached_engine(self, kind: str, seq: tuple, **kw):
        """Engines are compiled programs — one compilation must serve the
        whole run (save_grid is called per batch). Cache by configuration."""
        key = (kind, seq, tuple(sorted(kw.items())))
        if key not in self._engine_cache:
            if kind == "gen":
                self._engine_cache[key] = engine.make_generate(
                    self.spec, self.schedule, list(seq),
                    compute_dtype=self.compute_dtype, **kw,
                )
            else:
                dt = kw["delta_times"]
                rest = {k: v for k, v in kw.items() if k != "delta_times"}
                self._engine_cache[key] = engine.make_edit_generate(
                    self.spec, self.schedule, list(seq),
                    delta_times=list(dt) if dt else None,
                    compute_dtype=self.compute_dtype, **rest,
                )
        return self._engine_cache[key]

    def _dump_process(self, ys, seq, folder, file_name, tag, n_real=None):
        """Per-step [x; x0_t] grids (diffusion_latent.py:485-489, 523-527)."""
        from asyrp_official_tpu.core.steptable import generation_table

        out_dir = os.path.join(folder, file_name)
        os.makedirs(out_dir, exist_ok=True)
        ts = generation_table(seq).t
        xs, x0s = pmesh.fetch(ys["x"])[:, :n_real], pmesh.fetch(ys["x0_t"])[:, :n_real]
        for i, t in enumerate(ts):
            frame = np.concatenate([xs[i], x0s[i]], axis=0)
            save_image(
                frame, os.path.join(out_dir, f"{tag}_{int(t)}.png"),
                nrow=xs.shape[1], pm1=True,
            )

    @staticmethod
    def _parse_target_ids(target_image_id) -> Optional[List[int]]:
        if not target_image_id:
            return None
        if isinstance(target_image_id, str):
            return [int(i) for i in target_image_id.split(" ")]
        return list(target_image_id)

    def _test_sweep(self, params, edit, seq_test):
        a = self.args
        pairs = self.get_pairs(params, "test")
        folder = self._dir(os.path.join(a.exp, "test_images"))
        for ofs in range(0, min(a.n_test_img, pairs["x_lat"].shape[0]), a.bs_train):
            xb = pairs["x_lat"][ofs : ofs + a.bs_train]
            x0b = pairs["x0"][ofs : ofs + a.bs_train]
            if xb.shape[0] != a.bs_train:
                break
            self.save_grid(
                params, edit, xb, seq_test,
                # last-image index, like the reference's save_image firing
                # at (step+1) % bs == 0 (diffusion_latent.py:427-436)
                file_name=f"test_{ofs + a.bs_train - 1}_{a.n_iter - 1}",
                folder=folder, x0=x0b,
            )

    # ------------------------------------------------------------------
    # inference (run_test, diffusion_latent.py:547-874)
    # ------------------------------------------------------------------
    def run_test(self):
        a = self.args
        self.set_interval()
        seq_train, _ = train_seq(a.n_train_step, a.t_0, self.t_edit)
        seq_test = (
            uniform_seq(a.n_test_step, a.t_0)
            if a.n_test_step
            else list(range(0, a.t_0))  # n_test_step=0 would make the reference's
            # linspace grid EMPTY (diffusion_latent.py:570); fall back to
            # the full grid, mirroring seq_train's 'No skip' (:564-566)
        )
        seq_test_edit = [t for t in seq_test if t >= self.t_edit]
        advisory = serving_batch_advisory(a.bs_train, len(seq_test))
        if advisory:
            log.warning(advisory)
        params = self.load_pretrained()

        # 'no skip' (0) falls back to the t_0-length grid actually built
        # above — the scaling denominator must match the grid in use (the
        # reference divides n_train/n_test directly, :626, and crashes on 0)
        n_train_eff = a.n_train_step or a.t_0
        n_test_eff = a.n_test_step or a.t_0
        scaling = n_train_eff / n_test_eff * a.hs_coeff_delta_h

        # checkpoint resolution (diffusion_latent.py:594-610)
        if getattr(a, "manual_checkpoint_name", None):
            save_names = [os.path.join(self._dir("checkpoint"), a.manual_checkpoint_name)]
        elif getattr(a, "choose_checkpoint_num", None):
            save_names = [self._ckpt_path(a.n_iter - 1, a.choose_checkpoint_num)]
        else:
            save_names = [self._ckpt_path(a.n_iter - 1)]

        # multi-attribute (diffusion_latent.py:630-655)
        if getattr(a, "multiple_attr", None):
            attrs = a.multiple_attr.split(" ")
            coeffs = [1.0] * len(attrs)
            if getattr(a, "multiple_hs_coeff", None):
                given = [float(c) for c in a.multiple_hs_coeff.split(" ")]
                coeffs = given + [1.0] * (len(attrs) - len(given))
            save_names = [save_names[0].replace("attribute", attr) for attr in attrs]
            max_cos, max_attr = 0.0, attrs[0]
            if self.clip_ctx is not None:
                for attr in attrs:
                    s, t = assets.src_trg_prompts()[attr]
                    c = self.clip_ctx.text_cosine(s, t)
                    if c > max_cos:
                        max_cos, max_attr = c, attr
            self.src_txts, self.trg_txts = assets.src_trg_prompts()[max_attr]
            self.set_interval()
            hs_coeff = tuple(
                [1.0 * a.hs_coeff_origin_h]
                + [(1.0 / len(attrs) ** 0.5) * scaling * c for c in coeffs]
            )
        else:
            hs_coeff = (1.0 * a.hs_coeff_origin_h, 1.0 * scaling)

        # load Δ checkpoint(s)
        edit = None
        mean_dh_pending = getattr(a, "num_mean_of_delta_hs", 0)
        latent_path = os.path.join(
            self._dir("checkpoint_latent"),
            f"{os.path.split(a.exp)[-1]}_{a.n_test_step}_{mean_dh_pending}.pth",
        )
        if mean_dh_pending and os.path.isfile(latent_path):
            loaded = delta_ckpt.load_delta_checkpoint(latent_path)
            edit = self._edit_from_rows(loaded["delta_rows"], hs_coeff, seq_test)
            mean_dh_pending = 0
        elif os.path.exists(save_names[0]):
            if a.train_delta_block:
                blocks = []
                for name in save_names:
                    loaded = delta_ckpt.load_delta_checkpoint(name)
                    blocks.append(jax.tree.map(jnp.asarray, loaded["blocks"][0]))
                edit = EditState(
                    blocks=tuple(blocks), hs_coeff=jnp.asarray(hs_coeff, jnp.float32),
                    flavor=self.spec.delta_flavor, ignore_timestep=a.ignore_timesteps,
                )
            elif a.train_delta_h:
                loaded = delta_ckpt.load_delta_checkpoint(save_names[0])
                rows_dict = loaded["delta_rows"]
                # train→test grid remap (diffusion_latent.py:700-723)
                if a.ignore_timesteps:
                    remapped = {0: rows_dict[0]}
                elif a.n_train_step != a.n_test_step:
                    remapped, idx = {}, 0
                    interval = seq_train[1] - seq_train[0] if len(seq_train) > 1 else 0
                    for t in seq_test_edit:
                        remapped[t] = rows_dict[seq_train[idx]]
                        if t > seq_train[idx] - interval and idx < len(seq_train) - 1:
                            idx += 1
                else:
                    remapped = rows_dict
                edit = self._edit_from_rows(remapped, hs_coeff, seq_test)
            else:
                raise ValueError(
                    f"checkpoint {save_names[0]} exists but neither "
                    "--train_delta_block nor --train_delta_h was passed — "
                    "the flag selects how its contents are interpreted"
                )
        elif not mean_dh_pending:
            raise FileNotFoundError(f"checkpoint({save_names[0]}) does not exist!")
        if edit is not None:
            # commit/replicate the loaded Δ once, like the training and
            # fidelity paths — not per save_grid dispatch
            edit = self._replicate(edit)

        if mean_dh_pending and edit is None:
            # harvest mode: run with fresh DeltaBlocks? reference requires a
            # trained block checkpoint; harvest uses its delta outputs.
            raise FileNotFoundError(
                "mean-of-delta-hs requested but no trained checkpoint found"
            )

        # interpolation sweeps (diffusion_latent.py:726-755)
        hs_coeff_list = None
        if getattr(a, "delta_interpolation", False):
            vals = np.linspace(a.min_delta, a.max_delta, a.num_delta).tolist()
            if getattr(a, "multiple_attr", None) and len(hs_coeff) == 3:
                hs_coeff_list = [
                    (1.0, v1 * hs_coeff[1], v2 * hs_coeff[2])
                    for v1 in vals for v2 in vals
                ]
            else:
                hs_coeff_list = [
                    tuple([1.0] + [v * c for c in hs_coeff[1:]]) for v in vals
                ]

        folder = self._dir(os.path.join(a.exp, "test_images", str(a.n_test_step)))
        target_ids = self._parse_target_ids(getattr(a, "target_image_id", None))
        if target_ids is not None and a.bs_train != 1:
            # the loop below compares PER-IMAGE ids against the batch start
            # offset; with bs_train > 1 the ids would silently miss (or
            # drag in batch-mates) — the reference asserts the same
            # (diffusion_latent.py:781-782)
            raise ValueError(
                "target_image_id is only supported for bs_train == 1"
            )

        # reference iterates the TRAIN split first (harvesting mean-Δh
        # there, diffusion_latent.py:778-837), then the TEST split
        splits = []
        if a.do_train:
            splits.append(("train", a.n_train_img))
        if a.do_test:
            splits.append(("test", a.n_test_img))

        harvest_sum: Optional[np.ndarray] = None
        n_done = 0
        grid_ms: List[float] = []
        for mode, n_img in splits:
            pairs = self.get_pairs(params, mode)
            for ofs in range(0, min(n_img, pairs["x_lat"].shape[0]), a.bs_train):
                if target_ids is not None and ofs not in target_ids:
                    continue  # diffusion_latent.py:781-784 (bs_train == 1 mode)
                if getattr(a, "start_image_id", 0) > ofs:
                    continue  # diffusion_latent.py:785-786
                xb = pairs["x_lat"][ofs : ofs + a.bs_train]
                x0b = pairs["x0"][ofs : ofs + a.bs_train]
                if xb.shape[0] != a.bs_train:
                    break
                harvesting = bool(mean_dh_pending) and mode == "train"
                t_grid = time.perf_counter()
                h = self.save_grid(
                    params, edit, xb, seq_test,
                    # the reference names grids by the LAST image's loader
                    # index (save_image fires at (step+1)%bs==0,
                    # diffusion_latent.py:797-806) — match it so
                    # by-filename comparisons line up at bs_train > 1
                    file_name=f"{mode}_{ofs + a.bs_train - 1}_{a.n_iter - 1}",
                    folder=folder, hs_coeff_list=hs_coeff_list, x0=x0b,
                    collect_delta=harvesting,
                )
                grid_ms.append((time.perf_counter() - t_grid) * 1e3)
                if harvesting and h is not None:
                    s = h.sum(axis=1)  # [S, h, w, C] summed over batch
                    harvest_sum = s if harvest_sum is None else harvest_sum + s
                    n_done += xb.shape[0]
                    if n_done >= mean_dh_pending and ofs + a.bs_train >= n_img:
                        # reference quirk, preserved: its per-image loop
                        # BREAKS on the last train image BEFORE the
                        # mean-save check (diffusion_latent.py:803-806 vs
                        # :808-828), so num_mean_of_delta_hs >= n_train_img
                        # harvests everything and saves NOTHING — cross-
                        # executed in test_reference_product_parity.py
                        log.warning(
                            "mean-of-delta-hs harvest complete but NOT "
                            "saved: the harvest finished on the last train "
                            "image and the reference's loop breaks before "
                            "its save (diffusion_latent.py:803-828) — use "
                            "--num_mean_of_delta_hs < --n_train_img"
                        )
                        break
                    if n_done >= mean_dh_pending:
                        # per-t mean then global mean
                        # (diffusion_latent.py:810-835)
                        from asyrp_official_tpu.core.steptable import generation_table

                        tab = generation_table(seq_test, t_edit=self.t_edit)
                        per_t = harvest_sum / n_done
                        active = tab.use_delta > 0
                        global_mean = per_t[active].mean(axis=0)
                        rows = {
                            int(t): per_t[i]
                            for i, t in enumerate(tab.t) if active[i]
                        }
                        rows[0] = global_mean
                        delta_ckpt.save_delta_checkpoint(latent_path, delta_rows=rows)
                        log.info("mean-of-delta-h saved: %s", latent_path)
                        mean_dh_pending = 0
                        # 'now we use mean of delta_hs'
                        # (diffusion_latent.py:829-836): remaining images are
                        # edited with the harvested mean rows
                        edit = self._replicate(
                            self._edit_from_rows(rows, hs_coeff, seq_test)
                        )
        if len(grid_ms) > 1:
            # serving record: the first grid carries the chain compile; the
            # steady-state p50 over the rest is the honest per-batch cost
            # (save_grid ends in a host fetch — a real barrier through the
            # relay, unlike block_until_ready; CLAUDE.md)
            steady = sorted(grid_ms[1:])
            p50 = steady[len(steady) // 2]
            n_chain = len(seq_test)
            log.info(
                "serving: %d grids, first (incl. compile) %.0f ms; steady "
                "p50 %.0f ms/batch = %.0f ms/image = %.1f ms/gen-step "
                "(%d-step chain, bs %d)",
                len(grid_ms), grid_ms[0], p50, p50 / a.bs_train,
                p50 / a.bs_train / n_chain, n_chain, a.bs_train,
            )
        return edit

    # ------------------------------------------------------------------
    # fidelity runbook (the BASELINE acceptance gate: LPIPS <= 0.01 vs the
    # torch reference's outputs on real weights)
    # ------------------------------------------------------------------
    def run_fidelity(self):
        """Real-weights fidelity gate: invert→edit every test image through
        the fused serving engine (pipelines/engine.make_invert_edit) with a
        trained/released Δ checkpoint, write per-image outputs, and — given
        --fidelity_ref_dir with the torch reference's outputs (same file
        names) — emit the pipelines/fidelity LPIPS report.

        In a weights-less environment this fails FAST, reporting every
        missing artifact at once (the runbook's shopping list)."""
        a = self.args
        missing = []
        route = _route_key(self.config)
        if (
            not getattr(a, "model_path", None)
            and not getattr(a, "download_weights", False)
            and not getattr(a, "allow_random_weights", False)
        ):
            missing.append(
                f"base diffusion ckpt: --model_path <ckpt> "
                f"(URL: {PRETRAINED_URLS.get(route)}) or --download_weights"
            )
        elif getattr(a, "model_path", None) and not os.path.exists(a.model_path):
            missing.append(
                f"base diffusion ckpt: --model_path {a.model_path!r} not found"
            )
        # same precedence as run_test / the reference (:594-610):
        # manual > choose_checkpoint_num > LC/exp name
        if getattr(a, "manual_checkpoint_name", None):
            ckpt = os.path.join(self._dir("checkpoint"), a.manual_checkpoint_name)
        elif getattr(a, "choose_checkpoint_num", None):
            ckpt = self._ckpt_path(a.n_iter - 1, a.choose_checkpoint_num)
        else:
            ckpt = self._ckpt_path(a.n_iter - 1)
        if not os.path.exists(ckpt):
            missing.append(
                f"trained Δ checkpoint: {ckpt} (35 released .pth ship in the "
                "reference repo's checkpoint/ — loadable as-is)"
            )
        ref_dir = getattr(a, "fidelity_ref_dir", None)
        if ref_dir and self.lpips_params is None:
            missing.append(
                "LPIPS weights: --lpips_ckpt (npz converted via "
                "losses.lpips_jax.params_from_torch from the lpips package's "
                "AlexNet + lin heads)"
            )
        if ref_dir and not os.path.isdir(ref_dir):
            missing.append(
                f"reference outputs: --fidelity_ref_dir {ref_dir!r} not found"
            )
        if missing:
            raise FileNotFoundError(
                "fidelity runbook is missing artifacts:\n  - "
                + "\n  - ".join(missing)
            )

        self.set_interval()
        params = self.load_pretrained()
        seq_inv = uniform_seq(a.n_inv_step, a.t_0)
        seq_test = uniform_seq(a.n_test_step, a.t_0)
        n_train_eff = a.n_train_step or a.t_0
        n_test_eff = a.n_test_step or a.t_0
        scaling = n_train_eff / n_test_eff * a.hs_coeff_delta_h
        loaded = delta_ckpt.load_delta_checkpoint(ckpt)
        if "blocks" not in loaded:
            raise ValueError(
                "the fidelity runbook expects a DeltaBlock checkpoint "
                "(train_delta_block flavor — the released format)"
            )
        edit = EditState(
            blocks=(jax.tree.map(jnp.asarray, loaded["blocks"][0]),),
            hs_coeff=jnp.asarray(
                (1.0 * a.hs_coeff_origin_h, 1.0 * scaling), jnp.float32
            ),
            flavor=self.spec.delta_flavor,
            ignore_timestep=a.ignore_timesteps,
        )
        run = engine.make_invert_edit(
            self.spec, self.schedule, seq_inv, seq_test,
            t_edit=self.t_edit, t_addnoise=self.t_addnoise,
            compute_dtype=self.compute_dtype,
        )

        from asyrp_official_tpu.configs.paths import DATASET_PATHS

        d = self.config["data"]
        paths = dict(DATASET_PATHS)
        paths.update(getattr(a, "dataset_paths", {}) or {})
        if d["category"] == "CUSTOM":
            paths["custom_train"] = a.custom_train_dataset_dir
            paths["custom_test"] = a.custom_test_dataset_dir
        _, test_ds = data.get_dataset(
            d["dataset"], paths, category=d["category"],
            image_size=d["image_size"],
        )
        out_dir = self._dir(os.path.join(a.exp, "fidelity"))
        if self.mesh is None:
            params = jax.device_put(params, jax.local_devices()[0])
        edit = self._replicate(edit)
        rng = jax.random.PRNGKey(a.seed)
        n = min(a.n_test_img, len(test_ds))
        for ofs in range(0, n, a.bs_train):
            idxs = list(range(ofs, min(ofs + a.bs_train, n)))
            x0 = np.stack([np.asarray(test_ds[i]) for i in idxs])
            x_dev, n_real = self._put_padded(x0)
            out = pmesh.fetch(run(params, edit, x_dev, rng))[:n_real]
            for k, i in enumerate(idxs):
                save_image(
                    out[k][None], os.path.join(out_dir, f"test_{i}.png"), pm1=True
                )
        log.info("fidelity outputs: %s (%d images)", out_dir, n)
        if not ref_dir:
            return {"out_dir": out_dir, "n": n}

        import json

        from asyrp_official_tpu.pipelines.fidelity import compare_output_dirs

        report = compare_output_dirs(out_dir, ref_dir, self.lpips_params)
        report_path = os.path.join(out_dir, "lpips_report.json")
        with open(report_path, "w") as f:
            json.dump(report, f, indent=1)
        log.info(
            "fidelity LPIPS mean=%.4f max=%.4f n=%d -> %s (gate: mean <= 0.01)",
            report["mean"], report["max"], report["n"], report_path,
        )
        return report

    def _edit_from_rows(self, rows_dict, hs_coeff, seq_test) -> EditState:
        a = self.args
        if a.ignore_timesteps:
            rows = jnp.asarray(np.stack([rows_dict[0]]))
            times = None
        else:
            times = [t for t in seq_test if t in rows_dict]
            rows = jnp.asarray(np.stack([rows_dict[t] for t in times]))
        e = EditState(
            mode="input", delta_rows=rows,
            hs_coeff=jnp.asarray(hs_coeff, jnp.float32),
            input_style=getattr(a, "delta_injection", "add"),
            ignore_timestep=a.ignore_timesteps,
            use_mask=getattr(a, "masked_h", False) or getattr(a, "use_mask", False),
            times=tuple(times) if times else None,
        )
        return e

    # ------------------------------------------------------------------
    # DiffStyle (--diff_style; parsed-but-undispatched in the reference —
    # built here from its surviving hooks, see pipelines/style_transfer.py)
    # ------------------------------------------------------------------
    def run_style_transfer(self):
        from asyrp_official_tpu.pipelines.style_transfer import make_style_transfer

        a = self.args
        self.set_interval()
        params = self.load_pretrained()
        d = self.config["data"]
        contents = data.ImageFolderDataset(a.content_dir, d["image_size"])
        styles = data.ImageFolderDataset(a.style_dir, d["image_size"])
        out_dir = self._dir(getattr(a, "save_dir", None) or os.path.join(a.exp, "style"))
        n_gen = getattr(a, "n_gen_step", 0) or a.n_test_step
        # ONE compilation of each engine for the whole C×S sweep, and each
        # content/style inverted exactly once (C+S inversions, C·S
        # generations); batch-1 images go through _put_padded so --dp
        # batch sharding survives (outputs sliced back to the real row)
        st = make_style_transfer(
            self.spec, self.schedule,
            n_inv_step=a.n_inv_step, n_gen_step=n_gen, t_0=a.t_0,
            t_edit=self.t_edit,
            hs_coeff=getattr(a, "hs_coeff", 0.9),
            use_mask=getattr(a, "use_mask", False),
            dt_lambda=a.dt_lambda, dt_end=a.dt_end,
            content_replace_step=getattr(a, "content_replace_step", 0),
            compute_dtype=self.compute_dtype,
        )
        content_lats = []
        for ci in range(len(contents)):
            xb, _ = self._put_padded(contents[ci][None])
            content_lats.append(st.invert_content(params, xb))
        for si in range(len(styles)):
            sb, _ = self._put_padded(styles[si][None])
            h_traj = st.invert_style(params, sb)
            for ci in range(len(contents)):
                stylized = st.generate(
                    params, content_lats[ci], h_traj,
                    rng=jax.random.PRNGKey(a.seed),
                )
                save_image(
                    pmesh.fetch(stylized)[0],
                    os.path.join(out_dir, f"content{ci}_style{si}.png"),
                    pm1=True,
                )
        log.info("style transfer results in %s", out_dir)

    # ------------------------------------------------------------------
    # lpips stage (diffusion_latent.py:1190-1303)
    # ------------------------------------------------------------------
    def run_lpips(self):
        from asyrp_official_tpu.pipelines.lpips_stage import compute_lpips_distance

        a = self.args
        if self.lpips_params is None:
            raise RuntimeError(
                "LPIPS weights required for the calibration stage "
                "(inject lpips_params or convert the lpips package ckpts)"
            )
        params = self.load_pretrained()
        d = self.config["data"]
        from asyrp_official_tpu.configs.paths import DATASET_PATHS

        paths = dict(DATASET_PATHS)
        paths.update(getattr(a, "dataset_paths", {}) or {})
        if d["category"] == "CUSTOM":
            paths["custom_train"] = a.custom_train_dataset_dir
            paths["custom_test"] = a.custom_test_dataset_dir
        train_ds, _ = data.get_dataset(
            d["dataset"], paths, category=d["category"], image_size=d["image_size"]
        )
        name = getattr(a, "custom_dataset_name", None) or _dataset_key(self.config)
        # the reference processes n_train_img + 1 images: its loop breaks on
        # `step == n_train_img` AFTER processing that step
        # (diffusion_latent.py:1276-1278) — preserved so the published
        # recipes produce the same averaged curves
        return compute_lpips_distance(
            self.spec, params, self.schedule, train_ds, self.lpips_params,
            n_img=a.n_train_img + 1, n_inv_step=a.n_inv_step, t_0=a.t_0,
            batch_size=a.bs_train, out_dir=self._dir("utils"),
            dataset_name=name, compute_dtype=self.compute_dtype,
            put=lambda c: self._put_padded(c)[0],
        )
