"""Serving example: minimal production-style edit server loop.

Shows the performance-critical deployment recipe:
  * params converted once, packed into ONE device buffer (PackedSpec);
  * the whole invert + asymmetric-edit trajectory as ONE jitted dispatch
    (`engine.make_invert_edit`);
  * inputs explicitly committed with jax.device_put;
  * bf16 UNet compute, f32 trajectory math;
  * batched requests padded to a fixed batch size (one compilation).

Run (random weights demo):  python examples/serve_edit.py --demo
With real weights:          python examples/serve_edit.py \
    --model_path pretrained/celeba_hq.ckpt \
    --delta_ckpt checkpoint/smiling_LC_CelebA_HQ_t999_ninv40_ngen40_0.pth \
    --images img1.png img2.png --out out/

Cold-start elimination: `--export serve.bin` serializes the compiled
program (pipelines/export.py, jax.export) instead of serving;
`--load serve.bin` serves from the artifact — no tracing, no model code
on the serving path.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path")
    ap.add_argument("--delta_ckpt")
    ap.add_argument("--images", nargs="*", default=[])
    ap.add_argument("--out", default="out")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--n_step", type=int, default=40)
    ap.add_argument("--t_edit", type=int, default=513)
    ap.add_argument("--t_addnoise", type=int, default=167)
    ap.add_argument("--demo", action="store_true")
    ap.add_argument("--tiny", action="store_true",
                    help="32px two-level demo model (CI-runnable recipe check)")
    ap.add_argument("--export", metavar="PATH",
                    help="serialize the serving program to PATH and exit")
    ap.add_argument("--load", metavar="PATH",
                    help="serve from an AOT artifact written by --export")
    args = ap.parse_args()

    import asyrp_official_tpu as asyrp
    from asyrp_official_tpu.data.imageio import save_image
    from asyrp_official_tpu.data.native_loader import decode_resize_batch
    from asyrp_official_tpu.models.delta import EditState, delta_block_init
    from asyrp_official_tpu.parallel.packing import PackedSpec

    dev = jax.devices()[0]
    if args.tiny:
        from asyrp_official_tpu.runner import spec_from_config
        from asyrp_official_tpu.utils.tinyws import TINY_DDPMPP_CONFIG

        spec0 = spec_from_config(TINY_DDPMPP_CONFIG)
    else:
        spec0 = asyrp.resolve("CelebA_HQ")

    if args.model_path:
        from asyrp_official_tpu.compat.torch_convert import load_state_dict_numpy

        params0 = spec0.params_from_torch(load_state_dict_numpy(args.model_path))
    else:
        assert args.demo, "pass --model_path or --demo"
        with jax.default_device(jax.devices("cpu")[0]):
            params0 = spec0.init(jax.random.PRNGKey(0))

    if args.delta_ckpt:
        from asyrp_official_tpu.compat.delta_ckpt import load_delta_checkpoint

        block = load_delta_checkpoint(args.delta_ckpt)["blocks"][0]
        block = jax.tree.map(jnp.asarray, block)
    else:
        with jax.default_device(jax.devices("cpu")[0]):
            block = delta_block_init(
                jax.random.PRNGKey(1), spec0.bottleneck_ch, spec0.temb_ch
            )
    edit = jax.device_put(
        EditState(blocks=(block,), hs_coeff=jnp.array([1.0, 1.0])), dev
    )

    # pack once; serve many
    spec = PackedSpec(spec0, params0)
    params = spec.pack(params0)  # host-aware: ONE committed transfer

    sched = asyrp.make_schedule()
    seq = asyrp.uniform_seq(args.n_step, 999)
    from asyrp_official_tpu.pipelines import engine

    if args.export:
        from asyrp_official_tpu.pipelines.export import (
            export_invert_edit, save_serving,
        )

        artifact, meta = export_invert_edit(
            spec, sched, seq, seq, params, edit,
            t_edit=args.t_edit, t_addnoise=args.t_addnoise,
            batch=args.batch, image_size=spec.resolution,
            compute_dtype=jnp.bfloat16,
            platforms=[jax.default_backend()],
        )
        save_serving(args.export, artifact, meta)
        print(f"exported {len(artifact)} bytes -> {args.export}")
        return
    if args.load:
        from asyrp_official_tpu.pipelines.export import load_serving

        serve = load_serving(args.load)
        if serve.meta["batch"] != args.batch:
            print(f"artifact was lowered for batch {serve.meta['batch']}; "
                  f"overriding --batch {args.batch}")
            args.batch = serve.meta["batch"]
    else:
        serve = engine.make_invert_edit(
            spec, sched, seq, seq, t_edit=args.t_edit,
            t_addnoise=args.t_addnoise, compute_dtype=jnp.bfloat16,
        )

    # request batch
    if args.images:
        batch_np = decode_resize_batch(args.images, spec.resolution)
    else:
        batch_np = np.random.RandomState(0).randn(
            args.batch, spec.resolution, spec.resolution, 3
        ).astype(np.float32) * 0.3
    from asyrp_official_tpu.parallel.mesh import pad_to_multiple

    batch_np, real = pad_to_multiple(batch_np, args.batch)

    # serve in fixed-size chunks: ONE compilation covers any request count
    results = []
    t_first = None
    for ofs in range(0, batch_np.shape[0], args.batch):
        x = jax.device_put(jnp.asarray(batch_np[ofs : ofs + args.batch]), dev)
        t0 = time.perf_counter()
        out_np = np.asarray(serve(params, edit, x, jax.random.PRNGKey(ofs)))
        dt = time.perf_counter() - t0
        if t_first is None:
            t_first = dt
            print(f"first call (incl. compile): {dt:.1f}s")
        else:
            print(f"steady state: {dt * 1e3:.0f} ms/batch of {args.batch}")
        results.append(out_np)
    out_np = np.concatenate(results)[:real]

    os.makedirs(args.out, exist_ok=True)
    for i in range(real):
        save_image(out_np[i], os.path.join(args.out, f"edited_{i}.png"), pm1=True)
    print(f"wrote {real} edited images to {args.out}/")


if __name__ == "__main__":
    main()
    os._exit(0)  # skip slow backend teardown
