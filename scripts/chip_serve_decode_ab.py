"""On-chip A/B: serving dual-decode shape — 2B-stacked vs split (B + B).

Training already forces decode_mode="split" (the plain decode's backward
dead-code-eliminates; pipelines/train.py, BASELINE.md round 4). Serving is
forward-only, so the only effect is the conv batch shape: at serving batch
B the stacked dual decode runs the decoder at conv batch 2B, the split form
twice at conv batch B. Conv batch efficiency is non-monotonic on the v5e
relay chip (13.8/16.3/15.9/8.2 ms per eval at conv batch 1/2/4/8,
BASELINE.md round 2), so which shape wins depends on B.

Measures, auto vs ASYRP_TPU_SERVE_DECODE=split:
  * fused invert+edit at serving batch 8 (conv batch 16 vs 8+8)
  * the batched 8-coefficient sweep chain (same shapes, edit-only)

Usage: python scripts/chip_serve_decode_ab.py   (one TPU process at a time)
"""
import os
import sys
import time

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import acquire_device, log  # bounded-retry backend acquisition


def main():
    dev = acquire_device()

    import dataclasses as dc

    import jax
    import jax.numpy as jnp
    import numpy as np

    from asyrp_official_tpu.core.schedule import make_schedule, uniform_seq
    from asyrp_official_tpu.models.delta import EditState, delta_block_init
    from asyrp_official_tpu.models.registry import resolve
    from asyrp_official_tpu.parallel.packing import PackedSpec
    from asyrp_official_tpu.pipelines import engine

    def force(arr):
        return float(jnp.sum(arr.astype(jnp.float32)))

    raw_spec = resolve("CelebA_HQ")
    t0 = time.perf_counter()
    with jax.default_device(jax.devices("cpu")[0]):
        params_host = raw_spec.init(jax.random.PRNGKey(0))
        params_host = jax.block_until_ready(params_host)
    spec = PackedSpec(raw_spec, params_host)
    params = spec.pack(params_host)
    log(f"params packed ({time.perf_counter()-t0:.1f}s)")

    sched = make_schedule()
    seq = uniform_seq(40, 999)
    with jax.default_device(jax.devices("cpu")[0]):
        block = delta_block_init(
            jax.random.PRNGKey(1), spec.bottleneck_ch, spec.temb_ch
        )
    block = jax.device_put(block, dev)
    edit = jax.device_put(
        EditState(blocks=(block,), hs_coeff=jnp.array([1.0, 1.0])), dev
    )

    results = {}
    for mode in ("auto", "split"):
        if mode == "auto":
            os.environ.pop("ASYRP_TPU_SERVE_DECODE", None)
        else:
            os.environ["ASYRP_TPU_SERVE_DECODE"] = mode

        # ---- fused invert+edit, serving batch 8 ----
        run = engine.make_invert_edit(
            spec, sched, seq, seq, t_edit=516, t_addnoise=200,
            compute_dtype=jnp.bfloat16,
        )
        xb = jax.device_put(
            jnp.asarray(np.random.RandomState(3).randn(8, 256, 256, 3),
                        jnp.float32), dev)
        keys = [jax.device_put(jax.random.PRNGKey(100 + i), dev)
                for i in range(6)]
        t0 = time.perf_counter()
        force(run(params, edit, xb, keys[0]))
        log(f"[{mode}] bs8 fused compile+warmup {time.perf_counter()-t0:.0f}s")
        t0 = time.perf_counter()
        for i in range(5):
            out = run(params, edit, xb, keys[i + 1])
        force(out)
        dt = (time.perf_counter() - t0) / 5 * 1e3
        results[f"bs8_fused_{mode}_ms"] = dt
        log(f"[{mode}] fused invert+edit bs8: {dt:.0f} ms/batch "
            f"({8e3/dt:.2f} images/s)")

        # ---- batched 8-coefficient sweep (edit-only chain, bs 8) ----
        gen = engine.make_edit_generate(
            spec, sched, seq, t_edit=516, t_addnoise=200,
            compute_dtype=jnp.bfloat16,
        )
        coeffs = np.linspace(0.0, 1.0, 8)
        cs = jnp.stack([jnp.ones(8), jnp.asarray(coeffs, jnp.float32)], axis=1)
        eb = jax.device_put(dc.replace(edit, hs_coeff=cs), dev)
        x1 = jax.device_put(
            jnp.asarray(np.random.RandomState(4).randn(1, 256, 256, 3),
                        jnp.float32), dev)
        xs = jax.device_put(jnp.tile(x1, (8, 1, 1, 1)), dev)
        k = jax.device_put(jax.random.PRNGKey(7), dev)
        t0 = time.perf_counter()
        force(gen(params, eb, xs, k)[0])
        log(f"[{mode}] sweep compile+warmup {time.perf_counter()-t0:.0f}s")
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            out, _ = gen(params, eb, xs, k)
            force(out)
            ts.append(time.perf_counter() - t0)
        ts.sort()
        dt = ts[len(ts) // 2] * 1e3
        results[f"sweep8_batched_{mode}_ms"] = dt
        log(f"[{mode}] batched 8-coeff sweep: p50 {dt:.0f} ms "
            f"({8e3/dt:.2f} sweep-images/s)")

    log("---- summary ----")
    for k_, v in results.items():
        log(f"{k_}: {v:.1f}")
    for key in ("bs8_fused", "sweep8_batched"):
        a, s = results[f"{key}_auto_ms"], results[f"{key}_split_ms"]
        log(f"{key}: split is {a/s:.3f}x vs stacked "
            f"({'split wins' if s < a else 'stacked wins'})")
    os._exit(0)  # skip backend teardown (hangs ~2.5 min through the relay)


if __name__ == "__main__":
    main()
