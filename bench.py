"""Benchmark: UNet forward evals/sec/chip @ 256x256 on the flagship model
(CelebA-HQ DDPM++, 113.7M params — the BASELINE.json primary metric).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline divides by the measured PyTorch-reference forward throughput
(torch 2.x CPU, batch 1, this machine: 6.603 s/eval = 0.1514 evals/sec —
measured 2026-08-16 with /root/reference models/ddpm DDPM on
configs/celeba.yml; the reference publishes no numbers of its own,
BASELINE.md).

Extra detail (batch sweep, p50 invert+edit latency) goes to stderr so
stdout stays a single JSON line.
"""
import json
import os
import sys
import time

# XLA's cpu_aot_loader writes machine-feature warnings to STDOUT, which
# would corrupt the one-JSON-line output contract — silence C++ logging.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

REFERENCE_TORCH_CPU_EVALS_PER_SEC = 0.1514


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    # NOTE: the persistent compilation cache is intentionally NOT enabled —
    # with the axon remote-compile tunnel it stalled compiles indefinitely.
    import jax.numpy as jnp
    import numpy as np

    from asyrp_official_tpu.core.schedule import make_schedule, uniform_seq
    from asyrp_official_tpu.models.delta import EditState, delta_block_init
    from asyrp_official_tpu.models.registry import resolve
    from asyrp_official_tpu.parallel.packing import PackedSpec
    from asyrp_official_tpu.pipelines import engine

    dev = jax.devices()[0]
    log(f"device: {dev}, backend: {jax.default_backend()}")

    spec = resolve("CelebA_HQ")
    # init on the CPU backend: param init is hundreds of tiny random kernels,
    # which are pathologically slow through the axon remote-compile tunnel
    t0 = time.perf_counter()
    with jax.default_device(jax.devices("cpu")[0]):
        params = spec.init(jax.random.PRNGKey(0))
        params = jax.block_until_ready(params)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    # pack the 450 param leaves into ONE device buffer: per-buffer dispatch
    # marshalling otherwise dominates (measured 2630 ms → 12.8 ms per call)
    spec = PackedSpec(spec, params)
    params = spec.pack(params)  # host-aware: ONE committed transfer
    log(f"flagship params: {n_params/1e6:.1f}M (init {time.perf_counter()-t0:.1f}s)")

    compute_dtype = jnp.bfloat16

    @jax.jit
    def fwd(params, x, t):
        eps, *_ = spec.apply(params, x.astype(compute_dtype), t)
        # cast back to f32 like the engines do: keeps the chained-call input
        # signature stable (a bf16 return would change the arg dtype on the
        # second iteration and trigger a recompile inside the timed loop)
        return eps.astype(jnp.float32)

    def force(arr):
        # block_until_ready is unreliable through the axon relay — a
        # host fetch of a reduction is the only honest completion barrier
        return float(jnp.sum(arr))

    trace_dir = os.environ.get("ASYRP_TPU_TRACE")
    if trace_dir:
        jax.profiler.start_trace(trace_dir)
        log(f"profiler trace -> {trace_dir}")

    best = 0.0
    best_bsz = 0
    for bsz in (8,):
        # inputs MUST be explicitly committed (device_put) — uncommitted
        # arrays take a ~50x slower dispatch path through the axon relay
        x = jax.device_put(
            jnp.asarray(np.random.RandomState(0).randn(bsz, 256, 256, 3), jnp.float32),
            dev,
        )
        t = jax.device_put(jnp.full((bsz,), 500.0, jnp.float32), dev)
        force(fwd(params, x, t))  # compile + warmup
        iters = 10
        t0 = time.perf_counter()
        out = x
        for _ in range(iters):
            out = fwd(params, out, t)  # chained: no fake pipelining
        force(out)
        dt = (time.perf_counter() - t0) / iters
        eps_s = bsz / dt
        log(f"bsz={bsz}: {dt*1e3:.1f} ms/iter -> {eps_s:.2f} evals/sec")
        if eps_s > best:
            best, best_bsz = eps_s, bsz

    # secondary: p50 40-step invert+edit latency per image, via the FUSED
    # single-dispatch serving engine (pipelines/engine.make_invert_edit —
    # one compiled program, one dispatch, one completion fetch)
    p50_ms = None
    try:
        sched = make_schedule()
        seq = uniform_seq(40, 999)
        with jax.default_device(jax.devices("cpu")[0]):
            block = delta_block_init(
                jax.random.PRNGKey(1), spec.bottleneck_ch, spec.temb_ch
            )
        block = jax.device_put(block, dev)
        # the WHOLE EditState must be committed — an uncommitted hs_coeff
        # leaf takes the slow relay dispatch path on every timed call
        edit = jax.device_put(
            EditState(blocks=(block,), hs_coeff=jnp.array([1.0, 1.0])), dev
        )
        run = engine.make_invert_edit(
            spec, sched, seq, seq, t_edit=516, t_addnoise=200,
            compute_dtype=compute_dtype,
        )
        x = jax.device_put(
            jnp.asarray(np.random.RandomState(1).randn(1, 256, 256, 3), jnp.float32),
            dev,
        )
        # keys built + committed OUTSIDE the timed region
        keys = [jax.device_put(jax.random.PRNGKey(i), dev) for i in range(15)]
        force(run(params, edit, x, keys[0]))  # compile + warmup
        lats = []
        for i in range(15):
            t0 = time.perf_counter()
            out = run(params, edit, x, keys[i])
            force(out)
            lats.append(time.perf_counter() - t0)
        lats.sort()
        p50_ms = lats[len(lats) // 2] * 1e3
        log(
            f"p50 40-step invert+edit (fused, n=15): {p50_ms:.0f} ms/image "
            f"(min {lats[0]*1e3:.0f}, max {lats[-1]*1e3:.0f})"
        )

        # per-op-class attribution at batch 1 (stderr): where the chain time
        # goes — plain-eval floor vs dual-decode premium vs scan overhead
        invert = engine.make_invert(spec, sched, seq, compute_dtype=compute_dtype)
        force(invert(params, x)[0])
        t0 = time.perf_counter()
        for _ in range(3):
            x_lat, _ = invert(params, x)
        force(x_lat)
        inv_ms = (time.perf_counter() - t0) / 3 * 1e3
        genl = engine.make_edit_generate(
            spec, sched, seq, t_edit=516, t_addnoise=200,
            compute_dtype=compute_dtype,
        )
        force(genl(params, edit, x, jax.random.PRNGKey(0))[0])
        t0 = time.perf_counter()
        for i in range(3):
            xe, _ = genl(params, edit, x, jax.random.PRNGKey(i))
        force(xe)
        edit_ms = (time.perf_counter() - t0) / 3 * 1e3
        for bsz in (1, 2):
            xb = jax.device_put(
                jnp.asarray(np.random.RandomState(2).randn(bsz, 256, 256, 3),
                            jnp.float32), dev,
            )
            tb = jax.device_put(jnp.full((bsz,), 500.0, jnp.float32), dev)
            force(fwd(params, xb, tb))
            t0 = time.perf_counter()
            o = xb
            for _ in range(8):
                o = fwd(params, o, tb)
            force(o)
            ms = (time.perf_counter() - t0) / 8 * 1e3
            log(f"plain fwd bsz={bsz}: {ms:.1f} ms ({ms/bsz:.1f} ms/eval)")
        log(
            f"breakdown: invert(39 evals)={inv_ms:.0f} ms, "
            f"edit(40 steps, dual>=t_edit)={edit_ms:.0f} ms, "
            f"fused p50={p50_ms:.0f} ms"
        )
    except Exception as e:  # secondary metric must never kill the primary
        log(f"latency bench skipped: {type(e).__name__}: {e}")

    if trace_dir:
        jax.profiler.stop_trace()

    result = {
        "metric": "unet_fwd_evals_per_sec_chip_256",
        "value": round(best, 3),
        "unit": f"evals/s (bf16, bsz={best_bsz})",
        "vs_baseline": round(best / REFERENCE_TORCH_CPU_EVALS_PER_SEC, 2),
    }
    if p50_ms is not None:
        result["p50_invert_edit_ms"] = round(p50_ms, 1)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
    os._exit(0)  # skip the axon backend's slow teardown
