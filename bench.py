"""Benchmark: UNet forward evals/sec/chip @ 256x256 on the flagship model
(CelebA-HQ DDPM++, 113.7M params — the BASELINE.json primary metric).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

vs_baseline divides by the measured PyTorch-reference forward throughput
(torch 2.x CPU, batch 1, this machine: 6.603 s/eval = 0.1514 evals/sec —
measured 2026-08-16 with /root/reference models/ddpm DDPM on
configs/celeba.yml; the reference publishes no numbers of its own,
BASELINE.md).

Cross-round comparability (VERDICT r2 item 5): the relay chip's throttle
varies per session (raw-matmul probe has read 24.9 / 59.8 / ~80 TFLOP/s
across rounds — BASELINE.md), so the JSON also carries a same-session
raw-matmul probe and the compiled-program FLOP counts, letting a reader
normalize evals/s numbers across throttle states.

Extra detail (latency percentiles, breakdowns) goes to stderr so stdout
stays a single JSON line.
"""
import json
import os
import sys
import time

# XLA's cpu_aot_loader writes machine-feature warnings to STDOUT, which
# would corrupt the one-JSON-line output contract — silence C++ logging.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

REFERENCE_TORCH_CPU_EVALS_PER_SEC = 0.1514
BACKEND_ATTEMPTS = 5
BACKEND_BACKOFF_S = 60
# a single failing init attempt has been measured to BLOCK ~25 min inside
# the relay before raising UNAVAILABLE — cap total acquisition time so the
# driver sees a clean rc=1 + log instead of an external timeout kill
BACKEND_TOTAL_BUDGET_S = 2100


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def acquire_device():
    """Bounded-retry backend acquisition (VERDICT r2 item 1).

    BENCH_r02 died rc=1 on a transient relay "UNAVAILABLE" at backend init
    with no retry, zeroing the round's scoreboard. jax 0.9 does NOT cache a
    failed non-quiet backend init (xla_bridge._backends stays empty when the
    factory raises), so re-calling jax.devices() re-runs initialization.
    """
    import jax

    errors = []
    start = time.monotonic()
    for attempt in range(1, BACKEND_ATTEMPTS + 1):
        t0 = time.monotonic()
        try:
            dev = jax.devices()[0]
            log(f"device: {dev}, backend: {jax.default_backend()} "
                f"(attempt {attempt}/{BACKEND_ATTEMPTS}, "
                f"{time.monotonic() - t0:.0f}s)")
            return dev
        except RuntimeError as e:
            msg = (f"attempt {attempt}/{BACKEND_ATTEMPTS} "
                   f"(blocked {time.monotonic() - t0:.0f}s): {e}")
            errors.append(msg)
            log(f"backend init failed — {msg}")
            elapsed = time.monotonic() - start
            if elapsed + BACKEND_BACKOFF_S > BACKEND_TOTAL_BUDGET_S:
                log(f"acquisition budget exhausted ({elapsed:.0f}s) — giving up")
                break
            if attempt < BACKEND_ATTEMPTS:
                log(f"retrying in {BACKEND_BACKOFF_S}s ...")
                time.sleep(BACKEND_BACKOFF_S)
    raise RuntimeError(
        "TPU backend unavailable after %d attempt(s), %.0fs total:\n%s"
        % (len(errors), time.monotonic() - start, "\n".join(errors))
    )


def compiled_flops(jitted, *args):
    """Total FLOPs of the compiled program, or None if XLA won't say."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):  # older jax returns [dict]
            ca = ca[0] if ca else {}
        f = ca.get("flops")
        return float(f) if f else None
    except Exception as e:
        log(f"cost_analysis unavailable: {type(e).__name__}: {e}")
        return None


def main():
    dev = acquire_device()

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
    from asyrp_official_tpu.utils import hostrng

    def force(arr):
        # block_until_ready is unreliable through the axon relay — a
        # host fetch of a reduction is the only honest completion barrier
        return float(jnp.sum(arr.astype(jnp.float32)))

    extras = {}

    # ---- same-session throttle probe: chained 4096^3 bf16 matmul --------
    # Ones in, /4096 out keeps the chained value exactly 1.0 (no bf16
    # overflow) while preserving the data dependency between iterations.
    try:
        n = 4096
        a = jax.device_put(jnp.ones((n, n), jnp.bfloat16), dev)

        @jax.jit
        def mm(x):
            return (x @ x) * (1.0 / n)

        force(mm(a))  # compile + warmup
        iters = 20
        t0 = time.perf_counter()
        out = a
        for _ in range(iters):
            out = mm(out)
        force(out)
        dt = (time.perf_counter() - t0) / iters
        probe_tflops = 2 * n**3 / dt / 1e12
        extras["probe_matmul_tflops"] = round(probe_tflops, 1)
        log(f"throttle probe: chained {n}^3 bf16 matmul {dt*1e3:.2f} ms "
            f"-> {probe_tflops:.1f} TFLOP/s")
    except Exception as e:
        log(f"throttle probe skipped: {type(e).__name__}: {e}")

    # ---- flagship model setup -------------------------------------------
    raw_spec = resolve("CelebA_HQ")
    # host-numpy init (utils/hostrng, bit-identical to jax.random): avoids
    # the thousands of one-off XLA compiles that made this 25-68 s
    # (VERDICT r4 weak #4 — was 67.9 s in BENCH_r04's tail)
    t0 = time.perf_counter()
    params_host = raw_spec.init(hostrng.PRNGKey(0))
    n_params = sum(x.size for x in jax.tree.leaves(params_host))
    # pack the 450 param leaves into ONE device buffer: per-buffer dispatch
    # marshalling otherwise dominates (measured 2630 ms → 12.8 ms per call)
    spec = PackedSpec(raw_spec, params_host)
    params = spec.pack(params_host)  # host-aware: ONE committed transfer
    log(f"flagship params: {n_params/1e6:.1f}M (init {time.perf_counter()-t0:.1f}s)")

    compute_dtype = jnp.bfloat16

    @jax.jit
    def fwd(params, x, t):
        eps, *_ = spec.apply(params, x.astype(compute_dtype), t)
        # cast back to f32 like the engines do: keeps the chained-call input
        # signature stable (a bf16 return would change the arg dtype on the
        # second iteration and trigger a recompile inside the timed loop)
        return eps.astype(jnp.float32)

    trace_dir = os.environ.get("ASYRP_TPU_TRACE")
    if trace_dir:
        jax.profiler.start_trace(trace_dir)
        log(f"profiler trace -> {trace_dir}")

    # ---- primary: UNet fwd evals/s @ bsz 8 ------------------------------
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
        fl = compiled_flops(fwd, params, x, t)
        if fl:
            extras["fwd_flops_per_eval"] = round(fl / bsz)
        iters = 10
        t0 = time.perf_counter()
        out = x
        for _ in range(iters):
            out = fwd(params, out, t)  # chained: no fake pipelining
        force(out)
        dt = (time.perf_counter() - t0) / iters
        eps_s = bsz / dt
        msg = f"bsz={bsz}: {dt*1e3:.1f} ms/iter -> {eps_s:.2f} evals/sec"
        if fl:
            msg += f" ({fl / dt / 1e12:.1f} TFLOP/s)"
        log(msg)
        if eps_s > best:
            best, best_bsz = eps_s, bsz

    # ---- secondary: p50 40-step invert+edit latency, batch 1 ------------
    # via the FUSED single-dispatch serving engine (pipelines/engine.
    # make_invert_edit — one compiled program, one dispatch, one fetch)
    p50_ms = None
    run = None
    edit = None
    try:
        sched = make_schedule()
        seq = uniform_seq(40, 999)
        block = jax.device_put(
            delta_block_init(
                hostrng.PRNGKey(1), spec.bottleneck_ch, spec.temb_ch
            ), dev,
        )
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
        fl = compiled_flops(run, params, edit, x, keys[0])
        if fl:
            extras["invert_edit_flops"] = round(fl)
        lats = []
        for i in range(15):
            t0 = time.perf_counter()
            out = run(params, edit, x, keys[i])
            force(out)
            lats.append(time.perf_counter() - t0)
        lats.sort()
        p50_ms = lats[len(lats) // 2] * 1e3
        extras["p10_invert_edit_ms"] = round(lats[1] * 1e3, 1)
        extras["p90_invert_edit_ms"] = round(lats[13] * 1e3, 1)
        log(
            f"p50 40-step invert+edit (fused, batch 1, n=15): {p50_ms:.0f} ms/image "
            f"(p10 {lats[1]*1e3:.0f}, p90 {lats[13]*1e3:.0f}, "
            f"min {lats[0]*1e3:.0f}, max {lats[-1]*1e3:.0f})"
        )
    except Exception as e:  # secondary metric must never kill the primary
        log(f"latency bench skipped: {type(e).__name__}: {e}")

    # ---- secondary: batched-serving throughput (fused, bsz 8) -----------
    try:
        if run is not None:
            bsz = 8
            xb = jax.device_put(
                jnp.asarray(np.random.RandomState(3).randn(bsz, 256, 256, 3),
                            jnp.float32), dev,
            )
            kb = [jax.device_put(jax.random.PRNGKey(100 + i), dev) for i in range(4)]
            force(run(params, edit, xb, kb[0]))  # compile + warmup
            t0 = time.perf_counter()
            for i in range(3):
                out = run(params, edit, xb, kb[i + 1])
            force(out)
            dt = (time.perf_counter() - t0) / 3
            img_s = bsz / dt
            extras["serving_bsz8_images_per_sec"] = round(img_s, 2)
            log(f"batched serving (fused invert+edit, bsz={bsz}): "
                f"{dt*1e3:.0f} ms/batch -> {img_s:.2f} images/s")
    except Exception as e:
        log(f"serving bench skipped: {type(e).__name__}: {e}")

    # ---- secondary: multi-coefficient sweep, batched vs looped ----------
    # --delta_interpolation semantics (diffusion_latent.py:726-755): N
    # full edited-generation chains sharing xT and frozen params. The
    # reference (and our fallback loop) dispatches them sequentially; the
    # product batches them along the batch axis with per-sample hs_coeff
    # (runner._batched_sweep / models/delta.apply_edit [B, K] support).
    try:
        if edit is not None:
            import dataclasses as _dc

            sched = make_schedule()
            seq = uniform_seq(40, 999)
            gen = engine.make_edit_generate(
                spec, sched, seq, t_edit=516, t_addnoise=200,
                compute_dtype=compute_dtype,
            )
            n_sweep = 8
            coeffs = np.linspace(0.0, 1.0, n_sweep)
            x1 = jax.device_put(
                jnp.asarray(
                    np.random.RandomState(4).randn(1, 256, 256, 3), jnp.float32
                ), dev,
            )
            k = jax.device_put(jax.random.PRNGKey(7), dev)
            # looped (reference dispatch shape): one batch-1 chain per coeff
            es = [
                jax.device_put(
                    _dc.replace(edit, hs_coeff=jnp.array([1.0, c], jnp.float32)),
                    dev,
                )
                for c in coeffs
            ]
            force(gen(params, es[0], x1, k)[0])  # compile + warmup
            t0 = time.perf_counter()
            for e in es:
                out, _ = gen(params, e, x1, k)
            force(out)
            looped_s = time.perf_counter() - t0
            # batched: ONE chain, per-sample [N, 2] coefficients
            xb = jax.device_put(jnp.tile(x1, (n_sweep, 1, 1, 1)), dev)
            cs = jnp.stack(
                [jnp.ones(n_sweep), jnp.asarray(coeffs, jnp.float32)], axis=1
            )
            eb = jax.device_put(_dc.replace(edit, hs_coeff=cs), dev)
            force(gen(params, eb, xb, k)[0])  # compile + warmup
            t0 = time.perf_counter()
            out, _ = gen(params, eb, xb, k)
            force(out)
            batched_s = time.perf_counter() - t0
            extras["sweep8_looped_ms"] = round(looped_s * 1e3, 1)
            extras["sweep8_batched_ms"] = round(batched_s * 1e3, 1)
            extras["sweep8_speedup"] = round(looped_s / batched_s, 2)
            log(
                f"8-coefficient sweep (40-step edited generation): looped "
                f"{looped_s*1e3:.0f} ms, batched {batched_s*1e3:.0f} ms -> "
                f"{looped_s/batched_s:.2f}x, "
                f"{n_sweep/batched_s:.2f} sweep-images/s"
            )
    except Exception as e:
        log(f"sweep bench skipped: {type(e).__name__}: {e}")

    # ---- secondary: full-size Δ-training step (VERDICT r2 item 7) -------
    # bf16 + remat, bs 1, the reference's DEFAULT training grid
    # (n_train_step=40, t_0=999, t_edit=516 → 19 edit timesteps) — each
    # edit timestep runs dual-decode fwd + bwd + plain fwd + an SGD update;
    # matches the reference training inner loop (diffusion_latent.py:301-354).
    # The full grid matters for the metric: the loss host-fetch barrier is
    # paid once per STEP, so a short grid overstates ms/edit-timestep (a
    # 2-timestep grid read 48.9 ms/edit-t where the real 19-timestep CLI
    # loop reads ~35, chip_train_capture.log). Captured in the driver
    # artifact so the training-perf claim doesn't depend on side logs.
    try:
        if not os.environ.get("ASYRP_TPU_BENCH_SKIP_TRAIN"):
            import dataclasses

            from asyrp_official_tpu.core.schedule import train_seq
            from asyrp_official_tpu.pipelines import train as tr

            tspec = PackedSpec(
                dataclasses.replace(
                    raw_spec,
                    config=dataclasses.replace(raw_spec.config, remat=True),
                ),
                params_host,
            )
            seq_tr, _ = train_seq(40, 999, 516)
            n_edit = len(seq_tr)
            opt = tr.make_optimizer(0.5)
            tblock = delta_block_init(
                hostrng.PRNGKey(2), tspec.bottleneck_ch, tspec.temb_ch
            )
            tedit = jax.device_put(
                EditState(blocks=(tblock,), hs_coeff=jnp.array([1.0, 1.0])), dev
            )
            opt_state = jax.device_put(opt.init(tedit.blocks), dev)
            tstep = tr.make_train_step(
                tspec, make_schedule(), seq_tr, t_edit=516, optimizer=opt,
                compute_dtype=compute_dtype, train_target="blocks",
            )
            x_lat_t = jax.device_put(
                jnp.asarray(np.random.RandomState(5).randn(1, 256, 256, 3),
                            jnp.float32), dev,
            )
            x0_t = jax.device_put(
                jnp.asarray(np.random.RandomState(6).randn(1, 256, 256, 3),
                            jnp.float32), dev,
            )
            # warmup/compile; the loss fetch is the honest barrier
            tedit, opt_state, m = tstep(params, tedit, opt_state, x_lat_t, x0_t, 0.5)
            float(m["loss"])
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                tedit, opt_state, m = tstep(
                    params, tedit, opt_state, x_lat_t, x0_t, 0.5
                )
                float(m["loss"])  # host fetch barrier
                ts.append(time.perf_counter() - t0)
            ts.sort()
            step_ms = ts[len(ts) // 2] * 1e3
            cache = tstep.cache_size()
            extras["train_step_ms"] = round(step_ms, 1)
            extras["train_ms_per_edit_timestep"] = round(step_ms / n_edit, 1)
            extras["train_jit_cache"] = cache
            log(f"full-size training step (bf16+remat, bs 1, {n_edit} edit "
                f"timesteps): {step_ms:.1f} ms/step "
                f"({step_ms / n_edit:.1f} ms/edit-timestep, jit cache {cache})")
            if cache != 1:
                log("WARNING: train jit cache != 1 — hidden recompile in the loop")

            # ---- origin-trajectory-cache steady state (VERDICT r3 item 2)
            # The PRODUCT training loop computes the frozen no-grad DDIM
            # trajectory once per batch and reuses it across outer
            # iterations (automatic for --n_iter > 1, runner.py); the
            # reference recomputes it every iteration
            # (diffusion_latent.py:322-329). Time the cached step so the
            # shipped steady state is in the driver artifact, not a side
            # log (round-3 verdict weak #1).
            tstep_c = tr.make_train_step(
                tspec, make_schedule(), seq_tr, t_edit=516, optimizer=opt,
                compute_dtype=compute_dtype, train_target="blocks",
                cached_origin=True,
            )
            t0 = time.perf_counter()
            org = tstep_c.compute_origins(params, x_lat_t)
            tedit, opt_state, m = tstep_c(
                params, tedit, opt_state, x_lat_t, x0_t, 0.5, org
            )
            float(m["loss"])
            fill_ms = (time.perf_counter() - t0) * 1e3  # incl. compile
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                tedit, opt_state, m = tstep_c(
                    params, tedit, opt_state, x_lat_t, x0_t, 0.5, org
                )
                float(m["loss"])  # host fetch barrier
                ts.append(time.perf_counter() - t0)
            ts.sort()
            cstep_ms = ts[len(ts) // 2] * 1e3
            extras["train_step_cached_ms"] = round(cstep_ms, 1)
            extras["train_cached_ms_per_edit_timestep"] = round(
                cstep_ms / n_edit, 1
            )
            extras["train_origin_fill_ms"] = round(fill_ms, 1)
            # steady-state fill: what every batch AFTER the first pays for
            # its origin trajectory (the first-fill number above is
            # compile-dominated and would misread as the per-batch cost).
            # Warm the force() reduction for the origin-stack shape first:
            # its one-off compile otherwise lands INSIDE the timed region
            # and misread 156 ms as 10,498 ms in BENCH_r04 (VERDICT r5 #1).
            force(org)
            t0 = time.perf_counter()
            org = tstep_c.compute_origins(params, x_lat_t)
            force(org)  # [n_steps, B, H, W, C] stack; host fetch barrier
            refill_ms = (time.perf_counter() - t0) * 1e3
            extras["train_origin_refill_ms"] = round(refill_ms, 1)
            log(f"cached-origin training step (steady state for --n_iter>1):"
                f" {cstep_ms:.1f} ms/step ({cstep_ms / n_edit:.1f} "
                f"ms/edit-timestep; first-fill incl. compile {fill_ms:.0f} "
                f"ms, steady-state fill {refill_ms:.0f} ms/batch; "
                f"{step_ms / cstep_ms:.2f}x vs un-cached)")

            # ---- batched training throughput (bs 8, split decode) --------
            # bs8 per-image cost matches bs1 since the split-decode path
            # (BASELINE.md round 4) — keep that on the driver record. Same
            # cached-origin step fn, batch-8 inputs (one extra compile).
            bs8 = 8
            x_lat8 = jax.device_put(
                jnp.asarray(np.random.RandomState(7).randn(bs8, 256, 256, 3),
                            jnp.float32), dev,
            )
            x08 = jax.device_put(
                jnp.asarray(np.random.RandomState(8).randn(bs8, 256, 256, 3),
                            jnp.float32), dev,
            )
            tblock8 = delta_block_init(
                hostrng.PRNGKey(3), tspec.bottleneck_ch, tspec.temb_ch
            )
            tedit8 = jax.device_put(
                EditState(blocks=(tblock8,), hs_coeff=jnp.array([1.0, 1.0])),
                dev,
            )
            opt_state8 = jax.device_put(opt.init(tedit8.blocks), dev)
            org8 = tstep_c.compute_origins(params, x_lat8)
            tedit8, opt_state8, m = tstep_c(
                params, tedit8, opt_state8, x_lat8, x08, 0.5, org8
            )
            float(m["loss"])  # compile + warmup
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                tedit8, opt_state8, m = tstep_c(
                    params, tedit8, opt_state8, x_lat8, x08, 0.5, org8
                )
                float(m["loss"])  # host fetch barrier
                ts.append(time.perf_counter() - t0)
            ts.sort()
            b8_ms = ts[len(ts) // 2] * 1e3
            extras["train_bs8_step_ms"] = round(b8_ms, 1)
            extras["train_bs8_ms_per_image"] = round(b8_ms / bs8, 1)
            log(f"batched training step (cached origin, bs {bs8}): "
                f"{b8_ms:.0f} ms/step = {b8_ms / bs8:.0f} ms/image "
                f"({cstep_ms / (b8_ms / bs8):.2f}x bs-1 per-image)")
    except Exception as e:
        log(f"training-step bench skipped: {type(e).__name__}: {e}")

    if trace_dir:
        jax.profiler.stop_trace()

    result = {
        "metric": "unet_fwd_evals_per_sec_chip_256",
        "value": round(best, 3),
        "unit": f"evals/s (bf16, bsz={best_bsz})",
        "vs_baseline": round(best / REFERENCE_TORCH_CPU_EVALS_PER_SEC, 2),
        # the reference publishes no hardware numbers; its torch forward on
        # THIS host's CPU is the only baseline runnable here (BASELINE.md)
        "baseline": "reference torch-CPU fwd on this host "
                    f"({REFERENCE_TORCH_CPU_EVALS_PER_SEC} evals/s)",
    }
    if p50_ms is not None:
        result["p50_invert_edit_ms"] = round(p50_ms, 1)
    result.update(extras)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
    os._exit(0)  # skip the axon backend's slow teardown
