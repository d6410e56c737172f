"""Pipeline engines: jitted invert/generate/edit on a tiny spec, plus
batch sharding over the 8-device virtual CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asyrp_official_tpu.core.schedule import make_schedule, uniform_seq
from asyrp_official_tpu.models import ddpmpp
from asyrp_official_tpu.models.delta import EditState, delta_block_init
from asyrp_official_tpu.models.registry import ModelSpec
from asyrp_official_tpu.parallel import mesh as pmesh
from asyrp_official_tpu.pipelines import engine

CFG = ddpmpp.DDPMppConfig(
    ch=32, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(16,), resolution=32
)
SPEC = ModelSpec(family="ddpmpp", config=CFG, learn_sigma=False, delta_flavor="ddpm")
SCHED = make_schedule()
SEQ = uniform_seq(6, 999)


@pytest.fixture(scope="module")
def params():
    return SPEC.init(jax.random.PRNGKey(0))


def test_invert_then_generate(params):
    x0 = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3).astype(np.float32))
    invert = engine.make_invert(SPEC, SCHED, SEQ)
    gen = engine.make_generate(SPEC, SCHED, SEQ)
    x_lat, _ = invert(params, x0)
    x_rec, _ = gen(params, x_lat, jax.random.PRNGKey(0))
    assert x_rec.shape == x0.shape
    assert bool(jnp.isfinite(x_rec).all())


def test_edit_generate_deltablock(params):
    block = delta_block_init(jax.random.PRNGKey(1), CFG.bottleneck_ch, CFG.temb_ch)
    edit = EditState(blocks=(block,), hs_coeff=jnp.array([1.0, 1.0]))
    x_lat = jnp.asarray(np.random.RandomState(1).randn(2, 32, 32, 3).astype(np.float32))

    run = engine.make_edit_generate(SPEC, SCHED, SEQ, t_edit=500, t_addnoise=100)
    x_edit, _ = run(params, edit, x_lat, jax.random.PRNGKey(0))

    gen = engine.make_generate(SPEC, SCHED, SEQ)
    x_plain, _ = gen(params, x_lat, jax.random.PRNGKey(0))
    # the edit must matter
    assert float(jnp.abs(x_edit - x_plain).mean()) > 1e-5


def test_edit_generate_coeff_sweep_single_compile(params):
    """delta-interpolation sweeps (diffusion_latent.py:726-755) re-use one
    compilation — EditState is a traced arg."""
    block = delta_block_init(jax.random.PRNGKey(1), CFG.bottleneck_ch, CFG.temb_ch)
    x_lat = jnp.asarray(np.random.RandomState(2).randn(1, 32, 32, 3).astype(np.float32))
    run = engine.make_edit_generate(SPEC, SCHED, SEQ, t_edit=500)

    outs = []
    for c in [0.0, 0.5, 1.0]:
        edit = EditState(blocks=(block,), hs_coeff=jnp.array([1.0, c]))
        x, _ = run(params, edit, x_lat, jax.random.PRNGKey(0))
        outs.append(np.asarray(x))
    # monotone-ish effect: coeff 0 equals plain asymmetric-with-zero-delta
    assert not np.allclose(outs[0], outs[2])
    # the sweep must re-use ONE compilation: hs_coeff regressing to a
    # static (hashed) jit argument would recompile per value — the exact
    # perf bug this test's name guards (cf. the train-step cache hooks)
    assert run._cache_size() == 1


def test_edit_generate_delta_rows(params):
    """train_delta_h-style stacked rows with per-step indexing."""
    rows = jnp.asarray(
        np.random.RandomState(3).randn(len(SEQ), 16, 16, CFG.bottleneck_ch).astype(np.float32)
    )
    edit = EditState(
        mode="input",
        delta_rows=rows,
        hs_coeff=jnp.array([1.0, 1.0]),
        input_style="add",
    )
    run = engine.make_edit_generate(
        SPEC, SCHED, SEQ, t_edit=500, delta_times=SEQ
    )
    x_lat = jnp.asarray(np.random.RandomState(4).randn(1, 32, 32, 3).astype(np.float32))
    x, _ = run(params, edit, x_lat, jax.random.PRNGKey(0))
    assert bool(jnp.isfinite(x).all())


def test_invert_with_h(params):
    x0 = jnp.asarray(np.random.RandomState(5).randn(1, 32, 32, 3).astype(np.float32))
    run = engine.make_invert_with_h(SPEC, SCHED, SEQ)
    x_lat, h_traj = run(params, x0)
    assert h_traj.shape == (len(SEQ) - 1, 1, 16, 16, CFG.bottleneck_ch)


def test_bf16_compute_dtype(params):
    x0 = jnp.asarray(np.random.RandomState(6).randn(1, 32, 32, 3).astype(np.float32))
    invert = engine.make_invert(SPEC, SCHED, SEQ, compute_dtype=jnp.bfloat16)
    x_lat, _ = invert(params, x0)
    assert x_lat.dtype == jnp.float32  # carry stays f32
    # and stays close to the f32 path
    x_lat32, _ = engine.make_invert(SPEC, SCHED, SEQ)(params, x0)
    assert float(jnp.abs(x_lat - x_lat32).mean()) < 0.15


def test_batch_sharded_inversion(params):
    """Data-parallel inversion over the virtual 8-device mesh — the
    DataParallel replacement (SURVEY.md §2.3)."""
    m = pmesh.make_mesh()
    assert m.devices.size == 8
    x0 = np.random.RandomState(7).randn(8, 32, 32, 3).astype(np.float32)
    xs = pmesh.shard_batch(m, x0)
    ps = pmesh.replicate(m, params)
    invert = engine.make_invert(SPEC, SCHED, SEQ)
    x_lat, _ = invert(ps, xs)
    # output keeps the batch sharding
    assert x_lat.sharding.spec == pmesh.batch_spec(m).spec
    # identical to the unsharded result
    x_ref, _ = invert(params, jnp.asarray(x0))
    np.testing.assert_allclose(np.asarray(x_lat), np.asarray(x_ref), rtol=2e-4, atol=2e-4)


def test_pad_to_multiple():
    x = np.ones((5, 2))
    padded, real = pmesh.pad_to_multiple(x, 4)
    assert padded.shape == (8, 2) and real == 5
    same, real2 = pmesh.pad_to_multiple(np.ones((8, 2)), 4)
    assert same.shape == (8, 2) and real2 == 8


def test_split_chain_matches_cond_path(params):
    """The branch-free two-scan split at the t_edit boundary must equal the
    per-step lax.cond strategy (same ops, same rng fold_in indices) — only
    compilation-level f32 reassociation noise is allowed."""
    from asyrp_official_tpu.core.sampler import sample_chain
    from asyrp_official_tpu.core.steptable import generation_table

    block = delta_block_init(jax.random.PRNGKey(1), CFG.bottleneck_ch, CFG.temb_ch)
    edit = EditState(blocks=(block,), hs_coeff=jnp.array([1.0, 0.2]))
    x_lat = jnp.asarray(np.random.RandomState(9).randn(2, 32, 32, 3).astype(np.float32))
    rng = jax.random.PRNGKey(3)

    gen = engine.make_edit_generate(SPEC, SCHED, SEQ, t_edit=516, t_addnoise=300,
                                    collect=("x",))
    x_new, ys_new = gen(params, edit, x_lat, rng)

    table = generation_table(SEQ, t_edit=516, t_addnoise=300)
    assert 0 < table.edit_prefix_len() < table.num_steps  # split actually engaged
    cond = jax.jit(lambda p, e, x, r: sample_chain(
        engine._edited_eps(SPEC, p, e, jnp.float32, skip_below_edit=True),
        SCHED, table, x, rng=r, learn_sigma=False, collect=("x",)))
    x_ref, ys_ref = cond(params, edit, x_lat, rng)

    scale = float(jnp.abs(x_ref).max()) + 1e-9
    assert float(jnp.abs(x_new - x_ref).max()) / scale < 1e-5
    assert ys_new["x"].shape == ys_ref["x"].shape
    assert float(jnp.abs(ys_new["x"] - ys_ref["x"]).max()) / scale < 1e-5


def test_bf16_no_f32_promotion():
    """Regression: the bf16 compute path must stay bf16 through the whole
    forward — an f32 temb/hs_coeff operand silently promotes every
    downstream conv to f32 (measured ~20% end-to-end, BASELINE.md)."""
    p = SPEC.init(jax.random.PRNGKey(0))
    block = delta_block_init(jax.random.PRNGKey(1), CFG.bottleneck_ch, CFG.temb_ch)
    edit = EditState(blocks=(block,), hs_coeff=jnp.array([1.0, 1.0]))

    def f(x, t):
        eps, eps_mod, _, mh = ddpmpp.apply(p, CFG, x, t, edit=edit)
        return eps, eps_mod, mh

    out = jax.eval_shape(
        f,
        jax.ShapeDtypeStruct((1, 32, 32, 3), jnp.bfloat16),
        jax.ShapeDtypeStruct((1,), jnp.float32),
    )
    assert [o.dtype for o in out] == [jnp.bfloat16] * 3

@pytest.mark.slow
def test_bf16_no_f32_promotion_openai():
    """Same bf16-stays-bf16 contract for the OpenAI family (learn_sigma,
    scale-shift norm, updown resblocks) — its emb/hs_coeff adds are a
    separate implementation with the same promotion hazard. Numerically:
    with perturbed (non-zero-init) weights the bf16 output differs from
    f32 at the bf16 mantissa scale (~1e-2 rel), proving compute genuinely
    runs in bf16 rather than silently upcasting."""
    from asyrp_official_tpu.models import openai_unet as ou

    cfg = ou.OpenAIUNetConfig(
        image_size=32, in_channels=3, model_channels=32, out_channels=6,
        num_res_blocks=1, attention_ds=(2,), channel_mult=(1, 2),
        num_head_channels=16, use_scale_shift_norm=True, resblock_updown=True,
    )
    p = ou.init(jax.random.PRNGKey(0), cfg)
    block = delta_block_init(jax.random.PRNGKey(1), 64, 128, flavor="openai")
    edit = EditState(blocks=(block,), hs_coeff=jnp.array([1.0, 1.0]),
                     flavor="openai")

    def f(x, t):
        eps, eps_mod, _, mh = ou.apply(p, cfg, x, t, edit=edit)
        return eps, eps_mod, mh

    out = jax.eval_shape(
        f,
        jax.ShapeDtypeStruct((1, 32, 32, 3), jnp.bfloat16),
        jax.ShapeDtypeStruct((1,), jnp.float32),
    )
    assert [o.dtype for o in out] == [jnp.bfloat16] * 3

    # numeric: un-zero the zero_module tails so outputs are non-trivial
    p2 = jax.tree.map(
        lambda a: a + 0.02 * jax.random.normal(jax.random.PRNGKey(42), a.shape),
        p,
    )
    x = jnp.asarray(np.random.RandomState(0).randn(1, 32, 32, 3), jnp.float32)
    t = jnp.full((1,), 500.0, jnp.float32)
    o32, *_ = ou.apply(p2, cfg, x, t)
    o16, *_ = ou.apply(p2, cfg, x.astype(jnp.bfloat16), t)
    rel = float(
        jnp.abs(o32 - o16.astype(jnp.float32)).max() / jnp.abs(o32).max()
    )
    assert 1e-4 < rel < 0.05, rel
