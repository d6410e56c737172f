"""Training step: per-timestep SGD semantics, loss decrease, both targets."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from asyrp_official_tpu.core.schedule import make_schedule, train_seq
from asyrp_official_tpu.models import ddpmpp
from asyrp_official_tpu.models.delta import EditState, delta_block_init
from asyrp_official_tpu.models.registry import ModelSpec
from asyrp_official_tpu.pipelines import train as tr

CFG = ddpmpp.DDPMppConfig(
    ch=32, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(16,), resolution=32
)
SPEC = ModelSpec(family="ddpmpp", config=CFG, learn_sigma=False, delta_flavor="ddpm")
SCHED = make_schedule()


@pytest.fixture(scope="module")
def setup():
    params = SPEC.init(jax.random.PRNGKey(0))
    seq, _ = train_seq(8, 999, 500)
    x_lat = jnp.asarray(np.random.RandomState(0).randn(1, 32, 32, 3).astype(np.float32))
    x0 = jnp.asarray(np.random.RandomState(1).randn(1, 32, 32, 3).astype(np.float32))
    return params, seq, x_lat, x0


def test_train_step_deltablock(setup):
    params, seq, x_lat, x0 = setup
    block = delta_block_init(jax.random.PRNGKey(2), CFG.bottleneck_ch, CFG.temb_ch)
    edit = EditState(blocks=(block,), hs_coeff=jnp.array([1.0, 1.0]))
    opt = tr.make_optimizer(0.005, 1, 1.0)
    opt_state = opt.init(edit.blocks)
    step = tr.make_train_step(
        SPEC, SCHED, seq, t_edit=500, optimizer=opt, train_target="blocks"
    )
    losses = []
    for i in range(3):
        edit, opt_state, metrics = step(params, edit, opt_state, x_lat, x0, 0.005)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    # pure L1-to-origin loss: SGD should reduce it across outer iterations
    assert losses[-1] < losses[0], losses
    # params actually moved
    moved = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), block, edit.blocks[0])
    assert max(jax.tree.leaves(moved)) > 0


def test_train_step_delta_rows(setup):
    params, seq, x_lat, x0 = setup
    rows = 0.2 * jax.random.normal(
        jax.random.PRNGKey(3), (len(seq), 16, 16, CFG.bottleneck_ch)
    )
    edit = EditState(
        mode="input", delta_rows=rows, hs_coeff=jnp.array([1.0, 1.0]),
        input_style="add",
    )
    opt = tr.make_optimizer(0.005, 1, 1.0)
    opt_state = opt.init(edit.delta_rows)
    step = tr.make_train_step(
        SPEC, SCHED, seq, t_edit=500, optimizer=opt, train_target="rows"
    )
    losses = []
    for _ in range(3):
        edit, opt_state, metrics = step(params, edit, opt_state, x_lat, x0, 0.005)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


def test_steplr():
    assert tr.steplr_lr(1.0, 0, 1, 0.5) == 1.0
    assert tr.steplr_lr(1.0, 1, 1, 0.5) == 0.5
    assert tr.steplr_lr(1.0, 4, 2, 0.1) == pytest.approx(0.01)


def test_train_step_feedback_does_not_recompile(setup):
    """Feeding step outputs back as inputs must hit the SAME compiled
    program: host-built state has weak-typed scalar leaves while jit
    outputs are strong, which silently doubled full-size compile time
    (76 s at 113.7M params) until make_train_step strengthened its
    inputs. cache_size is the underlying jit cache entry count."""
    params, seq, x_lat, x0 = setup
    block = delta_block_init(jax.random.PRNGKey(4), CFG.bottleneck_ch, CFG.temb_ch)
    edit = EditState(blocks=(block,), hs_coeff=jnp.array([1.0, 1.0]))
    opt = tr.make_optimizer(0.005, 1, 1.0)
    opt_state = opt.init(edit.blocks)
    step = tr.make_train_step(
        SPEC, SCHED, seq, t_edit=500, optimizer=opt, train_target="blocks"
    )
    for _ in range(3):
        edit, opt_state, _ = step(params, edit, opt_state, x_lat, x0, 0.005)
    assert step.cache_size() == 1, step.cache_size()


def test_cached_origin_matches_recompute(setup):
    """cached_origin=True (origin trajectory computed once per batch and fed
    in) must train identically to the in-step recompute: the plain-DDIM
    reference trajectory depends only on the frozen params and x_lat
    (diffusion_latent.py:322-329), so splitting it out changes scheduling,
    not math. Checked for both train targets over 3 outer iterations."""
    params, seq, x_lat, x0 = setup
    for target in ("blocks", "rows"):
        if target == "blocks":
            block = delta_block_init(jax.random.PRNGKey(7), CFG.bottleneck_ch, CFG.temb_ch)
            edit0 = EditState(blocks=(block,), hs_coeff=jnp.array([1.0, 1.0]))
            trainable0 = edit0.blocks
        else:
            rows = 0.2 * jax.random.normal(
                jax.random.PRNGKey(8), (len(seq), 16, 16, CFG.bottleneck_ch)
            )
            edit0 = EditState(
                mode="input", delta_rows=rows, hs_coeff=jnp.array([1.0, 1.0]),
                input_style="add",
            )
            trainable0 = edit0.delta_rows
        opt = tr.make_optimizer(0.005, 1, 1.0)
        step_rc = tr.make_train_step(
            SPEC, SCHED, seq, t_edit=500, optimizer=opt, train_target=target
        )
        step_co = tr.make_train_step(
            SPEC, SCHED, seq, t_edit=500, optimizer=opt, train_target=target,
            cached_origin=True,
        )
        origins = step_co.compute_origins(params, x_lat)
        assert origins.shape[0] == len(seq)

        e_rc, s_rc = edit0, opt.init(trainable0)
        e_co, s_co = edit0, opt.init(trainable0)
        for _ in range(3):
            e_rc, s_rc, m_rc = step_rc(params, e_rc, s_rc, x_lat, x0, 0.005)
            e_co, s_co, m_co = step_co(params, e_co, s_co, x_lat, x0, 0.005, origins)
            np.testing.assert_allclose(
                np.asarray(m_rc["loss_per_step"]),
                np.asarray(m_co["loss_per_step"]), rtol=0, atol=1e-6,
            )
        got = e_co.blocks if target == "blocks" else e_co.delta_rows
        want = e_rc.blocks if target == "blocks" else e_rc.delta_rows
        for a_, b_ in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
            np.testing.assert_allclose(np.asarray(a_), np.asarray(b_), atol=2e-6)
