"""Schedule math parity: float64→float32 truncation, seq grids, logvar tables."""
import numpy as np
import pytest

from asyrp_official_tpu.core.schedule import (
    linear_beta_schedule,
    make_schedule,
    prev_seq,
    train_seq,
    uniform_seq,
)


def test_linear_betas_float64():
    b = linear_beta_schedule(1e-4, 0.02, 1000)
    assert b.dtype == np.float64
    assert b.shape == (1000,)
    assert b[0] == pytest.approx(1e-4)
    assert b[-1] == pytest.approx(0.02)


def test_alphas_cumprod_is_float32_path():
    s = make_schedule()
    # float32 cumprod of float32 (1-betas) — NOT the float64 product cast down.
    betas32 = s.betas
    expected = np.cumprod((1.0 - betas32).astype(np.float32), dtype=np.float32)
    np.testing.assert_array_equal(s.alphas_cumprod, expected)
    assert s.alphas_cumprod_ext[0] == 1.0
    np.testing.assert_array_equal(s.alphas_cumprod_ext[1:], s.alphas_cumprod)


def test_logvar_fixedsmall_matches_reference_formula():
    s = make_schedule(var_type="fixedsmall")
    betas = linear_beta_schedule(1e-4, 0.02, 1000)
    acp = np.cumprod(1.0 - betas)
    acp_prev = np.append(1.0, acp[:-1])
    pv = betas * (1.0 - acp_prev) / (1.0 - acp)
    np.testing.assert_allclose(
        s.logvar, np.log(np.maximum(pv, 1e-20)).astype(np.float32), rtol=1e-6
    )


def test_logvar_fixedlarge():
    s = make_schedule(var_type="fixedlarge")
    betas = linear_beta_schedule(1e-4, 0.02, 1000)
    acp = np.cumprod(1.0 - betas)
    acp_prev = np.append(1.0, acp[:-1])
    pv = betas * (1.0 - acp_prev) / (1.0 - acp)
    expected = np.log(np.append(pv[1], betas[1:]))
    np.testing.assert_allclose(s.logvar, expected.astype(np.float32), rtol=1e-6)


def test_uniform_seq_truncation_rule():
    # reference: [int(s+1e-6) for s in np.linspace(0,1,n)*t_0]
    seq = uniform_seq(40, 999)
    ref = [int(s + 1e-6) for s in np.linspace(0, 1, 40) * 999]
    assert seq == ref
    assert seq[0] == 0 and seq[-1] == 999
    assert prev_seq(seq)[:2] == [-1, 0]


def test_train_seq_filters_t_edit():
    seq, nxt = train_seq(40, 999, 516)
    s = np.linspace(0, 1, 40) * 999
    s = s[s >= 516]
    assert seq == [int(x + 1e-6) for x in s]
    assert all(t >= 515 for t in seq)
    assert nxt[0] == -1 and nxt[1:] == seq[:-1]


def test_train_seq_no_skip():
    seq, nxt = train_seq(0, 10, 4)
    assert seq == list(range(4, 10))
    assert nxt == [-1, 4, 5, 6, 7, 8]
