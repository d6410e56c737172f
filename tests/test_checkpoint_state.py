"""Native orbax train-state checkpointing round-trip."""
import numpy as np

import jax
import jax.numpy as jnp
import optax

from asyrp_official_tpu.pipelines.checkpoint import load_train_state, save_train_state


def test_roundtrip(tmp_path):
    trainable = ({"w": jnp.ones((4, 4)), "b": jnp.zeros(4)},)
    opt = optax.inject_hyperparams(optax.sgd)(learning_rate=0.1)
    opt_state = opt.init(trainable)
    p = str(tmp_path / "state.orbax")
    save_train_state(p, trainable=trainable, opt_state=opt_state, it_out=3)
    restored = load_train_state(
        p, like={"trainable": trainable, "opt_state": opt_state,
                 "meta": {"it_out": np.asarray(0)}},
    )
    assert restored is not None
    np.testing.assert_array_equal(
        np.asarray(restored["trainable"][0]["w"]), np.ones((4, 4))
    )
    assert int(restored["meta"]["it_out"]) == 3


def test_missing_returns_none(tmp_path):
    assert load_train_state(str(tmp_path / "nope"), like={}) is None


def test_roundtrip_with_extra(tmp_path):
    """'extra' must be restorable — its presence is now unconditional in
    the saved structure (a conditional key made every extra-carrying
    sidecar unrestorable with the documented `like`)."""
    trainable = ({"w": jnp.ones((2, 2))},)
    opt = optax.sgd(0.1)
    opt_state = opt.init(trainable)
    p = str(tmp_path / "state_x.orbax")
    extra = {"ema": jnp.full((2,), 3.0)}
    save_train_state(p, trainable=trainable, opt_state=opt_state, it_out=1,
                     extra=extra)
    restored = load_train_state(
        p, like={"trainable": trainable, "opt_state": opt_state,
                 "meta": {"it_out": np.asarray(0)}, "extra": extra},
    )
    np.testing.assert_array_equal(np.asarray(restored["extra"]["ema"]),
                                  [3.0, 3.0])
    # and a no-extra save restores with a like that doesn't mention it
    p2 = str(tmp_path / "state_y.orbax")
    save_train_state(p2, trainable=trainable, opt_state=opt_state, it_out=2)
    restored = load_train_state(
        p2, like={"trainable": trainable, "opt_state": opt_state,
                  "meta": {"it_out": np.asarray(0)}},
    )
    assert int(restored["meta"]["it_out"]) == 2


def test_flat_sidecar_roundtrip(tmp_path):
    """The multi-process flat .npz fallback (pipelines/checkpoint._flat_save)
    must round-trip bit-exactly and be picked up by load_train_state's
    file-vs-dir dispatch — single-process unit coverage for the path the
    2-process runner test exercises end-to-end."""
    from asyrp_official_tpu.pipelines import checkpoint as cp

    trainable = ({"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros(3)},)
    opt = optax.inject_hyperparams(optax.sgd)(learning_rate=0.25)
    opt_state = opt.init(trainable)
    state = {
        "trainable": trainable,
        "opt_state": opt_state,
        "meta": {"it_out": np.asarray(7)},
        "extra": cp._EMPTY_EXTRA,
    }
    p = str(tmp_path / "flat.orbax")
    cp._flat_save(p, state)
    assert not any(f.startswith("flat.orbax.tmp") for f in
                   __import__("os").listdir(tmp_path))  # atomic: tmp renamed
    restored = load_train_state(
        p, like={"trainable": trainable, "opt_state": opt_state,
                 "meta": {"it_out": np.asarray(0)}},
    )
    assert restored is not None
    np.testing.assert_array_equal(
        np.asarray(restored["trainable"][0]["w"]), np.arange(6.0).reshape(2, 3)
    )
    assert int(restored["meta"]["it_out"]) == 7

    # leaf-count mismatch is a loud error, not silent corruption
    import pytest

    with pytest.raises(ValueError, match="leaves"):
        cp._flat_load(p, {"just_one": np.zeros(1)})
