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
