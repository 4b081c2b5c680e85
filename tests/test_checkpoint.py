"""Checkpointer round-trips, including pre-`hyper` format compatibility."""

import jax.numpy as jnp
import numpy as np

from arvae_tpu.core.checkpoint import Checkpointer
from arvae_tpu.training.base import TrainState
import pytest

pytestmark = pytest.mark.fast


def _params():
    return {"w": np.arange(4, dtype=np.float32).reshape(2, 2)}


def test_roundtrip_with_hyper(tmp_path):
    ck = Checkpointer(str(tmp_path / "run"))
    state = TrainState(params=_params(), opt_state={"m": np.zeros(3)},
                       step=jnp.int32(7),
                       hyper={"beta": jnp.float32(0.5)})
    ck.save(state)
    restored = ck.restore(state)
    assert int(restored.step) == 7
    np.testing.assert_allclose(float(restored.hyper["beta"]), 0.5)


def test_restore_pre_hyper_checkpoint(tmp_path):
    """Checkpoints written before TrainState grew `hyper` must restore
    against a new-format template, with the template's hyper values."""
    ck = Checkpointer(str(tmp_path / "run"))
    old_state = TrainState(params=_params(), opt_state={"m": np.ones(3)},
                           step=jnp.int32(5), hyper=None)
    ck.save(old_state)

    template = TrainState(
        params={"w": np.zeros((2, 2), np.float32)},
        opt_state={"m": np.zeros(3)},
        step=jnp.int32(0),
        hyper={"beta": jnp.float32(4.0), "gamma": jnp.float32(10.0)},
    )
    restored = ck.restore(template)
    assert int(restored.step) == 5
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  _params()["w"])
    np.testing.assert_allclose(float(restored.hyper["gamma"]), 10.0)


def test_restore_current_hparams_win_over_disk_hyper(tmp_path):
    """Both restore paths adopt the trainer's CURRENT hyper values: a
    user who edits beta between runs must not silently train with the
    stale on-disk value (run dirs already encode the config)."""
    ck = Checkpointer(str(tmp_path / "run"))
    state = TrainState(params=_params(), opt_state={"m": np.zeros(3)},
                       step=jnp.int32(3),
                       hyper={"beta": jnp.float32(0.5)})
    ck.save(state)
    template = state.replace(hyper={"beta": jnp.float32(2.0)})
    restored = ck.restore(template)
    assert int(restored.step) == 3
    np.testing.assert_allclose(float(restored.hyper["beta"]), 2.0)
