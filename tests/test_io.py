"""IO-layer tests: pickle compat writer + Orbax native checkpoints."""

import jax.numpy as jnp
import numpy as np
import pytest

from clsurvey_tpu.utils import io, orbax_io


def test_pickle_roundtrip_atomic(tmp_path):
    state = {"params": {"w": jnp.arange(6.0).reshape(2, 3)},
             "meta": {"task": 3}}
    path = str(tmp_path / "best_model.pth.tar")
    io.save(state, path)
    back = io.load(path)
    assert isinstance(back["params"]["w"], np.ndarray)  # torch-free numpy
    np.testing.assert_array_equal(back["params"]["w"],
                                  np.arange(6.0).reshape(2, 3))
    assert back["meta"]["task"] == 3


def test_orbax_roundtrip(tmp_path):
    if not orbax_io.available():
        pytest.skip("orbax not installed")
    state = {"params": {"w": jnp.ones((4, 4))},
             "heads": {"kernel": jnp.zeros((2, 4, 5))},
             "meta": {"task": 1}}
    path = orbax_io.save(state, str(tmp_path / "ckpt"))
    back = orbax_io.load(path)
    np.testing.assert_allclose(np.asarray(back["params"]["w"]), 1.0)
    assert back["meta"]["task"] == 1
    # overwrite works
    orbax_io.save(state, path)
