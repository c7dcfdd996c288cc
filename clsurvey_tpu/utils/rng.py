"""Deterministic randomness (ref:src/utilities/utils.py:52-58 ``set_random``).

The reference seeds torch/cuda/random/numpy with seed 7 and re-seeds per LR
grid iteration (ref:src/framework/lr_grid_train.py:73-77). JAX has explicit
PRNG keys, so determinism is structural; we provide a thin global-key
threading helper so framework code can reproduce the reference's
"seed once, then consume" flow without plumbing keys through every call."""

from __future__ import annotations

import random

import jax
import numpy as np

DEFAULT_SEED = 7

_KEY: jax.Array | None = None


def set_random(seed: int = DEFAULT_SEED) -> jax.Array:
    """Reset all RNG streams deterministically; returns the root JAX key."""
    global _KEY
    random.seed(seed)
    np.random.seed(seed % (2**32))
    _KEY = jax.random.PRNGKey(seed)
    return _KEY
