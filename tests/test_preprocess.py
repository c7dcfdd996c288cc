"""On-device preprocessing tests (jnp path + Pallas fused kernel)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clsurvey_tpu.ops import preprocess as pp

MEAN = (0.485, 0.456, 0.406)
STD = (0.229, 0.224, 0.225)


@pytest.mark.smoke
def test_normalize_matches_torchvision_formula():
    x = jnp.asarray(np.full((2, 4, 4, 3), 128, np.uint8))
    out = np.asarray(pp.normalize(x, MEAN, STD))
    expected = (128 / 255.0 - np.asarray(MEAN)) / np.asarray(STD)
    np.testing.assert_allclose(out[0, 0, 0], expected, rtol=1e-5)


def test_random_flip_is_horizontal_and_per_sample():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (64, 4, 6, 3)).astype(np.float32))
    out = np.asarray(pp.random_flip(jax.random.PRNGKey(0), x))
    xn = np.asarray(x)
    flipped = (np.abs(out - xn[:, :, ::-1, :]).max(axis=(1, 2, 3)) < 1e-6)
    kept = (np.abs(out - xn).max(axis=(1, 2, 3)) < 1e-6)
    assert np.all(flipped | kept)
    assert flipped.any() and kept.any()  # p=0.5 over 64 samples


@pytest.mark.smoke
def test_pallas_normalize_matches_jnp():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.integers(0, 255, (8, 16, 16, 3), dtype=np.uint8))
    key = jax.random.PRNGKey(3)
    a = pp.preprocess(key, x, MEAN, STD, augment=True)
    b = pp.preprocess_pallas(key, x, MEAN, STD, augment=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
