"""Test harness: 8 virtual CPU devices so data-parallel sharding and ICI
collectives are exercised without TPU hardware (SURVEY §4 rebuild strategy).
Must run before jax is imported anywhere.

Set ``CLSURVEY_TEST_TPU=1`` to keep the real backend instead — intended
for the fast ``-m smoke`` subset as a hardware sanity check:
``CLSURVEY_TEST_TPU=1 python -m pytest -m smoke -q``."""

import os

_USE_TPU = os.environ.get("CLSURVEY_TEST_TPU") == "1"

if not _USE_TPU:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config knob
# works. Must happen before any backend is initialised.
if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="session")
def _isolated_config(tmp_path_factory):
    root = tmp_path_factory.mktemp("clsurvey_runs")
    os.environ["CLSURVEY_ROOT"] = str(root)
    from clsurvey_tpu.utils import config

    config.set_config(None)
    config.load_config(refresh=True)
    yield


@pytest.fixture()
def fresh_config(tmp_path):
    """Per-test isolated result roots."""
    old = os.environ.get("CLSURVEY_ROOT")
    os.environ["CLSURVEY_ROOT"] = str(tmp_path)
    from clsurvey_tpu.utils import config

    config.set_config(None)
    cfg = config.load_config(refresh=True)
    config.set_config(cfg)
    yield cfg
    if old is not None:
        os.environ["CLSURVEY_ROOT"] = old
    config.set_config(None)
