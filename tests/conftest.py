"""Test environment: CPU backend with 8 virtual devices for mesh tests.

The ambient environment registers the TPU ("axon") PJRT plugin in
``sitecustomize`` and pins ``jax.config.jax_platforms`` to it; unit tests
must run on a virtual 8-device CPU mesh instead (set
``BLADE_TEST_PLATFORM=tpu`` to exercise the real chip).  This module runs
before any test imports heavy code, while the JAX backend is still
uninitialized, so the config update below wins.
"""

import os

_platform = os.environ.get("BLADE_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Fast/full test tiers: ``@pytest.mark.slow`` tests are skipped unless
    ``BLADE_SLOW_TESTS=1`` (or ``-m slow`` was requested explicitly).

    The default run is the fast tier; the full tier is
    ``BLADE_SLOW_TESTS=1 python -m pytest tests/ -q``.
    """
    if os.environ.get("BLADE_SLOW_TESTS"):
        return
    if config.getoption("-m"):
        return  # explicit marker selection wins
    skip = pytest.mark.skip(
        reason="slow tier (set BLADE_SLOW_TESTS=1 to run)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
