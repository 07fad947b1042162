"""Opt-in TPU test lane (VERDICT r1 item 9).

The main suite (``tests/``) forces the CPU backend so it runs anywhere;
TPU behaviour was previously bench-observed only.  This lane regression-
tests the actual TPU compilation + numerics of the production paths:

    SLAM_TPU_TPU_TESTS=1 python -m pytest tests_tpu/ -q

It is NOT collected by ``python -m pytest`` (pyproject pins
``testpaths = ["tests"]``) and every test self-skips unless the env flag
is set AND a non-CPU backend is live, so CI stays green without a chip.

Unlike ``tests/conftest.py`` this file must not touch JAX_PLATFORMS; it
enables the persistent XLA cache instead (first-ever Schur compiles take
minutes on the axon toolchain, cached runs seconds).
"""

import os

import pytest


def _tpu_available() -> bool:
    if os.environ.get("SLAM_TPU_TPU_TESTS") != "1":
        return False
    import jax

    try:
        return jax.devices()[0].platform != "cpu"
    except Exception:
        return False


def pytest_collection_modifyitems(config, items):
    if os.environ.get("SLAM_TPU_TPU_TESTS") != "1":
        skip = pytest.mark.skip(reason="set SLAM_TPU_TPU_TESTS=1 to run "
                                       "the TPU lane")
        for item in items:
            item.add_marker(skip)
        return
    from slam_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    if not _tpu_available():
        skip = pytest.mark.skip(reason="no accelerator backend available")
        for item in items:
            item.add_marker(skip)
