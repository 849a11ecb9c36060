"""Test config: force an 8-device virtual CPU mesh so sharding tests run
anywhere (the driver validates real-TPU paths separately)."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402
import pytest  # noqa: E402

# The axon TPU plugin's sitecustomize sets jax_platforms="axon,cpu" via
# jax.config (overriding the env var) — force plain CPU so the virtual
# 8-device mesh is what tests see.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Quick/slow tier split (pyproject registers the marker): whole-render and
# multi-device modules are the long tail of the ~10-minute suite; select the
# quick tier with `pytest -m "not slow"`.
_SLOW_MODULES = {"test_parallel", "test_diff", "test_bdpt", "test_whitted",
                 "test_mis", "test_pathtracer", "test_scaling",
                 "test_dryrun_budget"}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
