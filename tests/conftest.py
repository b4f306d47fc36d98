"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere, so this conftest is the
first import of the test session (pytest loads it before test modules).
"""

import os
import sys

# The shell presets JAX_PLATFORMS=axon (the remote TPU tunnel); tests must
# run on the virtual CPU mesh, so force it.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon sitecustomize force-registers the remote-TPU backend and overrides
# JAX_PLATFORMS; the config-level update below wins and pins tests to the
# virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: XLA-CPU conv compiles are slow (~1 min for a
# conv_transpose); caching makes repeat test runs fast.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pytest  # noqa: E402

# Fast tier: ``pytest -m "not slow"`` must finish in a couple of minutes on a
# one-core container (this box). Whole modules whose XLA-CPU compile load
# dominates (measured >=30 s/file warm-cache) are marked slow here, on top of
# the per-test ``slow``/``perf`` marks inside the files; the full tier
# (plain ``pytest tests/``) is unchanged.
_SLOW_MODULES = {
    "test_config_eval_export.py",
    "test_convert.py",
    "test_curriculum.py",
    "test_device_jitter.py",
    "test_golden_e2e.py",
    "test_grid_warp.py",
    "test_losses.py",
    "test_models.py",
    "test_pallas_kernel.py",
    "test_pretrained.py",
    "test_train.py",
    "test_variants.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if os.path.basename(str(item.fspath)) in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
