"""Test configuration: force an 8-device virtual CPU platform.

Kernels run in Pallas interpret mode on CPU; sharding tests use the 8-device
mesh. Real-TPU runs happen via bench.py / __graft_entry__.py — plus the
opt-in on-chip smoke tier: NUNCHAKU_TPU_ONCHIP=1 keeps the real TPU
platform so the op-level suites compile every Pallas kernel family through
Mosaic (catching layout/tiling failures interpret mode cannot model):

  NUNCHAKU_TPU_ONCHIP=1 python -m pytest tests/test_ops.py -q
"""

import os

ONCHIP = os.environ.get("NUNCHAKU_TPU_ONCHIP") == "1"
if not ONCHIP:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax  # noqa: E402

# The sandbox's sitecustomize imports jax (axon TPU plugin) before conftest
# runs, so the env var alone can be too late — force the platform through
# the config API as well.
if not ONCHIP:
    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu", jax.default_backend()

jax.config.update("jax_default_matmul_precision", "highest")
# The sandbox has a single slow CPU: persist compiled executables across
# processes so the suite doesn't recompile every tiny op each run.
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


def pytest_collection_modifyitems(config, items):
    if not ONCHIP:
        return
    import pytest as _pytest

    if len(jax.devices()) >= 8:
        return
    skip = _pytest.mark.skip(reason="on-chip smoke tier: needs 8 devices")
    for item in items:
        if "test_parallel" in item.nodeid:
            item.add_marker(skip)
