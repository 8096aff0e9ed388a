import os

# Run all tests on a virtual multi-device CPU mesh; the real TPU chip is
# reserved for bench.py.  The container's sitecustomize registers the axon
# TPU plugin before any test code runs (and JAX_PLATFORMS=axon is in the
# environment), so a plain env override is not enough -- force the platform
# through jax.config before the CPU client is instantiated.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: the protocol tests trace many small shapes;
# re-runs hit the disk cache instead of recompiling
os.makedirs("/tmp/jaxcache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(12345)


@pytest.fixture(autouse=True)
def _clear_jax_caches_after_heavy_tests(request):
    """XLA:CPU's JIT segfaults inside backend_compile after enough live
    executables accumulate in one process (reproduced: the 4th e2e protocol
    run in a row dies in backend_compile_and_load with 8 GB RSS on a 125 GB
    box).  Dropping compiled programs between protocol-scale tests keeps the
    process under the bug's threshold; the persistent disk cache makes the
    re-tracing cheap."""
    yield
    if "e2e" in request.node.nodeid:
        jax.clear_caches()
