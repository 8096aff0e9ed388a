"""sfgwas_tpu: TPU-native secure federated GWAS framework."""

import ctypes as _ctypes
import os as _os

# Persistent XLA compilation cache: protocol kernels compile once per
# machine instead of once per process (compiles dominate cold-start on
# small hosts; the PN14 matmult kernel alone is ~3.5 min of compile).
# The installed jax does not read JAX_COMPILATION_CACHE_DIR from the
# environment, so set it through jax.config (jax is a hard dependency of
# every module here; importing it at package init costs nothing extra).
_os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    _os.path.expanduser("~/.cache/sfgwas_jax_cache"),
)


def _enable_jax_compilation_cache():
    try:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ["JAX_COMPILATION_CACHE_DIR"],
        )
        # persist EVERY compile: the axon remote-compile path costs
        # ~0.5 s even for one-op eager kernels, and a protocol run
        # dispatches hundreds of distinct (op, shape) pairs
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - cache is an optimization only
        pass


_enable_jax_compilation_cache()


def _tune_malloc():
    """Keep large freed buffers in the malloc arena instead of munmap'ing
    them back to the OS.  On lazily-faulted VM memory (snapshot-restored
    hosts) every fresh mmap page costs a slow first touch; reusing arena
    pages makes repeated large numpy temporaries ~50x faster."""
    try:
        libc = _ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(-3, 1 << 30)  # M_MMAP_THRESHOLD: 1 GB
        libc.mallopt(-1, 1 << 30)  # M_TRIM_THRESHOLD: never trim below 1 GB
    except Exception:
        pass


_tune_malloc()
