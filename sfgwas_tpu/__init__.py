"""sfgwas_tpu: TPU-native secure federated GWAS framework."""

import ctypes as _ctypes
import os as _os

# Persistent XLA compilation cache: protocol kernels compile once per
# machine instead of once per process (compiles dominate cold-start on
# small hosts; a full keygen's kernels alone are ~2 min of compile).
_os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    _os.path.expanduser("~/.cache/sfgwas_jax_cache"),
)
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


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
