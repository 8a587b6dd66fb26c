"""Runtime helpers: persistent compilation cache and profiling.

The flagship pipeline is a large XLA program (70 heterogeneous buckets);
first-compile takes minutes on TPU. The persistent compilation cache makes
that a once-per-machine cost instead of once-per-process (the reference's
analogue is cuDNN benchmark autotuning + warmup reps,
training.py:459-476, separator.py:83-91).
"""

import os
from contextlib import contextmanager
from pathlib import Path

_CACHE_ENABLED = False
DEFAULT_CACHE_DIR = os.environ.get(
    "XUMX_SLICQ_TPU_CACHE", str(Path.home() / ".cache" / "xumx_slicq_tpu" / "xla")
)


def enable_compilation_cache(cache_dir: str = None):
    """Enable JAX's persistent compilation cache (idempotent)."""
    global _CACHE_ENABLED
    if _CACHE_ENABLED:
        return
    import jax

    cache_dir = cache_dir or DEFAULT_CACHE_DIR
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _CACHE_ENABLED = True
    except Exception:
        pass  # older jax without the knobs; run uncached


_MALLOC_REUSE = False


def enable_host_malloc_reuse():
    """Keep freed large blocks in the glibc heap instead of returning them
    to the kernel (idempotent; no-op where glibc is absent).

    numpy routes array data through malloc; with the default
    M_MMAP_THRESHOLD (128 KB) every multi-MB temporary is a fresh
    mmap/munmap pair, so each allocation re-faults all its pages. On hosts
    with slow first-touch faults (measured here: ~0.01-0.1 GB/s on this
    box's network-attached memory, vs 3.7-7.3 GB/s streaming over touched
    pages) that dominates any numpy-heavy path — host BSS-eval spent >70%
    of its wall-clock in page faults. Raising the mmap/trim thresholds
    makes the heap an arena: pages fault once per process, then recycle.
    Costs RSS (the high-water working set stays resident); call it from
    CLI entry points, not at library import."""
    global _MALLOC_REUSE
    if _MALLOC_REUSE:
        return
    import ctypes

    try:
        libc = ctypes.CDLL("libc.so.6")
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        libc.mallopt(M_MMAP_THRESHOLD, 1 << 30)
        libc.mallopt(M_TRIM_THRESHOLD, 1 << 30)
        _MALLOC_REUSE = True
    except Exception:
        pass


def device_platform() -> str:
    import jax

    return jax.devices()[0].platform


@contextmanager
def profile_trace(logdir: str):
    """jax.profiler trace context (TPU equivalent of the reference's
    wall-clock timing practice; view with tensorboard/xprof)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
