"""Runtime utilities: compilation cache, profiling helpers, device info."""

from .runtime import (
    enable_compilation_cache,
    enable_host_malloc_reuse,
    profile_trace,
    device_platform,
)

__all__ = [
    "enable_compilation_cache",
    "enable_host_malloc_reuse",
    "profile_trace",
    "device_platform",
]
