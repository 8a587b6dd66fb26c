"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip sharding is validated on host CPU devices (the real TPU pod is not
available in CI); the driver separately dry-runs the multi-chip path via
__graft_entry__.dryrun_multichip.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The image's baked-in jax config defaults to platforms "axon,cpu" (tunneled
# TPU); the env var alone does not override it, so force CPU via the config.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_DIR, "xumx_slicq_v2"))


def import_reference():
    """Import the reference torch implementation for golden-parity tests."""
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    import xumx_slicq_v2  # noqa: F401
    return xumx_slicq_v2
