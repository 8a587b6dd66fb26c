"""Device-mesh parallelism: data-parallel training, track-sharded evaluation.

The reference is single-device (SURVEY.md 2.10: no torch.distributed of any
kind); this package is the TPU-native scaling layer built on
jax.sharding.Mesh + NamedSharding. XLA inserts the ICI collectives (psum for
gradients and BatchNorm statistics) from the sharding annotations.
"""

from .mesh import (
    local_mesh_devices,
    make_mesh,
    replicate,
    shard_batch,
    shard_targets,
    target_shardings,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "local_mesh_devices",
    "shard_targets",
    "target_shardings",
]
