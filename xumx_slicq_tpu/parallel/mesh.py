"""Mesh construction and sharding helpers.

Model scale (15 M params) makes pure data parallelism the right mapping
(SURVEY.md 2.10): parameters are replicated, the batch axis is sharded over
a 1-D "dp" mesh. Gradients and BatchNorm batch statistics reduce over ICI
automatically -- jit sees the shardings and inserts psum where a reduction
crosses the sharded axis (giving cross-replica sync-BN, which the reference
could not do).

Evaluation shards *tracks* over the same mesh (see evaluation.py): each
device demixes different songs; only scalar metrics are gathered.
"""

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def local_mesh_devices(n_devices: Optional[int] = None, platform: Optional[str] = None):
    devs = jax.devices(platform) if platform else jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(f"requested {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return devs


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp", platform: Optional[str] = None) -> Mesh:
    """1-D device mesh over the batch ("dp") axis."""
    devs = local_mesh_devices(n_devices, platform)
    return Mesh(np.asarray(devs), (axis,))


def shard_batch(batch, mesh: Mesh, axis: str = "dp"):
    """Place a host array with its leading axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.device_put(batch, sharding)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def batch_pspec(axis: str = "dp") -> P:
    return P(axis)
