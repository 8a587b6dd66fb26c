"""Mesh construction and sharding helpers.

Model scale (15 M params) makes data parallelism the primary mapping
(SURVEY.md 2.10): parameters are replicated, the batch axis is sharded over
the "dp" mesh axis. Gradients and BatchNorm batch statistics reduce over ICI
automatically -- jit sees the shardings and inserts psum where a reduction
crosses the sharded axis (giving cross-replica sync-BN, which the reference
could not do).

On top of dp the model exposes a natural *target-parallel* ("tp") axis:
every mask-network weight is stacked over the 4 separation targets
(models/cdae.py, models/lstm.py), so sharding that leading axis over a
second mesh axis splits the per-target CDAE/LSTM compute across devices.
The embedded Wiener-EM couples targets (its covariance mixes sources), so
XLA inserts the all-gather there; everything upstream runs 4/tp targets
per device. Use `make_mesh(n, tp=2)` + `shard_targets` for the hybrid
layout.

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


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp", platform: Optional[str] = None,
              tp: int = 1) -> Mesh:
    """Device mesh over the batch ("dp") axis, optionally 2-D with a
    target-parallel ("tp") second axis (tp must divide the device count;
    meaningful values are 1, 2, 4 — the 4 separation targets)."""
    devs = local_mesh_devices(n_devices, platform)
    if tp <= 1:
        return Mesh(np.asarray(devs), (axis,))
    if len(devs) % tp != 0:
        raise ValueError(f"{len(devs)} devices not divisible by tp={tp}")
    return Mesh(np.asarray(devs).reshape(len(devs) // tp, tp), (axis, "tp"))


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


NB_TARGETS = 4  # bass/vocals/other/drums — the stacked leading weight axis

# Every parameter/BN-state name whose leaf is stacked (4, ...) over the
# separation targets (models/cdae.py init_cdae_params, models/lstm.py
# init_lstm_params). AdamW moment trees mirror the param tree, so the same
# names identify their moments. Names NOT here (input_mean/input_scale,
# optimizer scalars) are replicated regardless of shape — a future
# non-target tensor whose leading dim happens to be 4 cannot be sharded
# by accident (ADVICE r2).
_TARGET_STACKED_NAMES = frozenset({
    # CDAE
    "enc1_w", "enc2_w", "dec1_w", "dec2_w", "dec2_b",
    # BN params/stats (always nested under bn1/bn2/bn3)
    "scale", "bias", "mean", "var",
    # LSTM
    "fc1_w", "fc2_w", "fc3_w", "fc3_b",
    "w_ih", "w_hh", "b_ih", "b_hh",
    "w_ih_reverse", "w_hh_reverse", "b_ih_reverse", "b_hh_reverse",
})


def _leaf_name(path) -> str:
    """Last dict key on a pytree path (skips list indices/attr wrappers)."""
    for entry in reversed(path):
        if isinstance(entry, jax.tree_util.DictKey):
            return str(entry.key)
        if isinstance(entry, jax.tree_util.GetAttrKey):
            return str(entry.name)
    return ""


def target_shardings(tree, mesh: Mesh, n_targets: int = NB_TARGETS):
    """Sharding pytree for model/optimizer state on a tp mesh.

    A leaf shards its leading axis over "tp" iff it is a known
    target-stacked parameter/BN name (_TARGET_STACKED_NAMES — matched by
    pytree path, so AdamW moments qualify through their mirrored param
    names) AND carries the (n_targets, ...) stacked shape. Everything else
    (per-bucket whitening vectors, scalars, step counts) is replicated.
    On a mesh without a "tp" axis this degenerates to full replication."""
    has_tp = "tp" in mesh.axis_names and mesh.shape["tp"] > 1
    repl = NamedSharding(mesh, P())
    tp = NamedSharding(mesh, P("tp")) if has_tp else repl

    def spec(path, x):
        if (
            has_tp
            and _leaf_name(path) in _TARGET_STACKED_NAMES
            and getattr(x, "ndim", 0) >= 2
            and x.shape[0] == n_targets
        ):
            return tp
        return repl

    return jax.tree_util.tree_map_with_path(spec, tree)


def shard_targets(tree, mesh: Mesh, n_targets: int = NB_TARGETS):
    """Place model/optimizer state with target-stacked weights sharded
    over the mesh's "tp" axis (replicated elsewhere)."""
    return jax.tree.map(
        jax.device_put, tree, target_shardings(tree, mesh, n_targets)
    )
