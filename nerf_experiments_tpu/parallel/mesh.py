"""Device mesh construction and sharding specs.

The reference has NO distributed training (single process, single device —
SURVEY.md §2.6/§5.8); this layer is the TPU-native scale-out it lacks:

  * mesh axes ("data", "model"): rays are the data axis (rays are
    embarrassingly parallel — no cross-chip communication inside the
    renderer); "model" optionally shards the wide MLP hidden dims for
    megacore/elastic layouts.
  * parameters: replicated by default; weight matrices with a
    model-shardable dimension get PartitionSpec(..., "model") when the model
    axis is >1.
  * gradients: psum over "data" — inserted by XLA from the sharding
    annotations under jit (pjit style); no hand-written collectives needed
    on the hot path.

Collectives ride ICI within a slice; DCN multi-slice falls out of the same
specs with a wider mesh.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
HOST_AXIS = "host"  # outer data-parallel axis riding DCN across slices


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
    n_hosts: int = 1,
) -> Mesh:
    """Mesh over (data, model), or (host, data, model) when n_hosts > 1.

    The host axis is an OUTER batch axis: rays are sharded over
    (host x data) jointly, so the gradient all-reduce decomposes into a
    fast ICI reduce within each slice plus one DCN reduce across slices —
    the standard multi-slice data-parallel layout. Model sharding stays
    within a slice (ICI-only collectives on the hidden dims).
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // (n_model * n_hosts)
    assert n_hosts * n_data * n_model == len(devices), (
        f"mesh {n_hosts}x{n_data}x{n_model} != {len(devices)} devices"
    )
    if n_hosts > 1:
        return Mesh(
            np.asarray(devices).reshape(n_hosts, n_data, n_model),
            (HOST_AXIS, DATA_AXIS, MODEL_AXIS),
        )
    return Mesh(np.asarray(devices).reshape(n_data, n_model), (DATA_AXIS, MODEL_AXIS))


def data_axes(mesh: Mesh):
    """The batch-sharding axes: ("host", "data") on multi-slice meshes."""
    if HOST_AXIS in mesh.axis_names:
        return (HOST_AXIS, DATA_AXIS)
    return (DATA_AXIS,)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Ray batches: sharded over the (host x) data axes on their leading dim."""
    return NamedSharding(mesh, P(data_axes(mesh)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_spec(shape, n_model: int, min_dim: int = 256) -> P:
    """Spec for one parameter: shard the last dim over "model" when it is
    large enough AND evenly divisible by the model axis; replicate otherwise
    (odd dims like the hidden+density 257-wide segment head stay replicated)."""
    if (
        n_model > 1
        and len(shape) >= 2
        and shape[-1] >= min_dim
        and shape[-1] % n_model == 0
    ):
        return P(*([None] * (len(shape) - 1) + [MODEL_AXIS]))
    return P()


def shard_params(params, mesh: Mesh, model_parallel: Optional[bool] = None):
    """Place a param pytree on the mesh: replicate small leaves, shard large
    matrices' output dim over "model" when the model axis is >1."""
    n_model = mesh.shape[MODEL_AXIS] if model_parallel is not False else 1

    def place(leaf):
        spec = param_spec(leaf.shape, n_model)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, params)


def shard_batch(batch, mesh: Mesh):
    """Shard every batch leaf over the data axis (leading dim)."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
