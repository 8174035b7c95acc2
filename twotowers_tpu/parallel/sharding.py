"""Sharding layouts for params and batches over the ('data','model') mesh.

Placement policy (SURVEY.md §2.4 TPU-native column):
* embedding table — rows over 'model' when ``shard_vocab`` (TP for the only
  large tensor in the model); replicated otherwise;
* tower FFN params — tiny (≤ hidden²); replicated everywhere;
* optimizer state — follows its parameter's sharding (tree-mapped);
* batches — sharded over 'data' (pure DP of the towers).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.towers import TwoTowerSpec
from .embedding_shard import pad_table_for_sharding
from .mesh import DATA_AXIS, MODEL_AXIS


def param_specs(params: Any, shard_vocab: bool) -> Any:
    """PartitionSpec pytree matching the param pytree."""

    def spec_for(path, leaf) -> P:
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if shard_vocab and "embedding" in names and "table" in names:
            return P(MODEL_AXIS, None)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params: Any, mesh: Mesh, shard_vocab: bool) -> Any:
    """Place a param pytree onto the mesh (pads the vocab axis if needed)."""
    model_size = mesh.shape[MODEL_AXIS]
    if shard_vocab and model_size > 1:
        params = dict(params)
        params["embedding"] = {
            **params["embedding"],
            "table": pad_table_for_sharding(params["embedding"]["table"], model_size),
        }
    specs = param_specs(params, shard_vocab)
    return jax.tree_util.tree_map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        params, specs,
    )


def batch_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """NamedSharding for a batch-major array: leading axis over 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_batch_to_multiple(array, multiple: int):
    """Pad the leading axis to a multiple (needed so 'data' divides B)."""
    import numpy as np

    n = array.shape[0]
    target = -(-n // multiple) * multiple
    if target == n:
        return array
    pad_width = [(0, target - n)] + [(0, 0)] * (array.ndim - 1)
    return np.pad(np.asarray(array), pad_width)
