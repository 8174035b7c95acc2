"""Row-sharded vocabulary embedding lookup (shard_map + psum).

The north-star TP component (BASELINE.json): the (V, D) embedding table is
split by rows across the mesh 'model' axis so each chip holds V/M rows in
HBM. The lookup runs under ``shard_map``: every shard gathers the ids it
owns from its local rows (out-of-range ids clamp to 0 and mask to zero) and
one ``psum`` over the model axis assembles the full (B, L, D) activations.
This is mathematically a one-hot × table matmul partitioned on the
contraction dimension — the canonical TP pattern — so a single reduction
replaces the reference-style full-table gather, and reverse-mode AD yields
the correct local scatter-add for the table gradient automatically
(psum's transpose is identity; the masked gather transposes to a masked
scatter-add into the owning shard only).

Why not all_to_all bucketing (SURVEY.md §7.3's sketch): bucketed exchange
needs static per-shard bucket capacities and duplicate-id handling; the
mask+psum form is jit-static, duplicate-safe, and moves (B·L·D)/shard bytes
over ICI — cheaper than the table all-gather XLA tends to pick for a plain
``jnp.take`` on a sharded operand, and free of ragged shapes.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS


def shard_vocab_rows(vocab_size: int, num_shards: int) -> int:
    """Rows per shard after padding the vocab to a multiple of the axis."""
    return -(-vocab_size // num_shards)


def pad_table_for_sharding(table: jnp.ndarray, num_shards: int) -> jnp.ndarray:
    """Zero-pad the table's row axis so it divides evenly across shards."""
    vocab, dim = table.shape
    padded = shard_vocab_rows(vocab, num_shards) * num_shards
    if padded == vocab:
        return table
    return jnp.concatenate(
        [table, jnp.zeros((padded - vocab, dim), table.dtype)], axis=0
    )


def _local_gather(local_table: jnp.ndarray, ids: jnp.ndarray,
                  axis_name: str) -> jnp.ndarray:
    """Per-shard body: gather owned rows, zero the rest, reduce across shards.

    The gather's transpose routes through the Pallas VMEM scatter-add
    (kernels/pallas_scatter_add.py) when the per-shard accumulator fits —
    sharding a large vocabulary is exactly what shrinks each shard back into
    the fast single-block regime (BASELINE.md vocab-scaling table). Unowned
    ids clamp into range and their cotangents are zeroed by the mask's
    transpose, so they scatter nothing.
    """
    from ..kernels.pallas_scatter_add import take_fast_grad

    rows = local_table.shape[0]
    shard = jax.lax.axis_index(axis_name)
    offset = shard * rows
    local_ids = ids - offset
    owned = (local_ids >= 0) & (local_ids < rows)
    clamped = jnp.clip(local_ids, 0, rows - 1)
    gathered = take_fast_grad(local_table, clamped)
    gathered = jnp.where(owned[..., None], gathered, 0.0)
    return jax.lax.psum(gathered, axis_name)


def sharded_embed_ids(
    table: jnp.ndarray,
    ids: jnp.ndarray,
    mesh: Mesh,
    *,
    data_spec: Optional[P] = None,
    dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Lookup ids in a row-sharded table; returns (B, L, D) activations.

    Args:
        table: (V_padded, D) table sharded (or shardable) as P('model', None).
        ids: (B, L) int32, sharded on the data axis.
        mesh: the ('data', 'model') mesh.
        data_spec: PartitionSpec of ``ids`` (default P('data', None)).

    Must be called under jit (with or without an outer mesh context).
    """
    if data_spec is None:
        data_spec = P("data", None)
    out_spec = P(*data_spec, None)

    fn = jax.shard_map(
        partial(_local_gather, axis_name=MODEL_AXIS),
        mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), data_spec),
        out_specs=out_spec,
    )
    return fn(table.astype(dtype), ids)
