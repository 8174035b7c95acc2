"""Cross-replica collectives: global in-batch negatives and top-k merge.

Two north-star upgrades over the single-device reference
(/root/reference/twotower/losses.py:88-118 and inference/search/
two_tower.py:98-105):

* ``global_in_batch_loss`` — the in-batch softmax's negative pool grows with
  the pod: each data-parallel replica all-gathers every replica's document
  vectors over ICI, so logits are (B_local, B_global) and the diagonal label
  for replica r row i is ``r * B_local + i``. Gradients flow through
  ``all_gather`` correctly (its transpose is ``psum_scatter``), giving every
  replica's documents gradient contributions from every replica's queries —
  exactly the global-batch softmax gradient.
* ``sharded_topk_merge`` — per-shard top-k results (values, indices) are
  all-gathered and re-reduced with one more ``top_k``, which is exact: the
  global top-k is always contained in the union of per-shard top-ks.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.nn import log_softmax
from jax.sharding import Mesh, PartitionSpec as P

from ..models.losses import NEG_INF
from ..ops.core import cosine_similarity
from .mesh import DATA_AXIS


def _global_in_batch_body(
    q: jnp.ndarray, docs: jnp.ndarray, weights: jnp.ndarray,
    *, temperature: float, axis_name: str,
):
    """Per-replica body. q/docs: (B_local, D); weights: (B_local,)."""
    replica = jax.lax.axis_index(axis_name)
    b_local = q.shape[0]

    all_docs = jax.lax.all_gather(docs, axis_name, tiled=True)      # (B_global, D)
    all_weights = jax.lax.all_gather(weights, axis_name, tiled=True)  # (B_global,)

    logits = (q @ all_docs.T) / temperature                          # (B_local, B_global)
    labels = replica * b_local + jnp.arange(b_local)                 # diagonal offset

    # pad rows anywhere in the global batch must not serve as negatives
    col_mask = all_weights.astype(jnp.bool_)[None, :]
    eye = jax.nn.one_hot(labels, all_docs.shape[0], dtype=jnp.bool_)
    masked = jnp.where(col_mask | eye, logits, NEG_INF)

    per_sample = -jnp.take_along_axis(
        log_softmax(masked, axis=-1), labels[:, None], axis=-1
    )[:, 0]

    loss_sum = jnp.sum(per_sample * weights)
    weight_sum = jnp.sum(weights)
    loss_sum = jax.lax.psum(loss_sum, axis_name)
    weight_sum = jax.lax.psum(weight_sum, axis_name)
    loss = loss_sum / jnp.maximum(weight_sum, 1.0)

    sims = cosine_similarity(q, docs)
    pos = jax.lax.psum(jnp.sum(sims * weights), axis_name) / jnp.maximum(weight_sum, 1.0)
    neg_rowsum = jnp.sum((q @ all_docs.T) * all_weights[None, :], axis=1)
    diag = jnp.sum(q * docs, axis=-1)
    denom = jnp.maximum(weight_sum - 1.0, 1.0)
    neg_mean = (neg_rowsum - diag) / denom
    neg = jax.lax.psum(jnp.sum(neg_mean * weights), axis_name) / jnp.maximum(weight_sum, 1.0)
    return loss, {"pos_similarity": pos, "neg_similarity": neg}


def global_in_batch_loss(
    q: jnp.ndarray,
    docs: jnp.ndarray,
    weights: Optional[jnp.ndarray],
    mesh: Mesh,
    temperature: float = 0.1,
):
    """In-batch softmax with negatives all-gathered across the data axis.

    On a 1-wide data axis this reduces exactly to the local in-batch loss.
    Inputs are globally-shaped arrays sharded P('data', ...) under jit.
    """
    if weights is None:
        weights = jnp.ones(q.shape[0], q.dtype)
    fn = jax.shard_map(
        partial(_global_in_batch_body, temperature=temperature, axis_name=DATA_AXIS),
        mesh=mesh,
        in_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None), P(DATA_AXIS)),
        out_specs=(P(), {"pos_similarity": P(), "neg_similarity": P()}),
    )
    return fn(q, docs, weights)


def _topk_merge_body(scores: jnp.ndarray, indices: jnp.ndarray,
                     *, k: int, axis_name: str):
    """scores/indices: (Q, k) local winners with *global* document indices."""
    all_scores = jax.lax.all_gather(scores, axis_name, axis=1, tiled=True)   # (Q, S*k)
    all_indices = jax.lax.all_gather(indices, axis_name, axis=1, tiled=True)
    best, pos = jax.lax.top_k(all_scores, k)
    return best, jnp.take_along_axis(all_indices, pos, axis=1)


def sharded_topk_merge(
    scores: jnp.ndarray, indices: jnp.ndarray, mesh: Mesh, k: int,
    axis: str = "model",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Merge per-shard top-k into the exact global top-k (replicated out)."""
    fn = jax.shard_map(
        partial(_topk_merge_body, k=k, axis_name=axis),
        mesh=mesh,
        in_specs=(P(None, axis), P(None, axis)),
        out_specs=(P(), P()),
        # outputs are replicated by construction (every shard all-gathers the
        # same winners and reduces identically), but the static VMA check
        # can't infer that through all_gather
        check_vma=False,
    )
    return fn(scores, indices)
