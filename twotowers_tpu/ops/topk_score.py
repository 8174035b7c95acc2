"""Dense scoring + top-k over a document matrix.

This is the compute core of the retrieval engine that replaces the
reference's pickle/brute-force scorer (/root/reference/inference/search/
two_tower.py:94-105: full cosine matrix then ``torch.topk``). The XLA path
below is a fused matmul + ``lax.top_k``; ``kernels/pallas_topk.py`` provides
the Pallas tile-streaming kernel for large document shards and registers
itself here, with this XLA path kept as the correctness reference A/B
(SURVEY.md §7.1 kernels plan).

Conventions: ``doc_matrix`` is (N_pad, D) with real rows [0, n_docs); padded
rows must score -inf. Query vectors are (Q, D). Both are expected L2-unit so
dot == cosine.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-1e30)


def score_topk_xla(
    doc_matrix: jnp.ndarray,
    queries: jnp.ndarray,
    k: int,
    n_docs: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k dot-product scores per query (XLA reference path).

    Args:
        doc_matrix: (N, D) document vectors (rows >= n_docs are padding).
        queries: (Q, D) query vectors.
        k: number of results per query (static).
        n_docs: optional scalar count of real rows; padded rows are masked.

    Returns:
        (scores, indices): both (Q, k), best-first.
    """
    scores = jnp.dot(
        queries, doc_matrix.T, preferred_element_type=jnp.float32
    )  # (Q, N)
    if n_docs is not None:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col < n_docs, scores, NEG_INF)
    return jax.lax.top_k(scores, k)


# The Pallas kernel registers itself here at import time (kernels package);
# falls back to XLA when unset or unsupported for the shape.
_pallas_impl: Optional[Callable[..., Tuple[jnp.ndarray, jnp.ndarray]]] = None


def register_pallas_impl(fn: Callable[..., Tuple[jnp.ndarray, jnp.ndarray]]) -> None:
    global _pallas_impl
    _pallas_impl = fn


def score_topk(
    doc_matrix: jnp.ndarray,
    queries: jnp.ndarray,
    k: int,
    n_docs: Optional[jnp.ndarray] = None,
    *,
    use_pallas: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dispatch to the Pallas kernel when registered and applicable."""
    if use_pallas and _pallas_impl is not None:
        out = _pallas_impl(doc_matrix, queries, k, n_docs)
        if out is not None:  # impl may decline shapes it doesn't cover
            return out
    return score_topk_xla(doc_matrix, queries, k, n_docs)
