"""Pallas kernel: fused dot-product scoring + streaming top-k.

The retrieval engine's hot path (north star, BASELINE.json): score Q query
vectors against N document vectors and keep each query's top-k — without
ever materialising the (Q, N) score matrix in HBM, which is what the XLA
matmul + ``lax.top_k`` path does (for Q=256, N=1M that intermediate is 1 GB
of HBM round-trip; document reads themselves are only ~0.5 GB).

Design: grid over document tiles. Queries stay VMEM-resident across the
whole sweep; each step runs one (Q, D) x (D, T) MXU matmul, masks rows past
``n_docs``, and folds the tile into a running (Q, k) selection held in VMEM
scratch (TPU grid steps run sequentially, so scratch carries state). The
merge is selection-sort-style: k iterations of row-max + index extraction +
knockout over the (Q, k+T) candidate matrix — pure VPU work, O(k(k+T))
per row vs the matmul's O(D·T), negligible for k ≤ 64. Ties break toward
the lower document index (XLA top_k's first-occurrence order).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# plain python scalars: jnp constants would be captured as kernel consts,
# which pallas_call rejects
NEG_INF = -1e30
BIG_IDX = 2**30
DEFAULT_TILE_N = 2048
LANE = 128


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _select_topk(vals: jnp.ndarray, idxs: jnp.ndarray, k: int):
    """(Q, C) candidates -> ((Q, k) best, ties to smallest doc index,
    plus the (Q, 1) k-th best value for threshold pruning)."""
    out_vals = []
    out_idxs = []
    best = None
    for _ in range(k):
        best = jnp.max(vals, axis=1, keepdims=True)                 # (Q, 1)
        is_best = vals >= best                                      # ties included
        cand_idx = jnp.where(is_best, idxs, BIG_IDX)
        chosen = jnp.min(cand_idx, axis=1, keepdims=True)           # (Q, 1)
        out_vals.append(best)
        out_idxs.append(chosen)
        knockout = idxs == chosen
        vals = jnp.where(knockout, NEG_INF, vals)
    return jnp.concatenate(out_vals, axis=1), jnp.concatenate(out_idxs, axis=1), best


def _kernel(n_docs_ref, q_ref, docs_ref, out_vals_ref, out_idx_ref,
            run_vals, run_idx, run_kth, *, k: int, k_store: int, tile_n: int):
    """Selection runs k true iterations; scratch/outputs are lane-padded to
    k_store columns (trailing columns stay NEG_INF/BIG_IDX sentinels).

    Threshold pruning: ``run_kth`` holds every query's current k-th best
    score broadcast across its row. A tile whose per-query maxima are all at
    or below that threshold cannot change any top-k, so the whole O(k·(k+T))
    selection merge is predicated away — after the first few tiles almost
    every tile skips it and the kernel runs at matmul speed.
    """
    step = pl.program_id(0)
    num_steps = pl.num_programs(0)
    q_rows = run_vals.shape[0]

    @pl.when(step == 0)
    def _init():
        run_vals[:] = jnp.full(run_vals.shape, NEG_INF, jnp.float32)
        run_idx[:] = jnp.full(run_idx.shape, BIG_IDX, jnp.int32)
        run_kth[:] = jnp.full(run_kth.shape, NEG_INF, jnp.float32)

    scores = jax.lax.dot_general(
        q_ref[:], docs_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),   # (Q, D) x (T, D)ᵀ
        preferred_element_type=jnp.float32,
    )  # (Q, T)

    base = step * tile_n
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + base
    valid = col < n_docs_ref[0]
    scores = jnp.where(valid, scores, NEG_INF)
    col = jnp.where(valid, col, BIG_IDX)

    tile_max = jnp.max(scores, axis=1, keepdims=True)        # (Q, 1)
    any_candidate = jnp.any(tile_max > run_kth[:])           # scalar

    @pl.when(any_candidate)
    def _merge():
        # dead k_store-k sentinel columns ride along; they never win a max
        vals = jnp.concatenate([run_vals[:], scores], axis=1)
        idxs = jnp.concatenate([run_idx[:], col], axis=1)
        new_vals, new_idx, kth = _select_topk(vals, idxs, k)
        run_kth[:] = jnp.broadcast_to(kth, run_kth.shape)
        pad = k_store - k
        if pad:
            new_vals = jnp.concatenate(
                [new_vals, jnp.full((q_rows, pad), NEG_INF, jnp.float32)], axis=1)
            new_idx = jnp.concatenate(
                [new_idx, jnp.full((q_rows, pad), BIG_IDX, jnp.int32)], axis=1)
        run_vals[:] = new_vals
        run_idx[:] = new_idx

    @pl.when(step == num_steps - 1)
    def _emit():
        out_vals_ref[:] = run_vals[:]
        out_idx_ref[:] = run_idx[:]


def _score_topk_pallas(
    doc_matrix: jnp.ndarray,
    queries: jnp.ndarray,
    k: int,
    n_docs: jnp.ndarray,
    *,
    tile_n: int,
    interpret: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    n, dim = doc_matrix.shape
    q = queries.shape[0]
    n_padded = _round_up(n, tile_n)
    if n_padded != n:
        doc_matrix = jnp.concatenate(
            [doc_matrix, jnp.zeros((n_padded - n, dim), doc_matrix.dtype)], axis=0
        )
    q_padded = _round_up(q, 8)
    if q_padded != q:
        queries = jnp.concatenate(
            [queries, jnp.zeros((q_padded - q, dim), queries.dtype)], axis=0
        )
    k_padded = _round_up(k, LANE)  # scratch/output lane alignment

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_padded // tile_n,),
        in_specs=[
            pl.BlockSpec((q_padded, dim), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, dim), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((q_padded, k_padded), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_padded, k_padded), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((q_padded, k_padded), jnp.float32),
            pltpu.VMEM((q_padded, k_padded), jnp.int32),
            pltpu.VMEM((q_padded, LANE), jnp.float32),  # kth-best threshold
        ],
    )
    vals, idx = pl.pallas_call(
        functools.partial(_kernel, k=k, k_store=k_padded, tile_n=tile_n),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((q_padded, k_padded), jnp.float32),
            jax.ShapeDtypeStruct((q_padded, k_padded), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * q_padded * n_padded * dim,
            bytes_accessed=(n_padded * dim * doc_matrix.dtype.itemsize
                            + q_padded * dim * 4 + 2 * q_padded * k_padded * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray([n_docs], jnp.int32).reshape(1), queries, doc_matrix)
    return vals[:q, :k], idx[:q, :k]


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def score_topk_pallas(
    doc_matrix: jnp.ndarray,
    queries: jnp.ndarray,
    k: int,
    n_docs=None,
    *,
    tile_n: int = DEFAULT_TILE_N,
    interpret: Optional[bool] = None,
) -> Optional[Tuple[jnp.ndarray, jnp.ndarray]]:
    """ops.topk_score-compatible entry; returns None for shapes it declines
    (huge k, tiny corpora where XLA's one-shot path wins)."""
    n, dim = doc_matrix.shape
    if k > 256 or n < 2 * tile_n:
        return None
    if queries.shape[0] > 1024:
        return None  # VMEM-resident query block would not fit
    if interpret is None:
        interpret = not _on_tpu()
    if n_docs is None:
        n_docs = n
    return _score_topk_pallas(
        doc_matrix, queries.astype(doc_matrix.dtype), k,
        jnp.asarray(n_docs, jnp.int32), tile_n=tile_n, interpret=interpret,
    )
