"""Pallas kernel: fused dot-product scoring + streaming top-k.

The retrieval engine's hot path (north star, BASELINE.json): score Q query
vectors against N document vectors and keep each query's top-k — without
ever materialising the (Q, N) score matrix in HBM, which is what the XLA
matmul + ``lax.top_k`` path does (for Q=256, N=1M that intermediate is 1 GB
of HBM round-trip; document reads themselves are only ~0.5 GB).

Design: grid over document tiles. Queries stay VMEM-resident across the
whole sweep; each step runs one (Q, D) x (D, T) MXU matmul and folds the
tile into a running (Q, k_store) selection held in VMEM scratch (TPU grid
steps run sequentially, so scratch carries state).

Two levels of work-skipping keep the sweep at matmul/DMA speed:

1. Tile prune: ``run_kth`` holds every query's current k-th best score. A
   tile whose per-query maxima are all at or below that threshold cannot
   change any top-k, so the merge is predicated away entirely — after the
   first few tiles most tiles skip it.
2. Demand-driven merge: the running top-k is kept SORTED (descending, XLA
   top_k tie order). A firing tile is drained by a ``while_loop`` that
   extracts the tile max, sorted-inserts it, knocks it out, and repeats only
   while some query still improves — typically 1-3 iterations instead of a
   fixed k passes over the (Q, k+T) candidate matrix. Ties break toward the
   lower document index (XLA top_k's first-occurrence order): within a tile
   via min-index extraction, across tiles because insertion goes after
   equal-valued incumbents, which always carry lower doc indices.
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


def _kernel(n_docs_ref, q_ref, docs_ref, out_vals_ref, out_idx_ref,
            run_vals, run_idx, run_kth, work,
            *, k: int, k_store: int, tile_n: int):
    step = pl.program_id(0)
    num_steps = pl.num_programs(0)

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
    # Padded doc rows (zero vectors, score 0) exist only in the final tile;
    # masking them is deferred into the merge so the common per-tile path is
    # just matmul + one row-max + the prune test. A padded zero score can at
    # worst trigger one spurious merge on that final tile.
    tile_max = jnp.max(scores, axis=1, keepdims=True)            # (Q, 1)
    any_candidate = jnp.any(tile_max > run_kth[:, :1])           # scalar

    @pl.when(any_candidate)
    def _merge():
        local = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        work[:] = jnp.where(local < (n_docs_ref[0] - base), scores, NEG_INF)
        lane = jax.lax.broadcasted_iota(jnp.int32, (run_vals.shape[0], k_store), 1)
        kth_lane = lane == (k - 1)

        def cond(carry):
            smax, rv, ri, kth = carry
            return jnp.any(smax > kth)

        def body(carry):
            smax, rv, ri, kth = carry
            s = work[:]
            v = smax                                              # (Q, 1)
            cand = jnp.where(s >= v, local, BIG_IDX)
            loc = jnp.min(cand, axis=1, keepdims=True)            # (Q, 1)
            s = jnp.where(local == loc, NEG_INF, s)               # knockout
            work[:] = s
            improve = v > kth                                     # (Q, 1)

            # sorted insert of (v, loc+base) after equal-valued incumbents;
            # masks as int32 (Mosaic rejects shifted/concatenated i1 vectors)
            ge = jnp.where(rv >= v, 1, 0)                         # prefix of 1s
            ge_prev = jnp.where(lane == 0, 1, pltpu.roll(ge, 1, axis=1))
            at_slot = (ge_prev == 1) & (ge == 0)
            rv_shift = pltpu.roll(rv, 1, axis=1)
            ri_shift = pltpu.roll(ri, 1, axis=1)
            new_rv = jnp.where(ge == 1, rv, jnp.where(at_slot, v, rv_shift))
            new_ri = jnp.where(ge == 1, ri,
                               jnp.where(at_slot, loc + base, ri_shift))
            rv = jnp.where(improve, new_rv, rv)
            ri = jnp.where(improve, new_ri, ri)
            kth = jnp.sum(jnp.where(kth_lane, rv, 0.0), axis=1, keepdims=True)
            smax = jnp.max(s, axis=1, keepdims=True)
            return (smax, rv, ri, kth)

        init = (jnp.max(work[:], axis=1, keepdims=True),
                run_vals[:], run_idx[:], run_kth[:, :1])
        _, rv, ri, kth = jax.lax.while_loop(cond, body, init)
        run_vals[:] = rv
        run_idx[:] = ri
        run_kth[:] = jnp.broadcast_to(kth, run_kth.shape)

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
            pltpu.VMEM((q_padded, tile_n), jnp.float32),  # merge workspace
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


def _auto_tile(q: int, dim: int, itemsize: int) -> int:
    """Largest doc tile whose VMEM footprint stays safe for this Q.

    Measured (TOPK_TILE_SWEEP.json, two independent rounds): at Q=1 the
    16384-row tile is consistently fastest (~0.75-0.81 ms vs 0.81-1.36 at
    2048 over 1M x 128 — fewer grid steps amortise per-step DMA/update
    overhead), while at Q=256 larger tiles OOM scoped VMEM (the (Q, T) f32
    merge workspace dominates) and 4096 measured no better than 2048. So:
    grow the tile only while the workspace term stays small (<=2 MB, which
    leaves Q=256 exactly at the proven 2048 default) and the doc
    double-buffer + workspace fit comfortably under the 16 MB scoped
    budget."""
    q_padded = _round_up(max(q, 1), 8)
    tile = DEFAULT_TILE_N
    for cand in (4096, 8192, 16384):
        workspace = q_padded * cand * 4
        doc_buffers = 2 * cand * dim * itemsize
        if workspace <= 2 * 1024 * 1024 and \
                workspace + doc_buffers <= 12 * 1024 * 1024:
            tile = cand
    return tile


def score_topk_pallas(
    doc_matrix: jnp.ndarray,
    queries: jnp.ndarray,
    k: int,
    n_docs=None,
    *,
    tile_n: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> Optional[Tuple[jnp.ndarray, jnp.ndarray]]:
    """ops.topk_score-compatible entry; returns None for shapes it declines
    (huge k, tiny corpora where XLA's one-shot path wins)."""
    n, dim = doc_matrix.shape
    if tile_n is None:
        tile_n = _auto_tile(queries.shape[0], dim, doc_matrix.dtype.itemsize)
        # shrink for mid-size corpora so the kernel stays applicable down
        # to the same 2*DEFAULT_TILE_N threshold as before
        while tile_n > DEFAULT_TILE_N and n < 2 * tile_n:
            tile_n //= 2
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
