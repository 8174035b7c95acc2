"""Pallas kernel: row scatter-add for the embedding-table gradient.

The autodiff transpose of an embedding gather is ``zeros(V, D).at[ids].add(g)``.
XLA lowers that to a row-serial HBM scatter that runs at a fixed ~17 ns/row on
TPU regardless of vocabulary size — 52 ms for the 3.1M-row cotangent of one
word-vocab training step, 6.5x the rest of the step combined
(VOCAB_SCALING.json; the reference hits the same wall as torch CPU
scatter_add_, /root/reference/twotower/embeddings.py backward).

TPU-native formulation: stream the cotangent rows once, sequentially, from HBM
and confine the random access to a VMEM-resident f32 accumulator. Each grid
step DMAs a (TILE_N, D) tile of ``g`` into VMEM and an id tile into SMEM, then
a scalar loop performs read-modify-write rows into the accumulator, manually
unrolled 8x so Mosaic can overlap the address computations and loads of
independent rows (measured 17.4 ms vs 28.8 ms un-unrolled vs 52.5 ms XLA at
32k x 64; tools/exp_pallas_embed2.py). Mosaic preserves program order between
aliasing dynamic VMEM accesses, so duplicate ids inside an unroll group
accumulate correctly — verified against the XLA scatter under zipf ids where
in-group duplicates are guaranteed.

Tables larger than the VMEM budget fall back to a vocab-blocked grid: the
accumulator covers one vocabulary block per outer grid step, every id tile is
re-scanned per block, and rows outside the block are skipped behind a
``pl.when`` predicate. The scan cost grows with the block count, so the
single-block path is strongly preferred — at tens-of-thousands vocabularies
the TPU-native answer is to shard the vocabulary across the mesh
(parallel/embedding_shard.py) until each shard's accumulator fits VMEM.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 4096
UNROLL = 8
LANE = 128
# f32 accumulator bytes allowed to sit resident in VMEM (~16 MB/core total,
# minus double-buffered g tiles and headroom for the surrounding step)
VMEM_ACC_BUDGET = 10 * 1024 * 1024


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _kernel(ids_ref, g_ref, acc_ref, *, tile_n: int, block_rows: int,
            n_blocks: int):
    """One (vocab-block, id-tile) grid step: RMW this tile's rows into the
    VMEM accumulator. ids arrive in SMEM (scalar loop addressing), g in VMEM.
    Single-block tables skip the range predicate entirely."""
    blk = pl.program_id(0) if n_blocks > 1 else 0
    base = blk * block_rows

    @pl.when(pl.program_id(1) == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def body(i, _):
        start = i * UNROLL
        for u in range(UNROLL):
            j = start + u
            v = ids_ref[0, j]
            if n_blocks > 1:
                local = v - base

                @pl.when((local >= 0) & (local < block_rows))
                def _rmw():
                    acc_ref[local, :] += g_ref[j, :].astype(acc_ref.dtype)
            else:
                acc_ref[v, :] += g_ref[j, :].astype(acc_ref.dtype)
        return 0

    jax.lax.fori_loop(0, tile_n // UNROLL, body, 0, unroll=False)


def scatter_add_rows(
    g: jnp.ndarray,
    ids: jnp.ndarray,
    vocab: int,
    *,
    tile_n: int = TILE_N,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """``zeros((vocab, D), f32).at[ids].add(g)`` on the TPU fast path.

    ``g``: (N, D) cotangent rows (any float dtype), ``ids``: (N,) int32.
    Returns the f32 (vocab, D) gradient. Deterministic: rows accumulate in
    id-tile order, a fixed schedule.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if tile_n <= 0 or tile_n % UNROLL:
        raise ValueError(
            f"tile_n must be a positive multiple of {UNROLL}, got {tile_n}: "
            "the RMW loop runs tile_n // UNROLL unrolled groups and would "
            "silently skip tail rows otherwise")
    # Sub-32-bit rows pack multiple rows per sublane, which bans the dynamic
    # single-row loads the RMW loop needs ("index in dimension 0 must be a
    # multiple of 8"); widen on the XLA side — the extra streamed bytes are
    # noise next to the RMW loop.
    g = g.astype(jnp.float32)
    n, dim = g.shape

    # Pad N up to a whole number of tiles. Padding rows carry id 0 and a zero
    # g row, contributing exactly nothing to row 0.
    n_pad = _round_up(max(n, tile_n), tile_n)
    if n_pad != n:
        g = jnp.concatenate(
            [g, jnp.zeros((n_pad - n, dim), g.dtype)], axis=0)
        ids = jnp.concatenate(
            [ids, jnp.zeros((n_pad - n,), ids.dtype)], axis=0)

    # Lane-pad D. dim == 64 is measured fast unpadded (half-lane rows); other
    # non-multiples round up to full lanes for Mosaic.
    dim_padded = dim if dim % LANE in (0, 64) else _round_up(dim, LANE)
    if dim_padded != dim:
        g = jnp.concatenate(
            [g, jnp.zeros((n_pad, dim_padded - dim), g.dtype)], axis=1)

    row_bytes = dim_padded * 4
    # Sublane-align the accumulator block (vocab 30522 etc. would otherwise
    # hand Mosaic an unaligned VMEM output block); the result is sliced back
    # to [:vocab] below, and padding rows are never addressed.
    block_rows = min(_round_up(vocab, 8),
                     max(8, (VMEM_ACC_BUDGET // row_bytes) // 8 * 8))
    n_blocks = -(-vocab // block_rows)
    vocab_padded = n_blocks * block_rows

    acc = pl.pallas_call(
        functools.partial(_kernel, tile_n=tile_n, block_rows=block_rows,
                          n_blocks=n_blocks),
        grid=(n_blocks, n_pad // tile_n),
        in_specs=[
            pl.BlockSpec((1, tile_n), lambda b, i: (0, i),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_n, dim_padded), lambda b, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, dim_padded), lambda b, i: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((vocab_padded, dim_padded), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=n_pad * dim_padded * n_blocks,
            bytes_accessed=(n_pad * 4
                            + n_pad * dim_padded * g.dtype.itemsize) * n_blocks
                           + vocab_padded * dim_padded * 4,
            transcendentals=0,
        ),
        # Inside a fused training step XLA double-buffers the revisited
        # accumulator block, pushing peak scoped vmem past the default 16 MB
        # at a 32k x 64 table; the physical budget is larger, so raise the cap
        # instead of shrinking the accumulator into the slow multi-block path.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(2 * block_rows * dim_padded * 4
                              + 4 * tile_n * dim_padded * 4 + 2 ** 20),
        ),
        interpret=interpret,
    )(ids.reshape(1, -1).astype(jnp.int32), g)
    return acc[:vocab, :dim]


def scatter_add_supported(vocab: int, dim: int) -> bool:
    """True when the kernel path is expected to beat the XLA scatter: a
    single VMEM-resident accumulator block (multi-block re-scans every id
    tile per block, eroding the win — shard the vocab across the mesh
    instead)."""
    dim_padded = dim if dim % LANE in (0, 64) else _round_up(dim, LANE)
    return vocab * dim_padded * 4 <= VMEM_ACC_BUDGET


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _take_scatter_grad(table: jnp.ndarray, ids: jnp.ndarray,
                       dtype: jnp.dtype) -> jnp.ndarray:
    """jnp.take whose transpose is the scatter-add kernel above. The VJP
    boundary sits at the (f32) table so the gradient arrives straight from
    the kernel's f32 accumulator rather than rounding through the compute
    dtype."""
    return jnp.take(table.astype(dtype), ids, axis=0)


def _take_fwd(table, ids, dtype):
    # the table's dtype rides along as a zero-size array (residuals must be
    # JAX types): custom_vjp requires the cotangent dtype to match the
    # primal's, so a bf16 table needs its f32-accumulated gradient cast back.
    return (_take_scatter_grad(table, ids, dtype),
            (ids, table.shape[0], jnp.zeros((0,), table.dtype)))


def _take_bwd(dtype, residuals, g):
    import numpy as np

    ids, vocab, dtype_token = residuals
    d_table = scatter_add_rows(
        g.reshape(-1, g.shape[-1]), ids.reshape(-1), vocab)
    return (d_table.astype(dtype_token.dtype),
            np.zeros(ids.shape, dtype=jax.dtypes.float0))


_take_scatter_grad.defvjp(_take_fwd, _take_bwd)


def take_fast_grad(table: jnp.ndarray, ids: jnp.ndarray,
                   dtype: Optional[jnp.dtype] = None) -> jnp.ndarray:
    """Embedding gather with the fast-scatter gradient where it wins.

    Drop-in for ``jnp.take(table.astype(dtype), ids, axis=0)``; dispatches
    to the kernel-transposed form on TPU when the accumulator fits VMEM,
    plain take otherwise (CPU tests, oversized single-chip vocabularies).
    Safe under stop_gradient (forward identical; backward never runs) and
    inside shard_map (per-shard tables get per-shard accumulators — row-
    sharding a large vocabulary is exactly what re-enters the fast regime).
    """
    if dtype is None:
        dtype = table.dtype
    if jax.default_backend() == "tpu" and scatter_add_supported(*table.shape):
        return _take_scatter_grad(table, ids, dtype)
    return jnp.take(table.astype(dtype), ids, axis=0)
