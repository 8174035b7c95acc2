"""Pallas kernel: fused embedding lookup + masked mean-pool.

Replaces the two-op XLA path (gather to a (B, L, D) intermediate in HBM,
then masked mean over L — the hot front of every tower forward,
/root/reference/twotower/encoders.py:62-72 in the reference) with a single
kernel that never materialises the (B, L, D) tensor.

TPU-native formulation: for a VMEM-resident table, masked mean-pooling is a
**token histogram matmul** —

    pooled[b] = (counts[b] @ table) / n_tokens[b],
    counts[b, v] = |{l : ids[b, l] == v, v != PAD}|

so the gather disappears entirely and the FLOPs land on the MXU as a
(B, V) x (V, D) matmul. The histogram is built on the VPU with a fori_loop
of compare+accumulate over L (no (B, L, V) one-hot intermediate). The
backward pass reuses the same histogram: d table = countsᵀ @ (g / n) —
another MXU matmul via a custom VJP, replacing XLA's serial scatter-add.

Applicability: the table must fit VMEM (V·D·4 bytes ≲ 4 MB — true for char
vocabularies and small word vocabs). The dispatcher falls back to the XLA
gather path otherwise, and runs in interpreter mode off-TPU.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.core import POOL_EPS

# table bytes that may sit resident in VMEM (leave room for tiles/scratch)
VMEM_TABLE_BUDGET = 4 * 1024 * 1024
DEFAULT_TILE_B = 256
LANE = 128


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _kernel(ids_t_ref, table_ref, out_ref, *, seq_len: int, vocab_padded: int):
    """One batch tile. ids arrive TRANSPOSED as (L, TILE_B): the histogram
    loop slices single token rows on the sublane axis (lane-axis slices are
    128-aligned-only on TPU). The histogram is built transposed (V, TILE_B),
    the 1/n_tokens normalisation is folded into its columns, and one MXU
    contraction over V produces the pooled (TILE_B, D) output directly —
    no transposes materialised anywhere."""
    tile_b = ids_t_ref.shape[1]

    vocab_iota = jax.lax.broadcasted_iota(
        jnp.int32, (vocab_padded, tile_b), 0
    )  # value v in every column

    def accumulate(l, counts_t):
        row = ids_t_ref[pl.ds(l, 1), :]  # (1, TILE_B) token l of every row
        return counts_t + (vocab_iota == row).astype(jnp.float32)

    counts_t = jax.lax.fori_loop(
        0, seq_len, accumulate,
        jnp.zeros((vocab_padded, tile_b), jnp.float32),
    )
    # PAD (id 0) contributes neither to the sum nor to the token count
    pad_mask = (vocab_iota != 0).astype(jnp.float32)
    counts_t = counts_t * pad_mask
    n_tokens = jnp.sum(counts_t, axis=0, keepdims=True)  # (1, TILE_B)
    counts_t = counts_t / (n_tokens + POOL_EPS)

    # HIGHEST: the MXU default rounds f32 operands to bf16
    # (preferred_element_type only widens the accumulator), which would put
    # ~1e-3 of noise into what is semantically an exact row-selection (the
    # same decision as the one-hot path, models/embeddings.py). This kernel
    # serves small vocabularies, so the multi-pass f32 emulation is cheap.
    out_ref[:] = jax.lax.dot_general(
        counts_t, table_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),  # contract over V
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (TILE_B, D)


def _embed_pool_fwd_impl(
    ids: jnp.ndarray, table: jnp.ndarray, *, tile_b: int, interpret: bool
) -> jnp.ndarray:
    batch, seq_len = ids.shape
    vocab, dim = table.shape
    vocab_padded = _round_up(vocab, LANE)
    if vocab_padded != vocab:
        table = jnp.concatenate(
            [table, jnp.zeros((vocab_padded - vocab, dim), table.dtype)], axis=0
        )
    batch_padded = _round_up(batch, tile_b)
    if batch_padded != batch:
        ids = jnp.concatenate(
            [ids, jnp.zeros((batch_padded - batch, seq_len), ids.dtype)], axis=0
        )
    ids_t = ids.T  # (L, B): histogram slices the sublane axis (see _kernel)

    out = pl.pallas_call(
        functools.partial(_kernel, seq_len=seq_len, vocab_padded=vocab_padded),
        grid=(batch_padded // tile_b,),
        in_specs=[
            pl.BlockSpec((seq_len, tile_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((vocab_padded, dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch_padded, dim), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * batch_padded * vocab_padded * dim,
            bytes_accessed=(batch_padded * seq_len * 4
                            + vocab_padded * dim * 4
                            + batch_padded * dim * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(ids_t, table.astype(jnp.float32))
    return out[:batch]


def _counts_host(ids: jnp.ndarray, vocab: int) -> jnp.ndarray:
    """(B, V) histogram excluding PAD — XLA-side helper for the backward.

    Accumulated one token column at a time: materialising the full
    (B, L, V) one-hot is O(B·L·V) bytes — 34 GB at the flagship batch with
    an 8k vocab — where the scan peak is the (B, V) accumulator itself."""

    def step(counts, col):
        return counts + jax.nn.one_hot(col, vocab, dtype=jnp.float32), None

    counts, _ = jax.lax.scan(
        step, jnp.zeros((ids.shape[0], vocab), jnp.float32), ids.T)
    return counts.at[:, 0].set(0.0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def embed_pool(ids: jnp.ndarray, table: jnp.ndarray,
               tile_b: int = DEFAULT_TILE_B, interpret: bool = False) -> jnp.ndarray:
    """Fused masked-mean-pooled embedding: (B, L) ids, (V, D) table -> (B, D)."""
    return _embed_pool_fwd_impl(ids, table, tile_b=tile_b, interpret=interpret)


def _embed_pool_fwd(ids, table, tile_b, interpret):
    out = _embed_pool_fwd_impl(ids, table, tile_b=tile_b, interpret=interpret)
    return out, (ids, table.shape[0])


def _embed_pool_bwd(tile_b, interpret, residuals, g):
    ids, vocab = residuals
    counts = _counts_host(ids, vocab)                      # (B, V)
    n_tokens = jnp.sum(counts, axis=1, keepdims=True)      # (B, 1)
    scaled_g = g / (n_tokens + POOL_EPS)                   # (B, D)
    d_table = jnp.dot(counts.T, scaled_g,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)  # (V, D) one matmul
    return None, d_table


embed_pool.defvjp(_embed_pool_fwd, _embed_pool_bwd)


def embed_pool_fits_vmem(vocab: int, dim: int) -> bool:
    return _round_up(vocab, LANE) * dim * 4 <= VMEM_TABLE_BUDGET


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def fused_embed_pool(
    ids: jnp.ndarray,
    table: jnp.ndarray,
    *,
    tile_b: int = DEFAULT_TILE_B,
    interpret: Optional[bool] = None,
) -> Optional[jnp.ndarray]:
    """Dispatcher: fused kernel when the table fits VMEM, else None
    (caller falls back to the XLA gather+pool path)."""
    vocab, dim = table.shape
    if not embed_pool_fits_vmem(vocab, dim):
        return None
    if interpret is None:
        interpret = not _on_tpu()
    tile_b = min(tile_b, _round_up(ids.shape[0], 8))
    return embed_pool(ids, table, tile_b, interpret)
