#!/usr/bin/env python
"""Experiment: Pallas kernels for the embedding hot paths at word vocabs.

Follow-up to exp_embed_grad.py, which showed row-granular XLA gather/scatter
runs at a fixed ~5-16 ns/row (50 GB/s) regardless of vocab. Candidates here
keep the table (fwd) or the grad accumulator (bwd) resident in VMEM and test
whether Mosaic's in-kernel dynamic indexing beats the XLA row DMA.

Run: python -u tools/exp_pallas_embed.py [vocab] [n_ids] [dim]
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHAIN = 9
TILE_N = 1024


def zipf_ids(rng, vocab, n):
    ranks = np.arange(1, vocab)
    w = 1.0 / np.power(ranks, 1.07)
    w /= w.sum()
    return rng.choice(np.arange(1, vocab), size=n, p=w).astype(np.int32)


def timeit(fn, carry0, *rest):
    def make(iters):
        @jax.jit
        def run(c):
            def body(carry, _):
                out = fn(carry, *rest)
                dep = (jnp.sum(out[..., :1].astype(jnp.float32)) * 1e-30
                       ).astype(carry.dtype)
                return carry + dep, None
            final, _ = jax.lax.scan(body, c, None, length=iters)
            return jnp.float32(final.reshape(-1)[0])
        return run

    one, many = make(1), make(CHAIN)
    float(one(carry0)); float(many(carry0))

    def best(f):
        out = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(carry0))
            out = min(out, time.perf_counter() - t0)
        return out

    t1, tn = best(one), best(many)
    return max(tn - t1, 1e-9) / (CHAIN - 1)


# ---------------- forward: gather from VMEM-resident table ----------------

def _gather_take_kernel(ids_ref, table_ref, out_ref):
    """Vectorized jnp.take from a VMEM table — tests Mosaic's dynamic gather."""
    out_ref[:] = jnp.take(table_ref[:], ids_ref[0, :], axis=0)


def _gather_loop_kernel(ids_ref, table_ref, out_ref, *, tile_n: int):
    """Per-row dynamic-index copies (fallback if take doesn't lower)."""
    def body(j, _):
        out_ref[j, :] = table_ref[ids_ref[0, j], :]
        return 0
    jax.lax.fori_loop(0, tile_n, body, 0)


def pallas_gather(table, ids, kernel_name: str):
    n = ids.shape[0]
    vocab, dim = table.shape
    kern = (_gather_take_kernel if kernel_name == "take"
            else functools.partial(_gather_loop_kernel, tile_n=TILE_N))
    return pl.pallas_call(
        kern,
        grid=(n // TILE_N,),
        in_specs=[
            pl.BlockSpec((1, TILE_N), lambda i: (0, i),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((vocab, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_N, dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, dim), table.dtype),
    )(ids.reshape(1, -1), table)


# ---------------- backward: scatter-add into VMEM accumulator -------------

def _scatter_kernel(ids_ref, g_ref, acc_ref, *, tile_n: int):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def body(j, _):
        v = ids_ref[0, j]
        acc_ref[v, :] += g_ref[j, :].astype(acc_ref.dtype)
        return 0
    jax.lax.fori_loop(0, tile_n, body, 0)


def pallas_scatter(g, ids, vocab: int):
    n, dim = g.shape
    return pl.pallas_call(
        functools.partial(_scatter_kernel, tile_n=TILE_N),
        grid=(n // TILE_N,),
        in_specs=[
            pl.BlockSpec((1, TILE_N), lambda i: (0, i),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE_N, dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((vocab, dim), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((vocab, dim), jnp.float32),
    )(ids.reshape(1, -1), g)


def main():
    vocab = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    n_ids = int(sys.argv[2]) if len(sys.argv) > 2 else 1_048_576
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    rng = np.random.default_rng(0)
    ids = jax.device_put(zipf_ids(rng, vocab, n_ids))
    g = jax.device_put(rng.standard_normal((n_ids, dim)).astype(np.float32))
    g_bf16 = g.astype(jnp.bfloat16)
    table_f32 = jax.device_put(rng.standard_normal((vocab, dim)).astype(np.float32))
    table_bf16 = table_f32.astype(jnp.bfloat16)

    print(f"vocab={vocab} n_ids={n_ids:,} dim={dim}", flush=True)

    # --- fwd candidates
    def xla_take(tab, ids):
        return jnp.take(tab, ids, axis=0)

    t = timeit(xla_take, table_bf16, ids)
    print(f"fwd xla take bf16                 : {t*1e3:8.3f} ms", flush=True)

    for name in ("loop",):
        try:
            fn = lambda tab, ids, _n=name: pallas_gather(tab, ids, _n)
            t = timeit(fn, table_bf16, ids)
            print(f"fwd pallas gather ({name:4s}) bf16   : {t*1e3:8.3f} ms",
                  flush=True)
        except Exception as exc:
            print(f"fwd pallas gather ({name}) FAILED: {type(exc).__name__}: "
                  f"{str(exc)[:200]}", flush=True)

    # --- bwd candidates
    def xla_scatter_f32(g, ids):
        return jnp.zeros((vocab, dim), jnp.float32).at[ids].add(g)

    t = timeit(xla_scatter_f32, g, ids)
    print(f"bwd xla scatter f32               : {t*1e3:8.3f} ms", flush=True)

    def xla_scatter_bf16(g, ids):
        return jnp.zeros((vocab, dim), jnp.bfloat16).at[ids].add(g)

    t = timeit(xla_scatter_bf16, g_bf16, ids)
    print(f"bwd xla scatter bf16              : {t*1e3:8.3f} ms", flush=True)

    try:
        fn = lambda g, ids: pallas_scatter(g, ids, vocab)
        t = timeit(fn, g, ids)
        print(f"bwd pallas vmem-acc scatter f32   : {t*1e3:8.3f} ms", flush=True)
        # correctness
        want = np.asarray(jax.jit(xla_scatter_f32)(g, ids))
        got = np.asarray(jax.jit(fn)(g, ids))
        print(f"    max |diff| vs xla: {np.max(np.abs(got - want)):.2e}",
              flush=True)
    except Exception as exc:
        print(f"bwd pallas scatter FAILED: {type(exc).__name__}: "
              f"{str(exc)[:300]}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
