#!/usr/bin/env python
"""Experiment 2: tuned Pallas scatter-add variants for the embedding backward.

exp_pallas_embed.py showed a VMEM-accumulator serial-RMW kernel beats XLA's
scatter 28.7ms vs 52.5ms at (32k vocab, 3.1M ids, D=64). This script tunes
it: manual unrolling (tests whether Mosaic preserves program order on
aliasing dynamic VMEM accesses — required for correctness under duplicate
ids), tile sizes, and forward-gather kernel forms that failed to compile in
round 1 of the experiment.

Run: python -u tools/exp_pallas_embed2.py [vocab] [n_ids] [dim]
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


# ---------------- backward variants ----------------

def _scatter_serial(ids_ref, g_ref, acc_ref, *, tile_n, unroll):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def body(i, _):
        base = i * unroll
        for u in range(unroll):
            j = base + u
            v = ids_ref[0, j]
            acc_ref[v, :] += g_ref[j, :].astype(acc_ref.dtype)
        return 0
    jax.lax.fori_loop(0, tile_n // unroll, body, 0, unroll=False)


def pallas_scatter(g, ids, vocab, tile_n, unroll):
    n, dim = g.shape
    return pl.pallas_call(
        functools.partial(_scatter_serial, tile_n=tile_n, unroll=unroll),
        grid=(n // tile_n,),
        in_specs=[
            pl.BlockSpec((1, tile_n), lambda i: (0, i),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_n, dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((vocab, dim), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((vocab, dim), jnp.float32),
    )(ids.reshape(1, -1), g)


def _scatter_dual(ids_ref, g_ref, acc_ref, acc2_ref, *, tile_n):
    """Two accumulators, even/odd ids alternate: adjacent RMWs never alias
    the same buffer so they can overlap; reduce at the end on the XLA side."""
    @pl.when(pl.program_id(0) == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        acc2_ref[:] = jnp.zeros_like(acc2_ref)

    def body(i, _):
        j = i * 2
        v0 = ids_ref[0, j]
        v1 = ids_ref[0, j + 1]
        acc_ref[v0, :] += g_ref[j, :].astype(acc_ref.dtype)
        acc2_ref[v1, :] += g_ref[j + 1, :].astype(acc2_ref.dtype)
        return 0
    jax.lax.fori_loop(0, tile_n // 2, body, 0, unroll=False)


def pallas_scatter_dual(g, ids, vocab, tile_n):
    n, dim = g.shape
    acc, acc2 = pl.pallas_call(
        functools.partial(_scatter_dual, tile_n=tile_n),
        grid=(n // tile_n,),
        in_specs=[
            pl.BlockSpec((1, tile_n), lambda i: (0, i),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_n, dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((vocab, dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((vocab, dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((vocab, dim), jnp.float32)] * 2,
    )(ids.reshape(1, -1), g)
    return acc + acc2


# ---------------- forward variants ----------------

def _gather_ds(ids_ref, table_ref, out_ref, *, tile_n, unroll):
    def body(i, _):
        base = i * unroll
        for u in range(unroll):
            j = base + u
            v = ids_ref[0, j]
            out_ref[j, :] = table_ref[v, :]
        return 0
    jax.lax.fori_loop(0, tile_n // unroll, body, 0, unroll=False)


def pallas_gather(table, ids, tile_n, unroll):
    n = ids.shape[0]
    vocab, dim = table.shape
    return pl.pallas_call(
        functools.partial(_gather_ds, tile_n=tile_n, unroll=unroll),
        grid=(n // tile_n,),
        in_specs=[
            pl.BlockSpec((1, tile_n), lambda i: (0, i),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((vocab, dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, dim), table.dtype),
    )(ids.reshape(1, -1), table)


def _gather_take(ids_ref, table_ref, out_ref):
    idx = ids_ref[0, :]
    out_ref[:] = jnp.take(table_ref[:], idx, axis=0)


def pallas_gather_take(table, ids, tile_n):
    n = ids.shape[0]
    vocab, dim = table.shape
    return pl.pallas_call(
        _gather_take,
        grid=(n // tile_n,),
        in_specs=[
            pl.BlockSpec((1, tile_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((vocab, dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, dim), table.dtype),
    )(ids.reshape(1, -1), table)


def main():
    vocab = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    n_ids = int(sys.argv[2]) if len(sys.argv) > 2 else 3145728
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    rng = np.random.default_rng(0)
    ids = jax.device_put(zipf_ids(rng, vocab, n_ids))
    g = jax.device_put(rng.standard_normal((n_ids, dim)).astype(np.float32))
    table_bf16 = jax.device_put(
        rng.standard_normal((vocab, dim)).astype(np.float32)).astype(jnp.bfloat16)

    print(f"vocab={vocab} n_ids={n_ids:,} dim={dim}", flush=True)

    want = np.asarray(jax.jit(
        lambda g, ids: jnp.zeros((vocab, dim), jnp.float32).at[ids].add(g))(g, ids))

    def check(got):
        d = np.max(np.abs(np.asarray(got) - want))
        rel = d / max(np.max(np.abs(want)), 1e-9)
        return f"maxdiff={d:.2e} rel={rel:.2e}"

    for tile_n in (1024, 4096):
        for unroll in (1, 2, 4, 8):
            try:
                fn = lambda g, ids: pallas_scatter(g, ids, vocab, tile_n, unroll)
                t = timeit(fn, g, ids)
                c = check(jax.jit(fn)(g, ids))
                print(f"bwd serial tile={tile_n} unroll={unroll}: "
                      f"{t*1e3:8.3f} ms  {c}", flush=True)
            except Exception as exc:
                print(f"bwd serial tile={tile_n} unroll={unroll} FAILED: "
                      f"{type(exc).__name__}: {str(exc)[:160]}", flush=True)

    if vocab * dim * 4 * 2 <= 14 * 2**20:
        for tile_n in (1024, 4096):
            try:
                fn = lambda g, ids: pallas_scatter_dual(g, ids, vocab, tile_n)
                t = timeit(fn, g, ids)
                c = check(jax.jit(fn)(g, ids))
                print(f"bwd dual-acc tile={tile_n}:       {t*1e3:8.3f} ms  {c}",
                      flush=True)
            except Exception as exc:
                print(f"bwd dual-acc tile={tile_n} FAILED: "
                      f"{type(exc).__name__}: {str(exc)[:160]}", flush=True)

    # --- forward
    want_f = np.asarray(jax.jit(
        lambda tab, ids: jnp.take(tab, ids, axis=0))(table_bf16, ids), np.float32)

    def check_f(got):
        d = np.max(np.abs(np.asarray(got, np.float32) - want_f))
        return f"maxdiff={d:.2e}"

    t = timeit(lambda tab, ids: jnp.take(tab, ids, axis=0), table_bf16, ids)
    print(f"fwd xla take bf16:                {t*1e3:8.3f} ms", flush=True)

    for tile_n in (1024, 4096):
        for unroll in (1, 4, 8):
            try:
                fn = lambda tab, ids: pallas_gather(tab, ids, tile_n, unroll)
                t = timeit(fn, table_bf16, ids)
                c = check_f(jax.jit(fn)(table_bf16, ids))
                print(f"fwd serial tile={tile_n} unroll={unroll}: "
                      f"{t*1e3:8.3f} ms  {c}", flush=True)
            except Exception as exc:
                print(f"fwd serial tile={tile_n} unroll={unroll} FAILED: "
                      f"{type(exc).__name__}: {str(exc)[:160]}", flush=True)

    for tile_n in (1024, 4096):
        try:
            fn = lambda tab, ids: pallas_gather_take(tab, ids, tile_n)
            t = timeit(fn, table_bf16, ids)
            c = check_f(jax.jit(fn)(table_bf16, ids))
            print(f"fwd in-kernel take tile={tile_n}: {t*1e3:8.3f} ms  {c}",
                  flush=True)
        except Exception as exc:
            print(f"fwd in-kernel take tile={tile_n} FAILED: "
                  f"{type(exc).__name__}: {str(exc)[:160]}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())


def main2():
    """Follow-up: fwd gather with f32 / packed-int32 tables; bwd unroll 16."""
    vocab = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    n_ids = int(sys.argv[2]) if len(sys.argv) > 2 else 3145728
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    rng = np.random.default_rng(0)
    ids = jax.device_put(zipf_ids(rng, vocab, n_ids))
    g = jax.device_put(rng.standard_normal((n_ids, dim)).astype(np.float32))
    table_f32 = jax.device_put(
        rng.standard_normal((vocab, dim)).astype(np.float32))
    table_bf16 = table_f32.astype(jnp.bfloat16)

    print(f"vocab={vocab} n_ids={n_ids:,} dim={dim}", flush=True)

    for unroll in (16, 32):
        fn = lambda g, ids: pallas_scatter(g, ids, vocab, 4096, unroll)
        t = timeit(fn, g, ids)
        print(f"bwd serial tile=4096 unroll={unroll}: {t*1e3:8.3f} ms", flush=True)

    want_f = np.asarray(jax.jit(
        lambda tab, ids: jnp.take(tab, ids, axis=0))(table_f32, ids))

    for tile_n in (1024, 4096):
        for unroll in (1, 8):
            try:
                fn = lambda tab, ids: pallas_gather(tab, ids, tile_n, unroll)
                t = timeit(fn, table_f32, ids)
                d = np.max(np.abs(np.asarray(jax.jit(fn)(table_f32, ids)) - want_f))
                print(f"fwd f32 serial tile={tile_n} unroll={unroll}: "
                      f"{t*1e3:8.3f} ms  maxdiff={d:.1e}", flush=True)
            except Exception as exc:
                print(f"fwd f32 serial tile={tile_n} unroll={unroll} FAILED: "
                      f"{type(exc).__name__}: {str(exc)[:120]}", flush=True)

    # packed bf16: view (V, D) bf16 as (V, D//2) int32, gather rows, bitcast out
    packed = jax.jit(lambda t: jax.lax.bitcast_convert_type(
        t.reshape(vocab, dim // 2, 2), jnp.int32))(table_bf16)

    def gather_packed(tab_packed, ids, tile_n, unroll):
        out = pallas_gather(tab_packed, ids, tile_n, unroll)
        return jax.lax.bitcast_convert_type(out, jnp.bfloat16).reshape(
            ids.shape[0], dim)

    want_b = np.asarray(jax.jit(
        lambda tab, ids: jnp.take(tab, ids, axis=0))(table_bf16, ids), np.float32)
    for tile_n in (4096,):
        for unroll in (8,):
            try:
                fn = lambda tab, ids: gather_packed(tab, ids, tile_n, unroll)
                t = timeit(fn, packed, ids)
                d = np.max(np.abs(np.asarray(jax.jit(fn)(packed, ids), np.float32) - want_b))
                print(f"fwd bf16-packed tile={tile_n} unroll={unroll}: "
                      f"{t*1e3:8.3f} ms  maxdiff={d:.1e}", flush=True)
            except Exception as exc:
                print(f"fwd bf16-packed tile={tile_n} unroll={unroll} FAILED: "
                      f"{type(exc).__name__}: {str(exc)[:120]}", flush=True)
    return 0
