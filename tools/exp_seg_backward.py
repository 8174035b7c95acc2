#!/usr/bin/env python
"""Measure candidate formulations for the embedding-gradient transpose at
large vocabularies (VERDICT r3 item 3): the Pallas RMW kernel sits at a
~17 ms serial floor at 32k and declines at 102,400 (57 ms XLA fallback).

Candidates, timed with the relay-proof chained-scan protocol:
  xla_scatter    zeros.at[ids].add(g)                      (baseline)
  pallas_rmw     kernels/pallas_scatter_add.py             (current kernel)
  sort_segsum    lax.sort(ids, payload=g-row-idx) -> gather -> segment_sum
                 with indices_are_sorted=True
  sort_cumsum    same sort -> gather -> cumsum(axis=0) -> boundary diff
                 (RMW-free: dW[v] = c[end_v] - c[start_v])
  hot_cold       one-hot MXU matmul for ids < H, XLA scatter for the tail

Shapes: (vocab, dim, n) = (32768, 64, 3.1M) and (102400, 64, 3.1M), zipf ids
(the word-training distribution from tools/bench_vocab_scaling.py).

Run: python tools/exp_seg_backward.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

CHAIN = 9
TRIALS = 3


def _measure(fn, *args):
    """Relay-proof per-call time: chain CHAIN calls in one scan, read one
    scalar; per-call = (T(CHAIN) - T(1)) / (CHAIN - 1), best of TRIALS.

    The ids input is salted with the carry (+0 at runtime, data-dependent at
    compile time) so XLA cannot hoist the loop-invariant call out of the
    scan — without this every candidate "measures" scan overhead only."""

    def make(iters):
        @jax.jit
        def run(g, ids):
            def body(acc, i):
                salt = (acc * 1e-30).astype(ids.dtype)
                out = fn(g, ids + salt)
                return acc + out.astype(jnp.float32).sum() * 1e-30, None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(iters))
            return acc
        return run

    one, many = make(1), make(CHAIN)
    best = {}
    for name, f in (("one", one), ("many", many)):
        out = float("inf")
        float(f(*args))
        for _ in range(TRIALS):
            t0 = time.perf_counter()
            float(f(*args))
            out = min(out, time.perf_counter() - t0)
        best[name] = out
    if best["many"] <= best["one"]:
        raise RuntimeError(f"noise-inverted: {best}")
    return (best["many"] - best["one"]) / (CHAIN - 1)


# ------------------------------------------------------------- candidates

def xla_scatter(g, ids, vocab):
    return jnp.zeros((vocab, g.shape[-1]), jnp.float32).at[ids].add(
        g.astype(jnp.float32))


def pallas_rmw(g, ids, vocab):
    from twotowers_tpu.kernels.pallas_scatter_add import scatter_add_rows
    return scatter_add_rows(g, ids, vocab)


def _sorted_rows(g, ids):
    n = ids.shape[0]
    sorted_ids, perm = jax.lax.sort_key_val(ids, jnp.arange(n, dtype=jnp.int32))
    return sorted_ids, jnp.take(g.astype(jnp.float32), perm, axis=0)


def sort_only(g, ids, vocab):
    sorted_ids, gs = _sorted_rows(g, ids)
    return gs + sorted_ids[:, None].astype(jnp.float32) * 0


def sort_segsum(g, ids, vocab):
    sorted_ids, gs = _sorted_rows(g, ids)
    return jax.ops.segment_sum(gs, sorted_ids, num_segments=vocab,
                               indices_are_sorted=True)


def sort_cumsum(g, ids, vocab):
    sorted_ids, gs = _sorted_rows(g, ids)
    c = jnp.cumsum(gs, axis=0)
    # dW[v] = c[last index of v] - c[last index of v-1]; rows with no ids -> 0
    n = sorted_ids.shape[0]
    last = jnp.searchsorted(sorted_ids, jnp.arange(vocab + 1, dtype=jnp.int32),
                            side="left")[1:] - 1
    ext = jnp.concatenate([jnp.zeros((1, g.shape[-1]), jnp.float32), c], axis=0)
    return jnp.take(ext, last + 1, axis=0) - jnp.take(
        ext, jnp.concatenate([jnp.zeros((1,), last.dtype), last[:-1] + 1]),
        axis=0)


def make_hot_cold(hot: int):
    def hot_cold(g, ids, vocab):
        g32 = g.astype(jnp.float32)
        is_hot = ids < hot
        onehot = jax.nn.one_hot(jnp.where(is_hot, ids, hot), hot + 1,
                                dtype=jnp.bfloat16)
        dw_hot = jax.lax.dot_general(
            onehot, g.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[:hot]
        cold_ids = jnp.where(is_hot, vocab, ids)  # parked on a pad row
        dw_cold = jnp.zeros((vocab + 1, g.shape[-1]), jnp.float32
                            ).at[cold_ids].add(g32)[:vocab]
        return dw_cold.at[:hot].add(dw_hot)
    return hot_cold


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true")
    parser.add_argument("--n", type=int, default=3_145_728)  # 16384*64*3
    args = parser.parse_args()

    rng = np.random.default_rng(0)
    results = {}
    shapes = [(32768, 64), (102_400, 64)]
    if args.quick:
        shapes = [(4096, 64)]
        args.n = 262_144

    for vocab, dim in shapes:
        ranks = np.arange(1, vocab)
        w = 1.0 / np.power(ranks, 1.07)
        ids = jax.device_put(rng.choice(
            ranks, size=args.n, p=w / w.sum()).astype(np.int32))
        g = jax.device_put(
            rng.standard_normal((args.n, dim)).astype(np.float32)
            .astype(jnp.bfloat16))

        want = np.asarray(jax.jit(xla_scatter, static_argnums=2)(g, ids, vocab))
        scale = max(float(np.abs(want).max()), 1e-9)

        key = f"vocab{vocab}_dim{dim}_n{args.n}"
        results[key] = {}
        candidates = {
            "xla_scatter": xla_scatter,
            "pallas_rmw": pallas_rmw,
            "sort_only": sort_only,
            "sort_segsum": sort_segsum,
            "sort_cumsum": sort_cumsum,
            "hot_cold_h1024": make_hot_cold(1024),
        }
        for name, fn in candidates.items():
            try:
                if name not in ("sort_only",):
                    got = np.asarray(
                        jax.jit(fn, static_argnums=2)(g, ids, vocab))
                    err = float(np.abs(got - want).max() / scale)
                else:
                    err = None
                per = _measure(lambda gg, ii, f=fn: f(gg, ii, vocab), g, ids)
                results[key][name] = {
                    "ms": round(per * 1e3, 3),
                    "max_rel_err": err if err is None else round(err, 6),
                }
            except Exception as exc:
                results[key][name] = {"error": f"{type(exc).__name__}: {exc}"}
            print(f"[{key}] {name}: {results[key][name]}",
                  file=sys.stderr, flush=True)

    print(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
