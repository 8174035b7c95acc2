#!/usr/bin/env python
"""Experiment: embedding-lookup forward/backward strategies at word vocabs.

Isolates the gather forward and scatter-add backward that dominate
large-vocab training steps (VOCAB_SCALING.json) and times candidate
implementations with the relay-proof scan protocol. Not part of the
package; informs the design of models/embeddings.embed_ids.

Run: python tools/exp_embed_grad.py [vocab] [n_ids] [dim]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

CHAIN = 9


def zipf_ids(rng, vocab, n):
    ranks = np.arange(1, vocab)
    w = 1.0 / np.power(ranks, 1.07)
    w /= w.sum()
    return rng.choice(np.arange(1, vocab), size=n, p=w).astype(np.int32)


def timeit(fn, *args):
    """Relay-proof: chain CHAIN invocations via lax.scan, scalar readback."""
    def make(iters):
        @jax.jit
        def run(a0, rest):
            def body(carry, _):
                out = fn(carry, *rest)
                dep = (jnp.mean(out) * 1e-30).astype(a0.dtype)
                return a0 + dep, None
            final, _ = jax.lax.scan(body, a0, None, length=iters)
            return jnp.float32(final.reshape(-1)[0])
        return run

    one, many = make(1), make(CHAIN)
    a0, rest = args[0], args[1:]
    float(one(a0, rest)); float(many(a0, rest))

    def best(f):
        return min(_t(f, a0, rest) for _ in range(3))

    t1, tn = best(one), best(many)
    return max(tn - t1, 1e-9) / (CHAIN - 1)


def _t(f, a0, rest):
    t0 = time.perf_counter()
    float(f(a0, rest))
    return time.perf_counter() - t0


def main():
    vocab = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    n_ids = int(sys.argv[2]) if len(sys.argv) > 2 else 3 * 16384 * 64
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    rng = np.random.default_rng(0)
    ids = jax.device_put(zipf_ids(rng, vocab, n_ids))
    g = jax.device_put(rng.standard_normal((n_ids, dim)).astype(np.float32))
    g_bf16 = g.astype(jnp.bfloat16)
    table = jax.device_put(
        rng.standard_normal((vocab, dim)).astype(np.float32))

    print(f"vocab={vocab} n_ids={n_ids:,} dim={dim}")

    # ---------- forward candidates ----------
    def fwd_take(tab, ids):
        return jnp.take(tab.astype(jnp.bfloat16), ids, axis=0)

    t = timeit(fwd_take, table, ids)
    print(f"fwd  take (gather)               : {t*1e3:8.3f} ms  "
          f"{n_ids*dim*2/t/1e9:6.1f} GB/s-out")

    # ---------- backward candidates: grad_table from (ids, g) ----------
    def bwd_scatter(g, ids, tab):
        return jnp.zeros_like(tab).at[ids].add(g.astype(jnp.float32))

    t = timeit(bwd_scatter, g_bf16, ids, table)
    print(f"bwd  scatter-add (.at[].add)     : {t*1e3:8.3f} ms")

    def bwd_sorted_segsum(g, ids, tab):
        sids, perm = jax.lax.sort_key_val(ids, jnp.arange(ids.shape[0], dtype=jnp.int32))
        gs = jnp.take(g.astype(jnp.float32), perm, axis=0)
        return jax.ops.segment_sum(gs, sids, num_segments=tab.shape[0],
                                   indices_are_sorted=True)

    t = timeit(bwd_sorted_segsum, g_bf16, ids, table)
    print(f"bwd  sort + segment_sum(sorted)  : {t*1e3:8.3f} ms")

    def bwd_sorted_cumsum(g, ids, tab):
        n = ids.shape[0]
        sids, perm = jax.lax.sort_key_val(ids, jnp.arange(n, dtype=jnp.int32))
        gs = jnp.take(g.astype(jnp.float32), perm, axis=0)
        csum = jnp.cumsum(gs, axis=0)
        is_last = jnp.concatenate([sids[1:] != sids[:-1],
                                   jnp.ones((1,), bool)])
        # rows: csum at each run's last position scattered to its id (no
        # collisions); grad[v] = S_last[v] - S_before_first[v]
        last_rows = jnp.where(is_last[:, None], csum, 0.0)
        last_idx = jnp.where(is_last, sids, tab.shape[0])  # dump padding row
        S_last = jnp.zeros((tab.shape[0] + 1, tab.shape[1]),
                           jnp.float32).at[last_idx].add(last_rows)
        is_first = jnp.concatenate([jnp.ones((1,), bool),
                                    sids[1:] != sids[:-1]])
        before = jnp.concatenate([jnp.zeros((1, tab.shape[1]), jnp.float32),
                                  csum[:-1]])
        first_rows = jnp.where(is_first[:, None], before, 0.0)
        first_idx = jnp.where(is_first, sids, tab.shape[0])
        S_first = jnp.zeros((tab.shape[0] + 1, tab.shape[1]),
                            jnp.float32).at[first_idx].add(first_rows)
        return (S_last - S_first)[:-1]

    t = timeit(bwd_sorted_cumsum, g_bf16, ids, table)
    print(f"bwd  sort + cumsum + 2 scatters  : {t*1e3:8.3f} ms")

    def bwd_segsum_unsorted(g, ids, tab):
        return jax.ops.segment_sum(g.astype(jnp.float32), ids,
                                   num_segments=tab.shape[0])

    t = timeit(bwd_segsum_unsorted, g_bf16, ids, table)
    print(f"bwd  segment_sum (unsorted)      : {t*1e3:8.3f} ms")

    # components: how much of sort+X is the sort itself?
    def sort_only(g, ids, tab):
        key = ids + (g[0, 0] * 1e-30).astype(jnp.int32)  # data-dep, value 0
        sids, perm = jax.lax.sort_key_val(key, jnp.arange(ids.shape[0], dtype=jnp.int32))
        return sids.astype(jnp.float32)[:8] + perm[:8]

    t = timeit(sort_only, g_bf16, ids, table)
    print(f"     sort_key_val alone          : {t*1e3:8.3f} ms")

    def perm_gather(g, ids, tab):
        return jnp.take(g.astype(jnp.float32), ids, axis=0)  # N-row gather

    t = timeit(perm_gather, g_bf16, ids, table)
    print(f"     N-row f32 gather alone      : {t*1e3:8.3f} ms")

    def cumsum_only(g, ids, tab):
        return jnp.cumsum(g.astype(jnp.float32), axis=0)[-1] + tab[0]

    t = timeit(cumsum_only, g_bf16, ids, table)
    print(f"     cumsum (N, D) alone         : {t*1e3:8.3f} ms")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
