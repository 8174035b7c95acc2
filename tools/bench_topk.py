#!/usr/bin/env python
"""A/B microbenchmark: Pallas fused score+top-k vs XLA matmul+top_k.

Run on the real chip: ``python tools/bench_topk.py [n_docs] [dim] [q] [k]``.
Verifies exact equality of (values, indices) between the two paths on real
hardware, then reports per-path latency and effective document-scan
bandwidth.

Timing methodology (important): the chip sits behind a relay where
``block_until_ready`` acks without waiting for execution and every array
readback costs one ~26 ms round-trip, so only host readback of ONE scalar
that data-depends on ALL the work gives a real wall time. Each measurement
therefore chains N invocations inside ONE ``lax.scan`` whose carry perturbs
the queries by a numerically negligible epsilon derived from the *entire*
(values, indices) output (nothing can be deduped, reordered, sliced, or
skipped — deriving it from a single element instead triggers a pathological
~50x-slower XLA top-k lowering), reads back one scalar of the final carry,
and reports (T(N) - T(1)) / (N - 1).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from twotowers_tpu.kernels.pallas_topk import score_topk_pallas
from twotowers_tpu.ops.topk_score import score_topk_xla

CHAIN = 13


def make_chained(score_fn, iters: int, k: int):
    @jax.jit
    def run(docs, queries):
        def body(q_eff, _):
            v, i = score_fn(docs, q_eff, k)
            # data-dependent but numerically negligible perturbation that
            # consumes EVERY output element: forces iteration i+1 to wait
            # for all of iteration i's work
            dep = jnp.mean(v) + jnp.mean(i.astype(jnp.float32))
            eps = (dep * 1e-30).astype(q_eff.dtype)
            return q_eff + eps, None
        q_final, _ = jax.lax.scan(body, queries, None, length=iters)
        return q_final[0, 0]
    return run


def _fresh_queries(rng, q, dim, dtype):
    qq = rng.standard_normal((q, dim), dtype=np.float32)
    qq /= np.linalg.norm(qq, axis=1, keepdims=True)
    return jax.device_put(qq.astype(dtype))


def time_chained(score_fn, docs_d, rng, q, dim, k, chain=CHAIN):
    """Returns (per_op_seconds, rtt_seconds)."""
    one = make_chained(score_fn, 1, k)
    many = make_chained(score_fn, chain, k)
    float(one(docs_d, _fresh_queries(rng, q, dim, docs_d.dtype)))
    float(many(docs_d, _fresh_queries(rng, q, dim, docs_d.dtype)))

    def best(fn, reps=3):
        out = float("inf")
        for _ in range(reps):
            queries = _fresh_queries(rng, q, dim, docs_d.dtype)
            t0 = time.perf_counter()
            float(fn(docs_d, queries))  # scalar readback = real completion
            out = min(out, time.perf_counter() - t0)
        return out

    t1, tn = best(one), best(many)
    per_op = max(tn - t1, 1e-9) / (chain - 1)
    return per_op, max(t1 - per_op, 0.0)


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    q = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    k = int(sys.argv[4]) if len(sys.argv) > 4 else 10

    rng = np.random.default_rng(0)
    docs = rng.standard_normal((n, dim), dtype=np.float32)
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    queries = rng.standard_normal((q, dim), dtype=np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    docs_d = jax.device_put(docs.astype(jnp.bfloat16))
    queries_d = jax.device_put(queries.astype(jnp.bfloat16))

    xla = jax.jit(lambda d, qq: score_topk_xla(d, qq, k))
    pal = jax.jit(lambda d, qq: score_topk_pallas(d, qq, k))
    xv, xi = xla(docs_d, queries_d)
    pv, pi = pal(docs_d, queries_d)
    idx_match = float(np.mean(np.asarray(xi) == np.asarray(pi)))
    val_err = float(np.max(np.abs(np.asarray(xv) - np.asarray(pv))))
    print(f"correctness: idx agreement={idx_match:.4f}, max |dv|={val_err:.3e}")

    t_pal, rtt = time_chained(score_topk_pallas, docs_d, rng, q, dim, k)
    t_xla, _ = time_chained(score_topk_xla, docs_d, rng, q, dim, k)

    bytes_scanned = n * dim * 2  # bf16 docs
    print(f"relay rtt: {rtt * 1e3:.1f} ms")
    for name, t in (("xla", t_xla), ("pallas", t_pal)):
        print(f"{name:7s}: {t * 1e3:8.3f} ms  "
              f"{q / t:10.0f} qps  "
              f"doc-scan {bytes_scanned / t / 1e9:7.1f} GB/s")
    print(f"speedup: {t_xla / t_pal:.2f}x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
