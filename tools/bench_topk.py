#!/usr/bin/env python
"""A/B microbenchmark: Pallas fused score+top-k vs XLA matmul+top_k.

Run on the real chip: ``python tools/bench_topk.py [n_docs] [dim] [q] [k]``.
Verifies exact equality of (values, indices) between the two paths on real
hardware, then reports per-path latency and effective document-scan
bandwidth.
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

    xv, xi = jax.block_until_ready(xla(docs_d, queries_d))
    pv, pi = jax.block_until_ready(pal(docs_d, queries_d))
    idx_match = float(np.mean(np.asarray(xi) == np.asarray(pi)))
    val_err = float(np.max(np.abs(np.asarray(xv) - np.asarray(pv))))
    print(f"correctness: idx agreement={idx_match:.4f}, max |dv|={val_err:.3e}")

    def timeit(fn, reps=20):
        fn(docs_d, queries_d)  # warm
        jax.block_until_ready(fn(docs_d, queries_d))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(docs_d, queries_d)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps

    t_xla = timeit(xla)
    t_pal = timeit(pal)
    bytes_scanned = n * dim * 2  # bf16 docs
    for name, t in (("xla", t_xla), ("pallas", t_pal)):
        print(f"{name:7s}: {t * 1e3:8.3f} ms  "
              f"{q / t:10.0f} qps  "
              f"doc-scan {bytes_scanned / t / 1e9:7.1f} GB/s")
    print(f"speedup: {t_xla / t_pal:.2f}x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
