#!/usr/bin/env python
"""Tile-size sweep for the fused score+top-k kernel (round 5).

QPS_1M.json shows the kernel scanning 1M x 128 bf16 docs at ~219 GB/s for
Q=1 — far under HBM bandwidth — suggesting per-grid-step overhead (DMA
issue, selection update) dominates at small Q with the default 2048-row
tile. This sweeps tile_n x Q at 1M docs with the relay-proof protocol,
TWICE per point (single-point A/Bs on this chip are untrustworthy —
memory: an earlier 3-point A/B produced a spurious win), printing both
rounds so only reproducible deltas count.

Run: python tools/exp_topk_tile.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from twotowers_tpu.kernels.pallas_topk import score_topk_pallas

N_DOCS = 1_000_000
DIM = 128
K = 10
CHAIN = 13
TRIALS = 3


def measure(docs, queries, tile_n):
    def call(tab, q):
        out = score_topk_pallas(tab, q, K, N_DOCS, tile_n=tile_n)
        v, i = out
        return jnp.sum(v) + jnp.sum(i.astype(jnp.float32))

    def make(iters):
        @jax.jit
        def run(tab, q):
            def body(acc, _):
                salt = (acc * 1e-30).astype(q.dtype)
                return acc + call(tab, q + salt) * 1e-30, None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
            return acc
        return run

    one, many = make(1), make(CHAIN)
    # interleaved T(1)/T(N) pairs, median of diffs (memory rule 4: an
    # unpaired schedule under congestion once produced a physically
    # impossible estimate — and did again in this tool's first version)
    float(one(docs, queries)), float(many(docs, queries))  # compile

    def timed(f):
        t0 = time.perf_counter()
        float(f(docs, queries))
        return time.perf_counter() - t0

    diffs = []
    for _ in range(TRIALS):
        t1 = timed(one)
        tn = timed(many)
        if tn > t1:
            diffs.append((tn - t1) / (CHAIN - 1))
    if not diffs:
        return None
    diffs.sort()
    return diffs[len(diffs) // 2]


def main() -> int:
    rng = np.random.default_rng(0)
    docs = rng.standard_normal((N_DOCS, DIM), dtype=np.float32)
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    docs_d = jax.device_put(docs.astype(jnp.bfloat16))

    results = []
    for rnd in range(2):
        for q_batch in (1, 32, 256):
            q = rng.standard_normal((q_batch, DIM)).astype(np.float32)
            q /= np.linalg.norm(q, axis=1, keepdims=True)
            q_d = jax.device_put(q.astype(jnp.bfloat16))
            for tile_n in (2048, 4096, 8192, 16384):
                try:
                    per = measure(docs_d, q_d, tile_n)
                except Exception as exc:  # VMEM OOM at large Q x tile
                    print(f"r{rnd} Q={q_batch:4d} tile={tile_n:6d}: "
                          f"SKIP {type(exc).__name__} (vmem)", flush=True)
                    results.append({"round": rnd, "q": q_batch,
                                    "tile_n": tile_n, "ms": None,
                                    "error": "vmem_oom"})
                    continue
                row = {"round": rnd, "q": q_batch, "tile_n": tile_n,
                       "ms": None if per is None else round(per * 1e3, 3),
                       "scan_gb_s": None if per is None else
                       round(N_DOCS * DIM * 2 / per / 1e9, 1)}
                # physics bound: v5e HBM ~819 GB/s; anything above is a
                # congestion-skewed differenced timing, not a result
                if row["scan_gb_s"] and row["scan_gb_s"] > 850:
                    row["suspect"] = True
                results.append(row)
                print(f"r{rnd} Q={q_batch:4d} tile={tile_n:6d}: "
                      f"{row['ms']} ms  {row['scan_gb_s']} GB/s", flush=True)

    out = Path(__file__).resolve().parents[1] / "TOPK_TILE_SWEEP.json"
    out.write_text(json.dumps({"n_docs": N_DOCS, "dim": DIM, "k": K,
                               "results": results}, indent=2) + "\n")
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
