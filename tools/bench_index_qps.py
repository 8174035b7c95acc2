#!/usr/bin/env python
"""End-to-end retrieval QPS at 1M documents on one chip.

North-star benchmark (BASELINE.md): "Index-search QPS at 1M docs on a
sharded on-TPU dense index". Measures the full on-device query path of the
index engine — query-tower encode (token ids -> L2-unit vector) followed by
the fused score+top-k over a 1M x 128 bf16 document matrix — for several
query batch sizes, plus the host-side native tokenizer separately (it
overlaps with device work in a real server).

Run: ``python tools/bench_index_qps.py [n_docs] [k]``

Timing uses the relay-proof protocol of tools/bench_topk.py: N end-to-end
searches chained in ONE ``lax.scan``. To stop XLA hoisting the (fixed-input)
query encode out of the loop, the carry perturbs the embedding table by a
numerically negligible epsilon derived from every output element, so each
iteration's encode data-depends on the previous iteration's top-k. One
scalar readback; (T(N) - T(1)) / (N - 1).
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

import twotowers_tpu.kernels  # noqa: F401  registers the Pallas score+top-k impl
from twotowers_tpu.models import EmbeddingSpec, TowerSpec, TwoTowerSpec, init_two_tower
from twotowers_tpu.models.towers import encode
from twotowers_tpu.ops import topk_score
from twotowers_tpu.ops.topk_score import score_topk

VOCAB, SEQ = 96, 64
CHAIN = 13


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    spec = TwoTowerSpec(
        embedding=EmbeddingSpec(kind="lookup", vocab_size=VOCAB, embedding_dim=64),
        tower=TowerSpec(arch="mean", embedding_dim=64, hidden_dim=128),
        tied_weights=True,
        compute_dtype=jnp.bfloat16,
    )
    params = init_two_tower(jax.random.PRNGKey(0), spec)
    dim = 128

    rng = np.random.default_rng(0)
    docs = rng.standard_normal((n_docs, dim), dtype=np.float32)
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    docs_d = jax.device_put(docs.astype(jnp.bfloat16))

    def search_once(table, ids):
        p = dict(params)
        p["embedding"] = dict(params["embedding"], table=table)
        q = encode(p, spec, ids, "query", train=False, dropout_rng=None)
        return score_topk(docs_d, q.astype(jnp.bfloat16), k)

    def make_chained(iters: int, ids):
        @jax.jit
        def run(table):
            def body(tab, _):
                v, i = search_once(tab, ids)
                dep = jnp.mean(v) + jnp.mean(i.astype(jnp.float32))
                return tab + (dep * 1e-30).astype(tab.dtype), None
            tab, _ = jax.lax.scan(body, table, None, length=iters)
            return tab[0, 0]
        return run

    table0 = params["embedding"]["table"]

    assert topk_score._pallas_impl is not None, (
        "Pallas score+top-k impl not registered; this bench would silently "
        "time the XLA fallback")
    print(f"end-to-end search (encode + Pallas fused score+top-k), "
          f"{n_docs:,} docs x {dim} bf16, k={k}:")
    rows = []
    for q_batch in (1, 32, 256):
        ids = jax.device_put(
            rng.integers(1, VOCAB, size=(q_batch, SEQ)).astype(np.int32))
        one, many = make_chained(1, ids), make_chained(CHAIN, ids)
        float(one(table0)); float(many(table0))
        t1 = min(_t(one, table0) for _ in range(3))
        tn = min(_t(many, table0) for _ in range(3))
        if tn <= t1:
            raise RuntimeError(
                f"noise-inverted measurement at Q={q_batch}: T({CHAIN})={tn:.4f}s"
                f" <= T(1)={t1:.4f}s — rerun")
        per = (tn - t1) / (CHAIN - 1)
        rows.append({"q_batch": q_batch, "ms_per_batch": round(per * 1e3, 3),
                     "qps": round(q_batch / per, 1),
                     "doc_scan_gb_per_s": round(n_docs * dim * 2 / per / 1e9, 1)})
        print(f"  Q={q_batch:4d}: {per * 1e3:8.3f} ms/batch   "
              f"{q_batch / per:10.0f} QPS   "
              f"doc-scan {n_docs * dim * 2 / per / 1e9:7.1f} GB/s")

    # host-side tokenization (overlappable with device work in serving)
    from twotowers_tpu.tokenizers import build_tokenizer
    tok = build_tokenizer("char").fit(["abcdefghijklmnopqrstuvwxyz 0123456789"])
    texts = ["what is the capital of france " * 2] * 256
    tok(texts, max_len=SEQ)  # warm lazy paths
    t0 = time.perf_counter()
    for _ in range(20):
        tok(texts, max_len=SEQ)
    t_tok = (time.perf_counter() - t0) / 20
    print(f"host tokenize (char, native): {len(texts) / t_tok:,.0f} queries/s "
          f"({t_tok / len(texts) * 1e6:.1f} us/query)")

    out_path = Path(__file__).resolve().parents[1] / "QPS_1M.json"
    out_path.write_text(json.dumps({
        "bench": "end_to_end_index_search",
        "n_docs": n_docs, "dim": dim, "k": k, "dtype": "bfloat16",
        "path": "pallas_fused_score_topk",
        "device": str(jax.devices()[0]),
        "protocol": "relay-proof lax.scan chain, (T(N)-T(1))/(N-1), best of 3",
        "results": rows,
        "host_tokenize_queries_per_s": round(len(texts) / t_tok, 1),
    }, indent=2) + "\n")
    print(f"wrote {out_path}")
    return 0


def _t(fn, arg):
    t0 = time.perf_counter()
    float(fn(arg))
    return time.perf_counter() - t0


if __name__ == "__main__":
    raise SystemExit(main())
