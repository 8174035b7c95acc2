#!/usr/bin/env python
"""Serving-path latency/QPS benchmark: the reference's only published perf
numbers are its GloVe search latencies (<15 ms/query at 1k docs, CPU —
BASELINE.md); this measures OUR serving surface end-to-end and writes
SERVE_BENCH.json.

Three layers, innermost to outermost:
  encode          ModelRuntime.encode of one query (tokenize + TPU tower)
  service.search  encode + vector-store query + response assembly
                  (the /search route's logic without HTTP)
  http /search    the same through the FastAPI app via an in-process test
                  client (serialization + routing included), when fastapi
                  is importable

Corpus: synthetic docs at 1k / 10k / 100k, mean char tower (the serving
default shape). Wall-clock per call here is honest despite the TPU relay:
serving latency IS host-observed latency including the readback round-trip
— that is what a client sees.

Run: python tools/bench_serve.py
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

REPEATS = 30


def _percentiles(samples):
    s = sorted(samples)
    return {
        "p50_ms": round(statistics.median(s) * 1e3, 2),
        "p90_ms": round(s[int(0.9 * (len(s) - 1))] * 1e3, 2),
        "mean_ms": round(statistics.fmean(s) * 1e3, 2),
        "qps_serial": round(1.0 / statistics.fmean(s), 1),
    }


def _time(fn, repeats=REPEATS):
    fn()  # warm (compile, cache)
    samples = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    return _percentiles(samples)


def build_service(n_docs: int):
    import jax

    from twotowers_tpu.data.factory import synthetic as syn
    from twotowers_tpu.index.two_tower import TwoTowerSearch
    from twotowers_tpu.models import init_two_tower, spec_from_config
    from twotowers_tpu.serve.service import RetrievalService
    from twotowers_tpu.tokenizers import build_tokenizer

    import random

    class _Runtime:
        """ModelRuntime's encode surface over in-memory params (the real
        class loads from a checkpoint path — serve/app.py:41-61)."""

        def __init__(self, params, spec, tokenizer, max_length=64):
            self._search = TwoTowerSearch(
                params, spec, tokenizer, max_length=max_length,
                encode_batch_size=32)
            self.output_dim = spec.output_dim

        def encode(self, texts, tower="query"):
            return np.atleast_2d(np.asarray(
                self._search._encode_texts(texts, tower), np.float32))

        def encode_device(self, texts, tower="query"):
            return self._search._encode_texts_device(texts, tower)

    rng = random.Random(0)
    docs = [syn.generate_document(rng) for _ in range(min(n_docs, 2000))]
    # tile up to n_docs with suffix variation so texts stay unique
    while len(docs) < n_docs:
        docs.append(docs[len(docs) % 2000] + f" variant {len(docs)}")

    tokenizer = build_tokenizer("char").fit(docs[:2000])
    config = {"encoder": {"arch": "mean", "hidden_dim": 128,
                          "tied_weights": True},
              "embedding": {"embedding_dim": 64}}
    spec = spec_from_config(config, tokenizer.vocab_size)
    params = init_two_tower(jax.random.PRNGKey(0), spec)
    model = _Runtime(params, spec, tokenizer, max_length=64)
    service = RetrievalService(model)
    t0 = time.perf_counter()
    service.add(docs)
    index_s = time.perf_counter() - t0
    return service, docs, index_s


def _bare_rtt_ms(repeats: int = 15) -> dict:
    """One tiny dispatch+readback, repeated: the relay's floor for ANY
    blocking transfer. /search p50 should sit within ~1.2x of this p50 —
    publishing it makes each record self-calibrating against relay drift
    (r4 measured ~26 ms; r5 saw ~34 ms on the same code)."""
    import jax.numpy as jnp

    x = jnp.ones(())
    float(x + 1)
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(x + 1)
        ts.append((time.perf_counter() - t0) * 1e3)
    ts.sort()
    return {"p50_ms": round(ts[len(ts) // 2], 1), "min_ms": round(ts[0], 1)}


def main() -> int:
    results = {"repeats": REPEATS, "corpora": [],
               "bare_readback_rtt": _bare_rtt_ms()}
    for n_docs in (1_000, 10_000, 100_000):
        service, docs, index_s = build_service(n_docs)
        query = "how does the learning system compare approaches"

        row = {
            "n_docs": n_docs,
            "index_time_s": round(index_s, 2),
            "index_docs_per_s": round(n_docs / index_s, 1),
            "encode": _time(lambda: service.model.encode([query], "query")),
            "service_search": _time(lambda: service.search(query, top_k=10)),
        }

        if n_docs == 1_000:
            try:
                from fastapi.testclient import TestClient

                from twotowers_tpu.serve import app as app_module

                # the app closure builds its own service; route model
                # loading to the in-memory runtime and add docs over HTTP
                app_module._load_runtime = lambda: service.model
                client = TestClient(app_module.create_app())
                with client:
                    for i in range(0, len(docs), 250):
                        r = client.post("/add",
                                        json={"documents": docs[i:i + 250]})
                        assert r.status_code == 200, r.text

                    def http_call():
                        r = client.post("/search",
                                        json={"query": query, "top_k": 10})
                        assert r.status_code == 200

                    row["http_search"] = _time(http_call)
            except Exception as exc:
                row["http_search"] = {
                    "skipped": f"{type(exc).__name__}: {exc}"}

        results["corpora"].append(row)
        print(json.dumps(row), file=sys.stderr, flush=True)

    out = Path(__file__).resolve().parents[1] / "SERVE_BENCH.json"
    out.write_text(json.dumps(results, indent=2) + "\n")
    print(json.dumps(results, indent=2))
    print(f"wrote {out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
