#!/usr/bin/env python
"""Example: training-free retrieval with mean GloVe vectors.

TPU-native counterpart of the reference's
``inference/examples/glove_search_example.py``: index a small corpus with
``GloVeSearch`` (mean of word vectors, cosine ranking), run a few queries,
and round-trip the index through save/load. When the gensim GloVe download
is unavailable (offline images), the class falls back to deterministic
hashed vectors so the example always runs.

Usage:
    python examples/glove_search_example.py [--model glove-twitter-25]
"""

from __future__ import annotations

import argparse
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from twotowers_tpu.index.glove import GloVeSearch
from twotowers_tpu.utils import setup_logging

DOCUMENTS = [
    "Machine learning models learn patterns from training data.",
    "Neural networks are composed of layers of connected units.",
    "The dog chased the ball across the sunny park.",
    "Dense retrieval embeds queries and documents in one vector space.",
    "A good pasta sauce starts with garlic and olive oil.",
    "Gradient descent minimises a loss function step by step.",
    "Cats enjoy sleeping in warm spots around the house.",
    "Transformers use attention to mix information across tokens.",
]

QUERIES = [
    "how do neural networks learn",
    "animal playing outside",
    "cooking italian food",
]


def main() -> int:
    parser = argparse.ArgumentParser(description="GloVe search example")
    parser.add_argument("--model", default="glove-twitter-25")
    parser.add_argument("--top_k", type=int, default=3)
    args = parser.parse_args()

    setup_logging()
    search = GloVeSearch(args.model)

    t0 = time.perf_counter()
    search.index_documents(DOCUMENTS)
    print(f"Indexed {len(DOCUMENTS)} documents "
          f"in {(time.perf_counter() - t0) * 1e3:.1f} ms\n")

    for query in QUERIES:
        t0 = time.perf_counter()
        results = search.search(query, top_k=args.top_k)
        latency = (time.perf_counter() - t0) * 1e3
        print(f"Q: {query}   ({latency:.1f} ms)")
        for rank, (doc, score) in enumerate(results, 1):
            print(f"  {rank}. [{score:+.3f}] {doc}")
        print()

    # save/load round-trip
    with tempfile.TemporaryDirectory() as td:
        path = str(Path(td) / "glove_index")
        search.save_index(path)
        restored = GloVeSearch(args.model)
        restored.load_index(path)
        again = restored.search(QUERIES[0], top_k=args.top_k)
        print(f"Reloaded index returns identical top hit: "
              f"{again[0][0] == search.search(QUERIES[0], top_k=args.top_k)[0][0]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
