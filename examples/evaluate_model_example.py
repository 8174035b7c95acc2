#!/usr/bin/env python
"""Example: evaluate a trained two-tower checkpoint with the IR harness.

TPU-native counterpart of the reference's
``inference/examples/evaluate_model_example.py`` — but where that script
rebuilds the tokenizer by hand and cannot actually run (it treats the stored
state_dict as a module), this one uses ``load_trained_model``, which restores
params + spec + tokenizer + config from the checkpoint's sidecar metadata in
one call.

Usage:
    python examples/evaluate_model_example.py \
        --checkpoint checkpoints/best_model \
        --test-data data/test_triplets.parquet

The test parquet needs the triplet columns (``q_text, d_pos_text,
d_neg_text``); each query is evaluated against its positive plus a sample of
other rows' documents.
"""

from __future__ import annotations

import argparse
import random
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from twotowers_tpu.evaluation import evaluate_model, print_evaluation_results
from twotowers_tpu.train.checkpoint import load_trained_model
from twotowers_tpu.utils import setup_logging


def tuples_from_triplets(path: str, num_docs: int = 20, seed: int = 0):
    """Build (query, docs, relevance) eval tuples from a triplets parquet."""
    import pandas as pd

    df = pd.read_parquet(path)
    rng = random.Random(seed)
    all_negs = df["d_neg_text"].tolist()
    tuples = []
    for query, group in df.groupby("q_text"):
        positives = group["d_pos_text"].unique().tolist()[:2]
        negs = rng.sample(all_negs, min(num_docs - len(positives),
                                        len(all_negs)))
        docs = positives + negs
        relevance = [1] * len(positives) + [0] * len(negs)
        order = list(range(len(docs)))
        rng.shuffle(order)
        tuples.append((query, [docs[i] for i in order],
                       [relevance[i] for i in order]))
    return tuples


def main() -> int:
    parser = argparse.ArgumentParser(description="Evaluate a two-tower model")
    parser.add_argument("--checkpoint", required=True,
                        help="Checkpoint directory (e.g. checkpoints/best_model)")
    parser.add_argument("--test-data", required=True,
                        help="Triplets parquet with held-out rows")
    parser.add_argument("--k", type=int, nargs="+", default=[1, 5, 10])
    parser.add_argument("--max-length", type=int, default=64)
    args = parser.parse_args()

    setup_logging()
    params, spec, tokenizer, _config = load_trained_model(args.checkpoint)
    tuples = tuples_from_triplets(args.test_data)
    print(f"Evaluating {len(tuples)} queries ...")
    results = evaluate_model(params, spec, tuples, tokenizer,
                             k_values=args.k, max_length=args.max_length)
    print_evaluation_results(results)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
