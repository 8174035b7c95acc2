#!/usr/bin/env python
"""Deterministic MS MARCO v1.1-shaped fixture parquet for offline pipeline runs.

The environment has no network egress, so ``train_with_msmarco.py`` can never
download the real corpus here; this generates a structurally faithful stand-in
(row schema from /root/reference/dataset_factory/positive_selectors.py:4-20:
``query``, ``answers``, ``passages{is_selected, passage_text}``) from the
framework's own synthetic topic banks, with the properties the samplers need:

- one ``is_selected == 1`` passage per query, topic-matched to the query
- several ``is_selected == 0`` same-query passages from other topics (so
  ``intra_query_zero_filtered`` has candidates) including one passage that
  contains the answer text (so the answer-leak filter has work to do)
- answers present for ~70% of queries

Run: python tools/make_msmarco_fixture.py [--queries 200] [--out PATH]
"""

from __future__ import annotations

import argparse
import random
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import pandas as pd

from twotowers_tpu.data.factory.synthetic import (
    TOPICS, generate_document, generate_paragraph, generate_query)


def make_fixture(num_queries: int, seed: int = 0) -> pd.DataFrame:
    rng = random.Random(seed)
    rows = []
    for _ in range(num_queries):
        topic = rng.choice(sorted(TOPICS))
        keyword = rng.choice(TOPICS[topic])
        query = generate_query(rng, topic, keyword)
        positive = generate_paragraph(rng, topic, keyword,
                                      n_sentences=rng.randint(2, 4))
        has_answer = rng.random() < 0.7
        answer = f"{keyword} in {topic}" if has_answer else None

        passages = [(1, positive)]
        n_neg = rng.randint(2, 4)
        for _ in range(n_neg):
            passages.append((0, generate_document(rng)))
        if has_answer:
            # an unselected passage leaking the answer text: exercises the
            # answer_in_text filter in intra_query_zero_filtered
            leak = generate_document(rng) + f" Note that the answer is {answer}."
            passages.append((0, leak))
        rng.shuffle(passages)

        rows.append({
            "query": query,
            "answers": [answer] if has_answer else [],
            "passages": {
                "is_selected": [s for s, _ in passages],
                "passage_text": [t for _, t in passages],
            },
        })
    return pd.DataFrame(rows, columns=["query", "answers", "passages"])


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--queries", type=int, default=200)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--out",
        default=str(Path(__file__).resolve().parents[1]
                    / "tests" / "fixtures" / "msmarco_raw.parquet"))
    args = parser.parse_args(argv)

    df = make_fixture(args.queries, seed=args.seed)
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    df.to_parquet(out)
    print(f"Wrote {len(df)} MS MARCO-shaped rows to {out} "
          f"({out.stat().st_size:,} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
