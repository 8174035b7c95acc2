"""Retrieval CLI: build an index from a checkpoint, then search it.

Capability parity with /root/reference/inference/cli/retrieve.py:24-151
(``build-index`` / ``search`` subcommands, ranked results with latency) —
without its latent bug of treating a stored state_dict as a live module:
the checkpoint sidecar carries config + tokenizer, so the model is fully
reconstructed (``train.checkpoint.load_trained_model``).

Usage:
    python -m twotowers_tpu.index.cli build-index \
        --checkpoint checkpoints/best_model --documents docs.txt --index idx/
    python -m twotowers_tpu.index.cli search \
        --checkpoint checkpoints/best_model --index idx/ --query "..." --top_k 5
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path
from typing import List, Optional

from ..train.checkpoint import load_trained_model
from ..utils.logging import get_logger, setup_logging
from .two_tower import TwoTowerSearch

logger = get_logger("index.cli")


def _load_documents(path: str) -> List[str]:
    """One document per line (txt) or a parquet with a text column."""
    if path.endswith(".parquet"):
        import pandas as pd

        df = pd.read_parquet(path)
        for col in ("document", "text", "d_pos_text", "passage_text"):
            if col in df.columns:
                return df[col].astype(str).tolist()
        raise ValueError(f"No text column found in {path}: {df.columns.tolist()}")
    return [line.strip() for line in Path(path).read_text().splitlines() if line.strip()]


def _build_search(checkpoint: str, max_length: Optional[int]) -> TwoTowerSearch:
    params, spec, tokenizer, config = load_trained_model(checkpoint)
    if max_length is None:
        tok_cfg = config.get("tokeniser", config.get("tokenizer", {})) or {}
        max_length = int(tok_cfg.get("max_len", config.get("max_sequence_length", 64)))
    return TwoTowerSearch(params, spec, tokenizer, max_length=max_length)


def build_index_command(args) -> int:
    search = _build_search(args.checkpoint, args.max_length)
    documents = _load_documents(args.documents)
    start = time.time()
    search.index_documents(documents)
    elapsed = time.time() - start
    search.save_index(args.index)
    print(f"Indexed {len(documents)} documents in {elapsed:.2f}s "
          f"({len(documents)/max(elapsed,1e-9):.0f} docs/s) -> {args.index}")
    return 0


def search_command(args) -> int:
    search = _build_search(args.checkpoint, args.max_length)
    search.load_index(args.index)
    start = time.time()
    results = search.search(args.query, top_k=args.top_k)
    latency = time.time() - start
    print(f'Query: "{args.query}"  ({latency*1000:.1f} ms, '
          f"{search.num_documents} docs)")
    for rank, (doc, score) in enumerate(results, 1):
        snippet = doc if len(doc) <= 100 else doc[:97] + "..."
        print(f"{rank:2d}. [{score:.4f}] {snippet}")
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="Two-tower dense retrieval CLI")
    sub = parser.add_subparsers(dest="command", required=True)

    build = sub.add_parser("build-index", help="Encode documents into an index")
    build.add_argument("--checkpoint", required=True)
    build.add_argument("--documents", required=True,
                       help="txt (one doc/line) or parquet with a text column")
    build.add_argument("--index", required=True, help="Output index directory")
    build.add_argument("--max_length", type=int, default=None)
    build.set_defaults(fn=build_index_command)

    search = sub.add_parser("search", help="Search a built index")
    search.add_argument("--checkpoint", required=True)
    search.add_argument("--index", required=True)
    search.add_argument("--query", required=True)
    search.add_argument("--top_k", type=int, default=5)
    search.add_argument("--max_length", type=int, default=None)
    search.set_defaults(fn=search_command)

    args = parser.parse_args(argv)
    setup_logging(log_level="WARNING")
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
