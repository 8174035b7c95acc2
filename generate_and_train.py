#!/usr/bin/env python
"""Synthetic pipeline: generate pairs -> triplets parquet -> train.

Capability parity with /root/reference/generate_and_train.py:26-123 (which
shells out to the dataset_factory CLIs and train.py; here the same stages
run as direct calls producing the same artifacts).

Usage:
    python generate_and_train.py --num_pairs 200 --epochs 2
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO_ROOT))

from twotowers_tpu.utils import load_config, setup_logging


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="Generate synthetic data and train")
    parser.add_argument("--num_pairs", type=int, default=200)
    parser.add_argument("--negatives_per_query", type=int, default=1)
    parser.add_argument("--expand", type=int, default=0,
                        help="Additionally expand by N pairs after generation")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--config", default="configs/char_tower.yml")
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--output", default="data/processed/synthetic_triplets.parquet")
    args = parser.parse_args(argv)

    setup_logging(log_level="INFO")

    from twotowers_tpu.data.factory.synthetic import (
        expand_synthetic_dataset,
        generate_synthetic_pairs,
        write_pairs_tsv,
        write_triplets_parquet,
    )
    from twotowers_tpu.train import train_model

    df = generate_synthetic_pairs(args.num_pairs, args.negatives_per_query,
                                  seed=args.seed)
    if args.expand:
        df = expand_synthetic_dataset(df, args.expand, seed=args.seed + 1)
    write_pairs_tsv(df)
    data_path = write_triplets_parquet(df, args.output)

    config = load_config(args.config)
    config["data"] = str(data_path)
    config["use_wandb"] = config.get("use_wandb", False)
    if args.epochs is not None:
        config["epochs"] = args.epochs
    if args.batch_size is not None:
        config["batch_size"] = args.batch_size

    state, pipeline = train_model(config)
    print(f"Trained on {len(pipeline.dataset)} synthetic triplets "
          f"({int(state.step)} steps)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
