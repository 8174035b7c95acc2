#!/usr/bin/env python
"""Data-prep only: download MS MARCO, export parquet, build triplets.

Capability parity with /root/reference/prepare_ms_marco.py:30-76 (no
training — produces artifacts for later runs).

Usage:
    python prepare_ms_marco.py --split train --preset presets/classic.yml \
        --output data/processed/classic_triplets.parquet
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO_ROOT))

import yaml

from twotowers_tpu.utils import setup_logging


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="Prepare MS MARCO triplets")
    parser.add_argument("--split", default="train")
    parser.add_argument("--preset", default="presets/classic.yml")
    parser.add_argument("--output", default="data/processed/classic_triplets.parquet")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--input_parquet", default=None,
                        help="Pre-downloaded raw split parquet (offline mode)")
    args = parser.parse_args(argv)

    setup_logging(log_level="INFO")

    import pandas as pd

    from twotowers_tpu.data.factory.build_dataset import build_triplets, write_genealogy
    from twotowers_tpu.data.factory.readers import load_split, setup_data_dirs

    setup_data_dirs()
    if args.input_parquet:
        df = pd.read_parquet(args.input_parquet)
    else:
        df = load_split(args.split)
    preset = yaml.safe_load(Path(args.preset).read_text())
    triplets = build_triplets(df, preset, seed=args.seed)

    output = Path(args.output)
    output.parent.mkdir(parents=True, exist_ok=True)
    triplets.to_parquet(output)
    write_genealogy(output, preset=preset, preset_path=args.preset,
                    split=args.split, input_rows=len(df),
                    output_rows=len(triplets), seed=args.seed)
    print(f"Wrote {len(triplets):,} triplets to {output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
