#!/usr/bin/env python
"""Empirical retrieval-quality parity: this framework vs the reference.

SURVEY.md §6/§7.3: the reference publishes NO MRR/Recall numbers, so quality
parity has to be *established*, not looked up. This harness:

1. generates one seeded synthetic dataset with our data factory
   (train triplets parquet + a held-out eval set of
   (query, [1 positive + K distractors], relevance) tuples),
2. trains the REFERENCE with its own PyTorch code (imported read-only from
   /root/reference — twotower/train.py:298-371 build_pipeline +
   train.py:64-220 train_epoch; torch here is CPU-only, which is the
   reference's achievable path in this image),
3. trains THIS framework with the identical config on the same parquet,
4. evaluates both with their own IR harnesses (identical semantics — ours is
   golden-tested against reference evaluate.py:126-236) on the SAME tuples,
   plus an untrained-model control,
5. prints a table + one JSON line and (with --write) records QUALITY.md.

Run:  python tools/quality_parity.py [--pairs 1500] [--epochs 3] [--write]
"""
from __future__ import annotations

import argparse
import json
import random
import sys
import tempfile
import types
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np

SEED = 0
EVAL_QUERIES = 200
CANDIDATES_PER_QUERY = 20
K_VALUES = [1, 5, 10]

CONFIG = {
    "device": "cpu",  # reference-side only; ours runs on the visible chip
    "epochs": 3,
    "batch_size": 256,
    "tokeniser": {"type": "char", "max_len": 64},
    "embedding": {"type": "lookup", "embedding_dim": 64},
    "encoder": {"arch": "mean", "hidden_dim": 128, "tied_weights": True},
    "loss": {"type": "triplet", "margin": 0.2},
    "optimizer": {"type": "adamw", "lr": 1e-3},
    "use_wandb": False,
    "huggingface": {"push_to_hub": False},
}


def build_data(tmp: Path, num_pairs: int):
    """Seeded train parquet + eval tuples, shared by both frameworks."""
    from twotowers_tpu.data.factory.synthetic import generate_synthetic_pairs
    from twotowers_tpu.data.triplets import pairs_to_triplets
    import pandas as pd

    train_pairs = generate_synthetic_pairs(num_pairs, negatives_per_query=2,
                                           seed=SEED)
    q, p, n = pairs_to_triplets(train_pairs["query"].tolist(),
                                train_pairs["document"].tolist(),
                                train_pairs["label"].tolist())
    train_path = tmp / "train_triplets.parquet"
    pd.DataFrame({"q_text": q, "d_pos_text": p, "d_neg_text": n}).to_parquet(
        train_path, index=False)

    # held-out eval: fresh queries; distractors drawn from other eval docs
    eval_pairs = generate_synthetic_pairs(EVAL_QUERIES, negatives_per_query=0,
                                          seed=SEED + 1)
    pos = eval_pairs[eval_pairs["label"] == 1].reset_index(drop=True)
    all_docs = pos["document"].tolist()
    rng = random.Random(SEED + 2)
    tuples = []
    for i in range(len(pos)):
        query, positive = pos.loc[i, "query"], pos.loc[i, "document"]
        distractors = [all_docs[j] for j in
                       rng.sample([j for j in range(len(all_docs)) if j != i],
                                  CANDIDATES_PER_QUERY - 1)]
        docs = [positive] + distractors
        relevance = [1] + [0] * (CANDIDATES_PER_QUERY - 1)
        order = list(range(CANDIDATES_PER_QUERY))
        rng.shuffle(order)  # don't leak the positive's position
        tuples.append((query, [docs[j] for j in order],
                       [relevance[j] for j in order]))
    return train_path, tuples, len(q)


def run_reference(train_path: Path, tuples, epochs: int):
    """Train + evaluate the reference with its own code (read-only import)."""
    sys.path.insert(0, "/root/reference")
    sys.modules.setdefault("wandb", types.ModuleType("wandb"))
    import torch
    from torch.utils.data import DataLoader
    from twotower.train import build_pipeline, train_epoch
    from twotower.evaluate import evaluate_model

    torch.manual_seed(SEED)
    cfg = dict(CONFIG, data=str(train_path), epochs=epochs)
    model, dataset, optimizer, loss_fn = build_pipeline(cfg, "cpu")
    loader = DataLoader(dataset, batch_size=cfg["batch_size"], shuffle=True,
                        generator=torch.Generator().manual_seed(SEED))
    last = {}
    for _ in range(epochs):
        last = train_epoch(model, loader, optimizer, loss_fn, "cpu")
    results = evaluate_model(model, tuples, dataset.tokeniser,
                             k_values=K_VALUES, device="cpu")
    return results, float(last.get("loss", float("nan")))


def run_ours(train_path: Path, tuples, epochs: int, tmp: Path,
             trained: bool = True):
    """Train + evaluate this framework on the same data and hyperparams."""
    from twotowers_tpu.evaluation import evaluate_model
    from twotowers_tpu.train import train_model
    from twotowers_tpu.train.loop import evaluate
    from twotowers_tpu.train.pipeline import build_pipeline
    from twotowers_tpu.train.step import make_eval_step

    cfg = dict(CONFIG, data=str(train_path), epochs=epochs,
               checkpoint_dir=str(tmp / "ckpt"), log_dir=str(tmp / "logs"))
    if trained:
        state, pipeline = train_model(cfg, seed=SEED)
        params = state.params
        eval_step = make_eval_step(pipeline.spec, pipeline.loss_def)
        loss = evaluate(eval_step, params, pipeline,
                        cfg["batch_size"])["loss"]
    else:
        pipeline = build_pipeline(cfg, seed=SEED)
        params, loss = pipeline.params, float("nan")
    results = evaluate_model(params, pipeline.spec, tuples, pipeline.tokenizer,
                             k_values=K_VALUES)
    return results, loss


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=1500)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--write", action="store_true",
                    help="record results into QUALITY.md")
    args = ap.parse_args()

    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td)
        train_path, tuples, n_triplets = build_data(tmp, args.pairs)
        print(f"data: {n_triplets} train triplets, {len(tuples)} eval queries "
              f"x {CANDIDATES_PER_QUERY} candidates", flush=True)

        ours, ours_loss = run_ours(train_path, tuples, args.epochs, tmp)
        untrained, _ = run_ours(train_path, tuples, args.epochs, tmp,
                                trained=False)
        ref, ref_loss = run_reference(train_path, tuples, args.epochs)

    keys = ["mrr"] + [f"{m}@{k}" for m in ("precision", "recall", "ndcg")
                      for k in K_VALUES]
    print(f"\n{'metric':<14}{'reference':>12}{'ours':>12}{'untrained':>12}")
    for key in keys:
        print(f"{key:<14}{ref.get(key, float('nan')):>12.4f}"
              f"{ours.get(key, float('nan')):>12.4f}"
              f"{untrained.get(key, float('nan')):>12.4f}")
    print(f"{'final loss':<14}{ref_loss:>12.4f}{ours_loss:>12.4f}")

    record = {"reference": ref, "ours": ours, "untrained": untrained,
              "pairs": args.pairs, "epochs": args.epochs,
              "triplets": n_triplets, "eval_queries": len(tuples)}
    print(json.dumps(record))

    if args.write:
        lines = [
            "# QUALITY — empirical retrieval-quality parity\n",
            "Both frameworks trained on the SAME seeded synthetic triplet",
            "dataset with the SAME hyperparameters (char tokenizer, embed 64,",
            "hidden 128, tied towers, triplet margin 0.2, AdamW 1e-3, batch",
            f"256, {args.epochs} epochs, {n_triplets} triplets), evaluated on",
            f"the SAME {len(tuples)} held-out queries x"
            f" {CANDIDATES_PER_QUERY} candidates.",
            "Reference = its own PyTorch code at /root/reference (CPU torch —",
            "its only path in this image); ours = twotowers_tpu on the visible",
            "chip. Untrained = our init params (control). Produced by",
            "`python tools/quality_parity.py --write`.\n",
            "| metric | reference (PyTorch) | ours (JAX/TPU) | untrained |",
            "|---|---|---|---|",
        ]
        for key in keys:
            lines.append(f"| {key} | {ref.get(key, float('nan')):.4f} "
                         f"| {ours.get(key, float('nan')):.4f} "
                         f"| {untrained.get(key, float('nan')):.4f} |")
        lines.append(f"| final train loss | {ref_loss:.4f} "
                     f"| {ours_loss:.4f} | — |")
        lines.append("\n```json\n" + json.dumps(record, indent=2) + "\n```")
        (REPO / "QUALITY.md").write_text("\n".join(lines) + "\n")
        print("wrote QUALITY.md")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
