"""Model evaluation over (query, documents, relevance) test tuples.

Capability parity with /root/reference/twotower/evaluate.py:126-270
(``evaluate_model`` + ``print_evaluation_results``): per-query cosine ranking
of candidate documents, P@K/R@K/MRR/NDCG@K aggregation over k in {1,5,10}.
TPU-first differences: document encoding is one jitted batched pass per
fixed-shape chunk (not a Python batch loop of eager forwards), and the
query max-length follows the tokenizer config instead of the reference's
hardcoded 64 (evaluate.py:162,176 — a quirk SURVEY.md §5 says not to copy);
pass ``max_length=64`` to reproduce it exactly.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.towers import TwoTowerSpec, encode
from ..tokenizers.base import BaseTokenizer
from ..utils.logging import get_logger
from .metrics import mean_reciprocal_rank, ndcg_at_k, precision_at_k, recall_at_k

logger = get_logger("evaluation.evaluate")

TestTuple = Tuple[str, List[str], List[int]]

DEFAULT_K_VALUES = [1, 5, 10]
DEFAULT_MAX_LENGTH = 64


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


class _Encoder:
    """Shape-bucketed jitted encoder so XLA compiles once per (chunk, len)."""

    def __init__(self, params: Any, spec: TwoTowerSpec, tokenizer: BaseTokenizer,
                 max_length: int, batch_size: int):
        self.params = params
        self.spec = spec
        self.tokenizer = tokenizer
        self.max_length = max_length
        self.batch_size = batch_size
        self._jitted = {}

    def _fn(self, tower: str):
        if tower not in self._jitted:
            spec = self.spec
            self._jitted[tower] = jax.jit(
                lambda p, ids: encode(p, spec, ids, tower)
            )
        return self._jitted[tower]

    def __call__(self, texts: Sequence[str], tower: str) -> np.ndarray:
        ids = self.tokenizer.encode_batch(list(texts), self.max_length)
        n = len(texts)
        padded_n = _round_up(max(n, 1), self.batch_size)
        if padded_n != n:
            ids = np.concatenate(
                [ids, np.zeros((padded_n - n, self.max_length), np.int32)]
            )
        fn = self._fn(tower)
        # dispatch chunks async, read back ONCE: each blocking transfer
        # costs a full round-trip on relayed devices (~26 ms here), which
        # dominated evaluation wall-clock at 8 readbacks per test tuple.
        # The in-flight window is bounded so device memory stays O(window)
        # rather than O(corpus): every MAX_INFLIGHT chunks the outputs are
        # concatenated on-device (inputs become collectable) and we block on
        # the oldest concat before dispatching past the next window.
        MAX_INFLIGHT = 64
        outs: List[Any] = []
        merged: List[Any] = []
        for start in range(0, padded_n, self.batch_size):
            outs.append(
                fn(self.params, jnp.asarray(ids[start:start + self.batch_size]))
            )
            if len(outs) >= MAX_INFLIGHT:
                if merged:
                    merged[-1].block_until_ready()
                merged.append(jnp.concatenate(outs))
                outs = []
        if outs:
            merged.append(outs[0] if len(outs) == 1 else jnp.concatenate(outs))
        device_out = merged[0] if len(merged) == 1 else jnp.concatenate(merged)
        return np.asarray(device_out)[:n]


def evaluate_model(
    params: Any,
    spec: TwoTowerSpec,
    test_data: Sequence[TestTuple],
    tokenizer: BaseTokenizer,
    metrics: Sequence[str] = ("precision", "recall", "mrr", "ndcg"),
    k_values: Sequence[int] = DEFAULT_K_VALUES,
    batch_size: int = 32,
    max_length: int = DEFAULT_MAX_LENGTH,
    ndcg_reference_compat: bool = False,
) -> Dict[str, float]:
    """Evaluate retrieval quality; returns {metric@k: score} means.

    ``ndcg_reference_compat=True`` reproduces the reference's degenerate
    NDCG call shape (see metrics.ndcg_at_k) for parity harness runs only.
    """
    encoder = _Encoder(params, spec, tokenizer, max_length, batch_size)

    all_precision, all_recall, all_mrr, all_ndcg = [], [], [], []
    for query, documents, relevance in test_data:
        q_vec = encoder([query], "query")[0]
        d_vecs = encoder(documents, "document")

        # towers emit unit vectors, so cosine == dot; guard anyway for parity
        norms = np.linalg.norm(d_vecs, axis=-1) * np.linalg.norm(q_vec)
        scores = (d_vecs @ q_vec) / np.maximum(norms, 1e-8)
        order = np.argsort(-scores, kind="stable")
        sorted_relevance = np.asarray(relevance)[order]
        total_relevant = int(np.sum(relevance))

        all_precision.append([precision_at_k(sorted_relevance, k) for k in k_values])
        all_recall.append(
            [recall_at_k(sorted_relevance, k, total_relevant) for k in k_values]
        )
        all_mrr.append(mean_reciprocal_rank(sorted_relevance))
        all_ndcg.append([
            ndcg_at_k(sorted_relevance, k, reference_compat=ndcg_reference_compat)
            for k in k_values
        ])

    results: Dict[str, float] = {}
    if "precision" in metrics:
        for i, k in enumerate(k_values):
            results[f"precision@{k}"] = float(np.mean([p[i] for p in all_precision]))
    if "recall" in metrics:
        for i, k in enumerate(k_values):
            results[f"recall@{k}"] = float(np.mean([r[i] for r in all_recall]))
    if "mrr" in metrics:
        results["mrr"] = float(np.mean(all_mrr))
    if "ndcg" in metrics:
        for i, k in enumerate(k_values):
            results[f"ndcg@{k}"] = float(np.mean([n[i] for n in all_ndcg]))
    return results


def print_evaluation_results(results: Dict[str, float]) -> None:
    """Pretty-print grouped metric results (reference evaluate.py:238-270)."""
    print("\nEvaluation Results:")
    print("=" * 50)
    for prefix, title in (("precision", "Precision"), ("recall", "Recall")):
        group = {k: v for k, v in results.items() if k.startswith(prefix)}
        if group:
            print(f"\n{title}:")
            for key, value in sorted(group.items()):
                print(f"  {key}: {value:.4f}")
    if "mrr" in results:
        print("\nMean Reciprocal Rank:")
        print(f"  MRR: {results['mrr']:.4f}")
    ndcg = {k: v for k, v in results.items() if k.startswith("ndcg")}
    if ndcg:
        print("\nNDCG:")
        for key, value in sorted(ndcg.items()):
            print(f"  {key}: {value:.4f}")
    print("=" * 50)
