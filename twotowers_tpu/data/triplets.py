"""Triplet dataset: parquet/TSV loading, pairs->triplets, eager encoding.

Capability parity with the reference's ``TripletDataset``
(/root/reference/twotower/dataset.py:14-306): column-name aliasing
(``query``/``q_text``, ``positive_doc``/``d_pos_text``,
``negative_doc``/``d_neg_text``), pairs-format conversion via a per-query
cartesian product of positives x negatives (dataset.py:192-241), tokenizer
fitting when unfit (dataset.py:44-48), and eager pre-encoding
(dataset.py:51-55). TPU-first difference: instead of per-item ``__getitem__``
tensors, the whole split materialises as three static ``(N, L)`` int32
arrays, ready for :func:`twotowers_tpu.data.batching.iterate_batches`.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from ..tokenizers import BaseTokenizer
from ..utils.logging import get_logger

logger = get_logger("data.triplets")

# accepted column aliases, in priority order
TRIPLET_SCHEMAS = [
    ("q_text", "d_pos_text", "d_neg_text"),
    ("query", "positive_doc", "negative_doc"),
]
PAIRS_SCHEMA = ("query", "document", "label")


def pairs_to_triplets(
    queries: Sequence[str],
    documents: Sequence[str],
    labels: Sequence[int],
) -> Tuple[List[str], List[str], List[str]]:
    """Convert (query, document, label) pairs to cartesian triplets.

    For each query, every positive (label==1) is crossed with every
    negative (label==0); queries lacking either side are dropped — the
    reference's conversion semantics (dataset.py:192-241).
    """
    by_query: dict = {}
    order: List[str] = []
    for q, d, lbl in zip(queries, documents, labels):
        if q not in by_query:
            by_query[q] = ([], [])
            order.append(q)
        by_query[q][0 if int(lbl) == 1 else 1].append(d)

    out_q: List[str] = []
    out_p: List[str] = []
    out_n: List[str] = []
    for q in order:
        positives, negatives = by_query[q]
        for pos in positives:
            for neg in negatives:
                out_q.append(q)
                out_p.append(pos)
                out_n.append(neg)
    return out_q, out_p, out_n


def _read_table(data_path: str) -> pd.DataFrame:
    path = Path(data_path)
    suffix = path.suffix.lower()
    if suffix == ".parquet":
        return pd.read_parquet(path)
    if suffix in (".tsv", ".txt"):
        df = pd.read_csv(path, sep="\t")
        known = set(df.columns)
        if not (any(set(s) <= known for s in TRIPLET_SCHEMAS)
                or set(PAIRS_SCHEMA) <= known):
            # headerless pairs TSV (the synthetic generator's raw format)
            df = pd.read_csv(path, sep="\t", header=None,
                             names=list(PAIRS_SCHEMA))
        return df
    raise ValueError(f"Unsupported file format: {suffix!r} ({data_path})")


class TripletDataset:
    """(query, positive, negative) text triplets encoded to static arrays."""

    def __init__(
        self,
        data_path: str,
        tokenizer: BaseTokenizer,
        max_length: int = 64,
        *,
        encode: bool = True,
    ):
        self.data_path = str(data_path)
        self.tokenizer = tokenizer
        self.max_length = int(max_length)

        df = _read_table(self.data_path)
        self.query_texts, self.positive_texts, self.negative_texts = (
            self._extract_triplets(df)
        )

        if not tokenizer.is_fitted:
            all_texts = (list(self.query_texts) + list(self.positive_texts)
                         + list(self.negative_texts))
            tokenizer.fit(all_texts)
            logger.info("Fitted tokenizer on %d texts (vocab=%d)",
                        len(all_texts), tokenizer.vocab_size)

        self._arrays: Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]] = None
        if encode:
            self._arrays = self._encode_all()

    @staticmethod
    def _extract_triplets(df: pd.DataFrame) -> Tuple[List[str], List[str], List[str]]:
        cols = set(df.columns)
        for q_col, p_col, n_col in TRIPLET_SCHEMAS:
            if {q_col, p_col, n_col} <= cols:
                return (
                    df[q_col].astype(str).tolist(),
                    df[p_col].astype(str).tolist(),
                    df[n_col].astype(str).tolist(),
                )
        if set(PAIRS_SCHEMA) <= cols:
            return pairs_to_triplets(
                df["query"].astype(str).tolist(),
                df["document"].astype(str).tolist(),
                df["label"].tolist(),
            )
        raise ValueError(
            f"Unsupported dataframe format: columns {sorted(cols)}; expected "
            f"one of {TRIPLET_SCHEMAS} or {PAIRS_SCHEMA}"
        )

    def _encode_all(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        enc = lambda texts: self.tokenizer.encode_batch(texts, self.max_length)
        return (enc(self.query_texts), enc(self.positive_texts),
                enc(self.negative_texts))

    def arrays(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Three static ``(N, max_length)`` int32 arrays (q, d+, d-)."""
        if self._arrays is None:
            self._arrays = self._encode_all()
        return self._arrays

    def get_original_texts(self, index: int) -> Tuple[str, str, str]:
        return (self.query_texts[index], self.positive_texts[index],
                self.negative_texts[index])

    @property
    def vocab_size(self) -> int:
        return self.tokenizer.vocab_size

    def __len__(self) -> int:
        return len(self.query_texts)

    def __repr__(self) -> str:  # pragma: no cover
        return (f"TripletDataset({self.data_path!r}, n={len(self)}, "
                f"max_length={self.max_length})")
