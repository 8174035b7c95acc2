"""Training-free mean-word-vector retrieval baseline.

Capability parity with /root/reference/inference/search/glove.py:15-132
(GloVeSearch: average pretrained word vectors per text, cosine rank, pickle
index) — generalised: ``MeanVectorSearch`` works with any word->vector
mapping and scores on-device through the same fused score+top-k op as the
trained engine; ``GloVeSearch`` binds it to gensim GloVe downloads and is
gated (this environment has no gensim — a deterministic hashed fallback
keeps the baseline runnable offline, clearly flagged in logs).
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.topk_score import score_topk
from ..utils.logging import get_logger
from .base import BaseSearch

logger = get_logger("index.glove")

_WORDS = re.compile(r"\b\w+\b")
ROW_ALIGN = 128


def _round_up(n: int, m: int) -> int:
    return -(-max(n, 1) // m) * m


class MeanVectorSearch(BaseSearch):
    """Mean-of-word-vectors text encoder + dense top-k search."""

    def __init__(self, vectors: Dict[str, np.ndarray], dim: Optional[int] = None):
        self.vectors = vectors
        if dim is None:
            dim = len(next(iter(vectors.values()))) if vectors else 50
        self.dim = int(dim)
        self.documents: List[str] = []
        self._doc_matrix: Optional[jnp.ndarray] = None
        self._n_docs = 0
        self._topk = {}

    # ---- encoding ------------------------------------------------------------

    def _average_pool(self, text: str) -> np.ndarray:
        """Mean of known word vectors; zeros when no word is known
        (reference glove.py:40-63 semantics)."""
        words = _WORDS.findall(text.lower())
        vecs = [self.vectors[w] for w in words if w in self.vectors]
        if not vecs:
            return np.zeros(self.dim, dtype=np.float32)
        return np.mean(np.asarray(vecs, dtype=np.float32), axis=0)

    def encode(self, texts: Sequence[str]) -> np.ndarray:
        out = np.zeros((len(texts), self.dim), dtype=np.float32)
        for i, text in enumerate(texts):
            out[i] = self._average_pool(text)
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        return out / np.maximum(norms, 1e-8)

    # ---- BaseSearch ----------------------------------------------------------

    def index_documents(self, documents: Sequence[str]) -> None:
        self.documents = list(documents)
        self._n_docs = len(self.documents)
        vecs = self.encode(self.documents)
        n_pad = _round_up(self._n_docs, ROW_ALIGN)
        if n_pad != self._n_docs:
            vecs = np.concatenate(
                [vecs, np.zeros((n_pad - self._n_docs, self.dim), np.float32)]
            )
        self._doc_matrix = jax.device_put(jnp.asarray(vecs))
        logger.info("Indexed %d documents (dim=%d)", self._n_docs, self.dim)

    def _topk_fn(self, k: int):
        if k not in self._topk:
            self._topk[k] = jax.jit(
                lambda docs, queries, n: score_topk(docs, queries, k, n)
            )
        return self._topk[k]

    def search(self, query: str, top_k: int = 5) -> List[Tuple[str, float]]:
        if self._doc_matrix is None:
            raise RuntimeError("No index built; call index_documents or load_index")
        top_k = min(top_k, self._n_docs)
        q = jnp.asarray(self.encode([query]))
        scores, indices = self._topk_fn(top_k)(
            self._doc_matrix, q, jnp.int32(self._n_docs)
        )
        return [
            (self.documents[int(i)], float(s))
            for s, i in zip(np.asarray(scores)[0], np.asarray(indices)[0])
        ]

    def save_index(self, path: str) -> None:
        if self._doc_matrix is None:
            raise RuntimeError("No index to save")
        out = Path(path)
        out.mkdir(parents=True, exist_ok=True)
        np.savez_compressed(
            out / "embeddings.npz",
            embeddings=np.asarray(self._doc_matrix)[: self._n_docs],
        )
        with open(out / "documents.json", "w") as f:
            json.dump({"documents": self.documents, "dim": self.dim}, f)
        logger.info("Saved index (%d docs) to %s", self._n_docs, out)

    def load_index(self, path: str) -> None:
        src = Path(path)
        with np.load(src / "embeddings.npz") as data:
            vecs = data["embeddings"]
        with open(src / "documents.json") as f:
            payload = json.load(f)
        self.documents = payload["documents"]
        self.dim = int(payload.get("dim", vecs.shape[1]))
        self._n_docs = len(self.documents)
        n_pad = _round_up(self._n_docs, ROW_ALIGN)
        if n_pad != self._n_docs:
            vecs = np.concatenate(
                [vecs, np.zeros((n_pad - self._n_docs, vecs.shape[1]), vecs.dtype)]
            )
        self._doc_matrix = jax.device_put(jnp.asarray(vecs))

    @property
    def num_documents(self) -> int:
        return self._n_docs


def _hashed_vectors(dim: int) -> Dict[str, np.ndarray]:
    """Deterministic per-word pseudo-vectors for offline runs (no gensim)."""

    class _HashDict(dict):
        def __missing__(self, word):
            seed = abs(hash(("hashed-vec", word))) % (2**31)
            vec = np.random.default_rng(seed).normal(size=dim).astype(np.float32)
            self[word] = vec
            return vec

        def __contains__(self, word):  # every word has a vector
            return isinstance(word, str)

    return _HashDict()


class GloVeSearch(MeanVectorSearch):
    """MeanVectorSearch bound to gensim GloVe downloads (gated)."""

    def __init__(self, model_name: str = "glove-twitter-25", dim: Optional[int] = None):
        self.model_name = model_name
        vectors: Dict[str, np.ndarray] = {}
        try:
            import gensim.downloader as api  # gated import

            kv = api.load(model_name)
            vectors = {w: np.asarray(kv[w], np.float32) for w in kv.index_to_key}
            dim = kv.vector_size
            logger.info("Loaded %d GloVe vectors (%s)", len(vectors), model_name)
        except Exception as exc:
            logger.warning(
                "GloVe vectors %r unavailable (%s); using deterministic hashed "
                "fallback vectors.", model_name, exc,
            )
            dim = dim or 50
            vectors = _hashed_vectors(dim)
        super().__init__(vectors, dim)
