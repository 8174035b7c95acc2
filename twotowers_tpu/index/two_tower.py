"""On-device dense retrieval with a trained two-tower model.

Capability parity with /root/reference/inference/search/two_tower.py:15-154
(index_documents / search / save_index / load_index over a trained model),
re-designed TPU-first: the document matrix lives in HBM as a padded, tile-
aligned array; queries are encoded by a jitted tower and scored by the fused
score+top-k op (``ops/topk_score.py`` — Pallas kernel when registered, XLA
otherwise) in a single device launch, instead of the reference's host-side
cosine + torch.topk over a pickled matrix. Persistence is npz + JSON, not
pickle.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.towers import TwoTowerSpec, encode
from ..ops.topk_score import score_topk
from ..tokenizers.base import BaseTokenizer
from ..utils.logging import get_logger
from .base import BaseSearch

logger = get_logger("index.two_tower")

ROW_ALIGN = 128  # pad the doc axis to the MXU/VPU lane width


def _round_up(n: int, m: int) -> int:
    return -(-max(n, 1) // m) * m


class TwoTowerSearch(BaseSearch):
    """Dense top-k search over documents encoded by the document tower."""

    def __init__(
        self,
        params: Any,
        spec: TwoTowerSpec,
        tokenizer: BaseTokenizer,
        max_length: int = 64,
        encode_batch_size: int = 256,
    ):
        self.params = params
        self.spec = spec
        self.tokenizer = tokenizer
        self.max_length = int(max_length)
        self.encode_batch_size = int(encode_batch_size)

        self.documents: List[str] = []
        self._doc_matrix: Optional[jnp.ndarray] = None  # (N_pad, D) on device
        self._n_docs: int = 0

        self._encode = jax.jit(
            lambda p, ids, tower: encode(p, spec, ids, tower),
            static_argnums=(2,),
        )
        self._topk = {}  # k -> jitted search fn

    # ---- indexing ------------------------------------------------------------

    def _encode_texts_device(self, texts: Sequence[str],
                             tower: str) -> jnp.ndarray:
        """(N, D) unit vectors, left ON DEVICE — no blocking readback.

        Callers that chain another device op (search, the serving store)
        stay fully async until their own final readback: the relay charges
        ~25 ms per blocking host transfer, so the number of readbacks, not
        launches, sets serving latency."""
        ids = self.tokenizer.encode_batch(list(texts), self.max_length)
        n = len(texts)
        bs = self.encode_batch_size
        padded = _round_up(n, bs)
        if padded != n:
            ids = np.concatenate([ids, np.zeros((padded - n, self.max_length), np.int32)])
        # bounded in-flight window: dispatching every chunk before any sync
        # kept all inputs + outputs resident in HBM simultaneously, so a very
        # large corpus lost the per-chunk memory bound. Merging every
        # MAX_INFLIGHT chunks (inputs become collectable) and blocking on the
        # previous merge keeps device memory O(window), still with zero
        # blocking transfers of the result itself.
        MAX_INFLIGHT = 64
        chunks: List[jnp.ndarray] = []
        merged: List[jnp.ndarray] = []
        for start in range(0, padded, bs):
            chunks.append(
                self._encode(self.params, jnp.asarray(ids[start:start + bs]), tower)
            )
            if len(chunks) >= MAX_INFLIGHT:
                if merged:
                    merged[-1].block_until_ready()
                merged.append(jnp.concatenate(chunks))
                chunks = []
        if chunks:
            merged.append(chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks))
        out = merged[0] if len(merged) == 1 else jnp.concatenate(merged)
        return out[:n]

    def _encode_texts(self, texts: Sequence[str], tower: str) -> np.ndarray:
        return np.asarray(self._encode_texts_device(texts, tower))

    def index_documents(self, documents: Sequence[str]) -> None:
        start = time.time()
        self.documents = list(documents)
        self._n_docs = len(self.documents)
        vecs = self._encode_texts(self.documents, "document")
        n_pad = _round_up(self._n_docs, ROW_ALIGN)
        if n_pad != self._n_docs:
            vecs = np.concatenate(
                [vecs, np.zeros((n_pad - self._n_docs, vecs.shape[1]), vecs.dtype)]
            )
        self._doc_matrix = jax.device_put(jnp.asarray(vecs))
        logger.info(
            "Indexed %d documents in %.3fs (%.0f docs/s)",
            self._n_docs, time.time() - start,
            self._n_docs / max(time.time() - start, 1e-9),
        )

    # ---- search --------------------------------------------------------------

    def _topk_fn(self, k: int):
        if k not in self._topk:
            self._topk[k] = jax.jit(
                lambda docs, queries, n: score_topk(docs, queries, k, n)
            )
        return self._topk[k]

    def search_batch(
        self, queries: Sequence[str], top_k: int = 5
    ) -> List[List[Tuple[str, float]]]:
        """Top-k for a batch of queries in one device launch."""
        if self._doc_matrix is None:
            raise RuntimeError("No index built; call index_documents or load_index")
        top_k = min(top_k, self._n_docs)
        # encode stays on device: one blocking readback for the whole search
        q_vecs = self._encode_texts_device(list(queries), "query")
        scores, indices = self._topk_fn(top_k)(
            self._doc_matrix, q_vecs, jnp.int32(self._n_docs)
        )
        # single packed readback; indices ride as their int32 BIT PATTERNS
        # (bitcast, not value cast), so the packing is exact at any corpus
        # size — a value cast to f32 silently rounds indices above 2^24
        packed = np.asarray(jnp.concatenate(
            [scores.astype(jnp.float32),
             jax.lax.bitcast_convert_type(
                 indices.astype(jnp.int32), jnp.float32)], axis=1))
        scores = packed[:, :top_k]
        indices = packed[:, top_k:].view(np.int32)
        return [
            [(self.documents[int(i)], float(s)) for s, i in zip(qs, qi)]
            for qs, qi in zip(scores, indices)
        ]

    def search(self, query: str, top_k: int = 5) -> List[Tuple[str, float]]:
        return self.search_batch([query], top_k)[0]

    # ---- persistence ---------------------------------------------------------

    def save_index(self, path: str) -> None:
        """Write embeddings (npz) + documents/meta (JSON) under ``path``.

        ``path`` is a directory (the reference used a single pickle file;
        a directory keeps arrays and text separately loadable).
        """
        if self._doc_matrix is None:
            raise RuntimeError("No index to save")
        out = Path(path)
        out.mkdir(parents=True, exist_ok=True)
        np.savez_compressed(
            out / "embeddings.npz",
            embeddings=np.asarray(self._doc_matrix)[: self._n_docs],
        )
        with open(out / "documents.json", "w") as f:
            json.dump(
                {"documents": self.documents, "max_length": self.max_length}, f
            )
        logger.info("Saved index (%d docs) to %s", self._n_docs, out)

    def load_index(self, path: str) -> None:
        src = Path(path)
        with np.load(src / "embeddings.npz") as data:
            vecs = data["embeddings"]
        with open(src / "documents.json") as f:
            payload = json.load(f)
        self.documents = payload["documents"]
        self._n_docs = len(self.documents)
        n_pad = _round_up(self._n_docs, ROW_ALIGN)
        if n_pad != self._n_docs:
            vecs = np.concatenate(
                [vecs, np.zeros((n_pad - self._n_docs, vecs.shape[1]), vecs.dtype)]
            )
        self._doc_matrix = jax.device_put(jnp.asarray(vecs))
        logger.info("Loaded index (%d docs) from %s", self._n_docs, src)

    @property
    def num_documents(self) -> int:
        return self._n_docs
