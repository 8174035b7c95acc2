"""In-process vector store: the serving layer's document collection.

Plays the role ChromaDB plays for the reference's inference service
(/root/reference/inference/docker/app.py:159-306 and docker-compose.yml) —
add/query/persist — but runs in-process on top of the same on-device
score+top-k op as the index layer, so a single container serves without a
sidecar database. A Chroma-backed collection can be swapped in behind the
same interface when that infrastructure exists.
"""

from __future__ import annotations

import json
import threading
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..utils.logging import get_logger

logger = get_logger("serve.store")


class VectorCollection:
    """A named collection of (id, document, metadata, embedding) records."""

    def __init__(self, name: str, dim: Optional[int] = None):
        self.name = name
        self.dim = dim
        self._ids: List[str] = []
        self._documents: List[str] = []
        self._metadatas: List[Dict] = []
        self._embeddings: Optional[np.ndarray] = None
        self._id_to_pos: Dict[str, int] = {}
        self._lock = threading.Lock()
        # device-resident L2-normalised copy of the matrix, rebuilt lazily
        # when _version moves (round-4 serving fix: the old query path
        # re-normalised AND re-uploaded the WHOLE matrix per query — 165 ms
        # of a 190 ms search at 10k docs, SERVE_BENCH.json)
        self._version = 0
        self._device_version = -1
        self._device_unit = None
        self._device_n = 0

    # ---- mutation ------------------------------------------------------------

    def add(
        self,
        ids: Sequence[str],
        embeddings: np.ndarray,
        documents: Sequence[str],
        metadatas: Optional[Sequence[Dict]] = None,
    ) -> int:
        """Insert or overwrite records by id; returns number added."""
        embeddings = np.asarray(embeddings, dtype=np.float32)
        if embeddings.ndim != 2 or len(ids) != len(embeddings) or len(ids) != len(documents):
            raise ValueError("ids/embeddings/documents must align; embeddings 2-D")
        if self.dim is None:
            self.dim = int(embeddings.shape[1])
        if embeddings.shape[1] != self.dim:
            raise ValueError(f"dim mismatch: {embeddings.shape[1]} != {self.dim}")
        metadatas = list(metadatas) if metadatas else [{} for _ in ids]
        with self._lock:
            new_rows = []
            for i, record_id in enumerate(ids):
                if record_id in self._id_to_pos:
                    pos = self._id_to_pos[record_id]
                    self._documents[pos] = documents[i]
                    self._metadatas[pos] = metadatas[i]
                    if self._embeddings is not None:
                        self._embeddings[pos] = embeddings[i]
                else:
                    self._id_to_pos[record_id] = len(self._ids)
                    self._ids.append(record_id)
                    self._documents.append(documents[i])
                    self._metadatas.append(metadatas[i])
                    new_rows.append(embeddings[i])
            if new_rows:
                block = np.stack(new_rows)
                self._embeddings = (
                    block if self._embeddings is None
                    else np.concatenate([self._embeddings, block])
                )
            self._version += 1  # any add/overwrite invalidates the device copy
        return len(ids)

    def _device_index(self):
        """Device-resident unit-norm matrix (call under the lock)."""
        if self._device_version != self._version:
            import jax

            norms = np.linalg.norm(self._embeddings, axis=1, keepdims=True)
            unit = (self._embeddings / np.maximum(norms, 1e-8)).astype(
                np.float32)
            self._device_unit = jax.device_put(unit)
            self._device_n = len(self._ids)
            self._device_version = self._version
        return self._device_unit, self._device_n

    # ---- query ---------------------------------------------------------------

    def query(self, query_embeddings: np.ndarray, n_results: int = 5) -> Dict:
        """Top-n cosine matches per query; Chroma-shaped response dict.

        Per-query device work is one query-vector transfer + the fused
        score+top-k launch: the doc matrix lives on-device, normalised,
        between queries (rebuilt only after adds — ``_device_index``).
        """
        import jax
        import jax.numpy as jnp

        from ..ops.topk_score import score_topk

        # scores are computed against a device snapshot taken under the
        # first lock; if an add() OVERWRITES a record between the two
        # critical sections, position i's text would no longer match the
        # embedding that was scored. The version captured with the snapshot
        # detects that and retries; after MAX_RETRIES consecutive bumps
        # (sustained write load) the last result is returned, at most one
        # write-batch stale — documented staleness, never a silent mismatch.
        MAX_RETRIES = 3
        for attempt in range(MAX_RETRIES + 1):
            with self._lock:
                if self._embeddings is None or not len(self._ids):
                    return {"ids": [[]], "documents": [[]], "distances": [[]],
                            "metadatas": [[]]}
                device_unit, n = self._device_index()
                version = self._version

            if isinstance(query_embeddings, jnp.ndarray):
                # already on device (serving fast path): normalise there and
                # do NOT round-trip through host — the final result readback
                # is then the query's only blocking transfer
                queries = jnp.atleast_2d(query_embeddings.astype(jnp.float32))
                q_norm = queries / jnp.maximum(
                    jnp.linalg.norm(queries, axis=1, keepdims=True), 1e-8)
            else:
                host = np.atleast_2d(np.asarray(query_embeddings, np.float32))
                q_norm = jnp.asarray(host / np.maximum(
                    np.linalg.norm(host, axis=1, keepdims=True), 1e-8))
            k = min(n_results, n)
            scores, indices = score_topk(device_unit, q_norm, k, jnp.int32(n))
            # one packed readback instead of two (each blocking transfer
            # costs a full relay round-trip); indices ride as int32 BIT
            # PATTERNS (bitcast), exact at any corpus size — a value cast
            # to f32 silently rounds indices above 2^24
            packed = np.asarray(jnp.concatenate(
                [scores.astype(jnp.float32),
                 jax.lax.bitcast_convert_type(
                     indices.astype(jnp.int32), jnp.float32)], axis=1))
            scores = packed[:, :k]
            indices = packed[:, k:].view(np.int32)
            with self._lock:
                if self._version != version and attempt < MAX_RETRIES:
                    continue  # records moved under us; rescore on fresh state
                # positions < n are append-only stable; index directly under
                # the lock instead of copying the full lists every query
                return {
                    "ids": [[self._ids[int(i)] for i in row] for row in indices],
                    "documents": [[self._documents[int(i)] for i in row]
                                  for row in indices],
                    "metadatas": [[self._metadatas[int(i)] for i in row]
                                  for row in indices],
                    # cosine distance, as chroma reports
                    "distances": [[float(1.0 - s) for s in row]
                                  for row in scores],
                }

    def count(self) -> int:
        return len(self._ids)

    # ---- persistence ---------------------------------------------------------

    def save(self, path: str) -> None:
        out = Path(path)
        out.mkdir(parents=True, exist_ok=True)
        with self._lock:
            np.savez_compressed(out / "embeddings.npz",
                                embeddings=self._embeddings
                                if self._embeddings is not None
                                else np.zeros((0, self.dim or 0), np.float32))
            with open(out / "records.json", "w") as f:
                json.dump({"name": self.name, "dim": self.dim, "ids": self._ids,
                           "documents": self._documents,
                           "metadatas": self._metadatas}, f)

    @classmethod
    def load(cls, path: str) -> "VectorCollection":
        src = Path(path)
        with open(src / "records.json") as f:
            payload = json.load(f)
        collection = cls(payload["name"], payload.get("dim"))
        with np.load(src / "embeddings.npz") as data:
            embeddings = data["embeddings"]
        collection._ids = payload["ids"]
        collection._documents = payload["documents"]
        collection._metadatas = payload["metadatas"]
        collection._id_to_pos = {rid: i for i, rid in enumerate(collection._ids)}
        collection._embeddings = embeddings if len(embeddings) else None
        collection._version += 1  # invalidate any cached device index
        return collection
