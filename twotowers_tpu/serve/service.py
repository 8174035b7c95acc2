"""Framework-agnostic serving core: the four routes as plain methods.

The HTTP surface (/embed, /search, /add, /health) of the reference's
inference service (/root/reference/inference/docker/app.py:184-306) as a
transport-independent class: ``serve/app.py``'s FastAPI layer is a thin
adapter over this, and the route logic — status codes, response shapes,
id generation, degraded-mode behaviour — is testable without fastapi
installed (this image does not ship it).
"""

from __future__ import annotations

import time
from typing import Any, Dict, List, Optional

from .store import VectorCollection


class ServiceError(Exception):
    """Route-level error with an HTTP status (maps to HTTPException)."""

    def __init__(self, status: int, detail: str):
        super().__init__(detail)
        self.status = status
        self.detail = detail


class RetrievalService:
    """State + route handlers shared by every transport layer."""

    def __init__(self, model=None,
                 collection: Optional[VectorCollection] = None):
        self.model = model  # ModelRuntime or None (degraded mode)
        self.collection = collection or VectorCollection("documents")

    def _require_model(self):
        if self.model is None:
            raise ServiceError(503, "model not loaded")
        return self.model

    def health(self) -> Dict[str, Any]:
        return {
            "status": "ok" if self.model else "degraded",
            "model_loaded": self.model is not None,
            "documents": self.collection.count(),
        }

    def embed(self, texts: List[str]) -> Dict[str, Any]:
        model = self._require_model()
        if not texts:
            raise ServiceError(422, "texts must be non-empty")
        vectors = model.encode(texts, "query")
        return {"embeddings": vectors.tolist()}

    def add(self, documents: List[str], ids: Optional[List[str]] = None,
            metadatas: Optional[List[Dict[str, Any]]] = None) -> Dict[str, Any]:
        model = self._require_model()
        if not documents:
            raise ServiceError(422, "documents must be non-empty")
        if ids is not None and len(ids) != len(documents):
            raise ServiceError(422, "ids and documents length mismatch")
        ids = ids or [
            f"doc_{int(time.time() * 1000)}_{i}" for i in range(len(documents))
        ]
        vectors = model.encode(documents, "document")
        added = self.collection.add(ids, vectors, documents, metadatas)
        return {"added": added, "total": self.collection.count()}

    def search(self, query: str, top_k: int = 5) -> Dict[str, Any]:
        model = self._require_model()
        # prefer the device-resident encode: the store consumes the vector
        # without a host round-trip, so the search result is the query's
        # only blocking device transfer
        if hasattr(model, "encode_device"):
            query_vec = model.encode_device([query], "query")
        else:
            query_vec = model.encode([query], "query")
        result = self.collection.query(query_vec, n_results=top_k)
        return {
            "query": query,
            "results": [
                {"id": i, "document": d, "distance": dist, "metadata": m}
                for i, d, dist, m in zip(
                    result["ids"][0], result["documents"][0],
                    result["distances"][0], result["metadatas"][0],
                )
            ],
        }
