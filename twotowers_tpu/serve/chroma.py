"""ChromaDB-backed collection: the reference's vector backend, adapted.

The reference's inference service stores vectors in a ChromaDB sidecar
container (/root/reference/inference/docker/app.py:159-306,
docker-compose.yml). This adapter exposes a Chroma HTTP collection behind
the same interface as the in-process ``VectorCollection``
(add/query/count), so ``RetrievalService`` can run against either backend
unchanged — select it with ``CHROMA_HOST`` (serve/app.py), matching the
reference's env contract.

Trade-off made explicit: the in-process store keeps the document matrix
device-resident and scores with the fused on-TPU top-k (one blocking
round-trip per /search — SERVE_BENCH.json); Chroma scores server-side on
CPU. Use this adapter when operational requirements (shared store across
replicas, persistence outside the process) outweigh the latency edge.

``chromadb`` is not bundled in this image; the import is gated and
connection failures soft-fail at the call site (serve/app.py falls back to
the in-process store, mirroring the reference's soft-fail at app.py:167-169).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from ..utils.logging import get_logger

logger = get_logger("serve.chroma")


class ChromaCollection:
    """VectorCollection-compatible adapter over a ChromaDB HTTP collection."""

    def __init__(self, name: str, host: str = "localhost", port: int = 8000,
                 dim: Optional[int] = None, client=None):
        if client is None:
            import chromadb  # gated; caller handles ImportError

            client = chromadb.HttpClient(host=host, port=int(port))
        self.name = name
        self.dim = dim
        self._client = client
        self._collection = client.get_or_create_collection(
            name=name, metadata={"hnsw:space": "cosine"}
        )

    # ---- VectorCollection interface -----------------------------------------

    def add(
        self,
        ids: Sequence[str],
        embeddings: np.ndarray,
        documents: Sequence[str],
        metadatas: Optional[Sequence[Dict]] = None,
    ) -> int:
        embeddings = np.asarray(embeddings, dtype=np.float32)
        if embeddings.ndim != 2 or len(ids) != len(embeddings) \
                or len(ids) != len(documents):
            raise ValueError("ids/embeddings/documents must align; embeddings 2-D")
        if self.dim is None:
            self.dim = int(embeddings.shape[1])
        if embeddings.shape[1] != self.dim:
            raise ValueError(f"dim mismatch: {embeddings.shape[1]} != {self.dim}")
        # upsert == the in-process store's insert-or-overwrite-by-id semantics
        self._collection.upsert(
            ids=list(ids),
            embeddings=embeddings.tolist(),
            documents=list(documents),
            metadatas=list(metadatas) if metadatas else [{} for _ in ids],
        )
        return len(ids)

    def query(self, query_embeddings, n_results: int = 5) -> Dict:
        if self.count() == 0:
            return {"ids": [[]], "documents": [[]], "distances": [[]],
                    "metadatas": [[]]}
        # the service may hand us a device array (its fast path for the
        # on-TPU store); Chroma needs host floats — one readback here
        host = np.atleast_2d(np.asarray(query_embeddings, np.float32))
        out = self._collection.query(
            query_embeddings=host.tolist(),
            n_results=n_results,
            include=["documents", "distances", "metadatas"],
        )
        # normalise: chroma may omit metadatas (None) in minimal servers
        if out.get("metadatas") is None:
            out["metadatas"] = [[{} for _ in row] for row in out["ids"]]
        return out

    def count(self) -> int:
        return int(self._collection.count())

    # ---- persistence: server-side in Chroma ---------------------------------

    def save(self, path: str) -> None:  # interface parity; state lives server-side
        logger.info("ChromaCollection.save is a no-op (server persists %r)",
                    self.name)

    @classmethod
    def load(cls, path: str) -> "ChromaCollection":
        raise NotImplementedError(
            "Chroma collections persist server-side; reconnect with "
            "ChromaCollection(name, host, port) instead of load()"
        )


def collection_from_env(name: str = "documents"):
    """The reference's backend-selection contract: CHROMA_HOST set → Chroma
    (soft-failing back to in-process on any error), else the in-process
    device-resident store."""
    import os

    from .store import VectorCollection

    host = os.environ.get("CHROMA_HOST")
    if host:
        port = int(os.environ.get("CHROMA_PORT", 8000))
        try:
            collection = ChromaCollection(name, host=host, port=port)
            logger.info("Using ChromaDB collection %r at %s:%d", name, host, port)
            return collection
        except Exception as exc:
            logger.error(
                "Chroma connect failed (%s); falling back to the in-process "
                "store", exc)
    return VectorCollection(name)
