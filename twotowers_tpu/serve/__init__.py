"""Serving layer: in-process vector store + FastAPI service (gated)."""

from .chroma import ChromaCollection, collection_from_env
from .store import VectorCollection

__all__ = ["ChromaCollection", "VectorCollection", "collection_from_env"]
