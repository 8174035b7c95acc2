"""Serving layer: in-process vector store + FastAPI service (gated)."""

from .store import VectorCollection

__all__ = ["VectorCollection"]
