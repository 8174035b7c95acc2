"""FastAPI inference service: /embed, /search, /add, /health.

Capability parity with /root/reference/inference/docker/app.py:27-309 —
model acquisition at startup (local checkpoint path or HF Hub repo), the
same four endpoints and response shapes, defensive embedding-shape
normalisation, and soft-fail startup. The vector backend is the in-process
``VectorCollection`` (Chroma's role in the reference's compose stack);
set ``CHROMA_HOST`` to use a real ChromaDB server instead when available.

Environment:
    MODEL_CHECKPOINT  local checkpoint dir (preferred, offline)
    MODEL_REPO_URL    HF Hub repo id (fallback, needs network)
    PORT              bind port (default 8080)
    CHROMA_HOST/PORT  optional external ChromaDB

Run:  python -m twotowers_tpu.serve.app
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional

import numpy as np

from ..utils.logging import get_logger, setup_logging
from .service import RetrievalService, ServiceError

logger = get_logger("serve.app")

try:  # gated optional dependency
    from fastapi import FastAPI, HTTPException
    from pydantic import BaseModel

    HAVE_FASTAPI = True
except Exception:  # pragma: no cover - depends on environment
    HAVE_FASTAPI = False


class ModelRuntime:
    """Loaded two-tower model + tokenizer with a batch encode API."""

    def __init__(self, checkpoint_path: str, batch_size: int = 32):
        from ..index.two_tower import TwoTowerSearch
        from ..train.checkpoint import load_trained_model

        params, spec, tokenizer, config = load_trained_model(checkpoint_path)
        tok_cfg = config.get("tokeniser", config.get("tokenizer", {})) or {}
        max_length = int(tok_cfg.get("max_len", config.get("max_sequence_length", 64)))
        self._search = TwoTowerSearch(
            params, spec, tokenizer, max_length=max_length,
            encode_batch_size=batch_size,
        )
        self.output_dim = spec.output_dim

    def encode(self, texts: List[str], tower: str = "query") -> np.ndarray:
        """(N, D) float32 unit vectors; always 2-D, even for one text
        (the shape normalisation the reference does defensively)."""
        vectors = self._search._encode_texts(texts, tower)
        return np.atleast_2d(np.asarray(vectors, np.float32))

    def encode_device(self, texts: List[str], tower: str = "query"):
        """Device-resident encode for callers that chain another device op
        (RetrievalService.search): no blocking host readback here."""
        return self._search._encode_texts_device(texts, tower)


def _load_runtime() -> Optional[ModelRuntime]:
    checkpoint = os.environ.get("MODEL_CHECKPOINT")
    if checkpoint and os.path.exists(checkpoint):
        logger.info("Loading model from local checkpoint %s", checkpoint)
        return ModelRuntime(checkpoint)
    repo = os.environ.get("MODEL_REPO_URL")
    if repo:
        try:
            from ..hub.huggingface import load_model_from_hub

            logger.info("Downloading model from the Hub: %s", repo)
            return ModelRuntime(load_model_from_hub(repo))
        except Exception as exc:
            logger.error("Hub model load failed: %s", exc)
    logger.warning("No model available (set MODEL_CHECKPOINT or MODEL_REPO_URL)")
    return None


def create_app():
    """Build the FastAPI app (import-time gated)."""
    if not HAVE_FASTAPI:  # pragma: no cover
        raise RuntimeError(
            "fastapi is not installed; `pip install fastapi uvicorn` to serve"
        )

    from .chroma import collection_from_env

    app = FastAPI(title="two-tower retrieval service")
    # CHROMA_HOST set -> ChromaDB sidecar (the reference's backend, soft-
    # failing back to in-process); else the device-resident store
    service = RetrievalService(model=None,
                               collection=collection_from_env("documents"))

    class EmbedRequest(BaseModel):
        texts: List[str]

    class SearchRequest(BaseModel):
        query: str
        top_k: int = 5

    class AddRequest(BaseModel):
        documents: List[str]
        ids: Optional[List[str]] = None
        metadatas: Optional[List[Dict[str, Any]]] = None

    def run(handler, *args, **kwargs):
        try:
            return handler(*args, **kwargs)
        except ServiceError as exc:
            raise HTTPException(exc.status, exc.detail)

    @app.on_event("startup")
    def startup() -> None:
        service.model = _load_runtime()

    @app.get("/health")
    def health():
        return service.health()

    @app.post("/embed")
    def embed(request: EmbedRequest):
        return run(service.embed, request.texts)

    @app.post("/add")
    def add(request: AddRequest):
        return run(service.add, request.documents, request.ids,
                   request.metadatas)

    @app.get("/")
    def root():
        from pathlib import Path

        from fastapi.responses import HTMLResponse

        index = Path(__file__).parent / "static" / "index.html"
        return HTMLResponse(index.read_text())

    @app.post("/search")
    def search(request: SearchRequest):
        return run(service.search, request.query, request.top_k)

    return app


def main() -> int:  # pragma: no cover - needs uvicorn
    setup_logging()
    try:
        import uvicorn
    except Exception as exc:
        raise RuntimeError(f"uvicorn is not installed: {exc}")
    uvicorn.run(create_app(), host="0.0.0.0", port=int(os.environ.get("PORT", 8080)))
    return 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
