"""Route-level tests of the serving surface (VERDICT r2 item 8).

The four routes of the reference's inference service
(/root/reference/inference/docker/app.py:184-306 — /embed, /search, /add,
/health) are implemented transport-independently in ``serve/service.py``;
these tests exercise the route handlers against a real tiny checkpoint so
status codes and response shapes are covered even though this image lacks
fastapi. When fastapi IS available, the TestClient class below runs the
same checks through the actual HTTP layer.
"""

import json

import numpy as np
import pytest

from twotowers_tpu.models import (
    EmbeddingSpec, TowerSpec, TwoTowerSpec, init_two_tower)
from twotowers_tpu.serve.service import RetrievalService, ServiceError
from twotowers_tpu.serve.store import VectorCollection
from twotowers_tpu.tokenizers import build_tokenizer
from twotowers_tpu.train.checkpoint import save_checkpoint
from twotowers_tpu.train.optim import build_optimizer

import jax

TEXTS = ["the cat sat on the mat", "dogs chase cats", "paris is in france",
         "the capital of france", "machine learning on tpus"]


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    """A tiny real checkpoint the service can load (char model)."""
    root = tmp_path_factory.mktemp("serve_ckpt")
    config = {
        "tokeniser": {"type": "char", "max_len": 32},
        "embedding": {"type": "lookup", "embedding_dim": 16},
        "encoder": {"arch": "mean", "hidden_dim": 16, "tied_weights": True},
        "optimizer": {"type": "adamw", "lr": 1e-3},
    }
    tokenizer = build_tokenizer("char").fit(TEXTS)
    spec = TwoTowerSpec(
        embedding=EmbeddingSpec(kind="lookup", vocab_size=tokenizer.vocab_size,
                                embedding_dim=16),
        tower=TowerSpec(arch="mean", embedding_dim=16, hidden_dim=16),
        tied_weights=True,
    )
    params = init_two_tower(jax.random.PRNGKey(0), spec)
    optimizer = build_optimizer(config)
    path = save_checkpoint(
        {"params": params, "opt_state": optimizer.init(params)},
        str(root), tokenizer_state=tokenizer.state_dict(), config=config,
        epoch=1, loss=0.5, save_best=False)
    return path


@pytest.fixture(scope="module")
def service(checkpoint):
    from twotowers_tpu.serve.app import ModelRuntime

    return RetrievalService(model=ModelRuntime(checkpoint),
                            collection=VectorCollection("documents"))


class TestRoutes:
    """Response shapes mirror the reference service exactly."""

    def test_health_ok(self, service):
        out = service.health()
        assert out["status"] == "ok"
        assert out["model_loaded"] is True
        assert isinstance(out["documents"], int)

    def test_embed_shape_and_unit_norm(self, service):
        out = service.embed(["hello world", "two towers"])
        emb = np.asarray(out["embeddings"])
        assert emb.shape == (2, 16)
        np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, rtol=1e-4)

    def test_embed_single_text_still_2d(self, service):
        emb = np.asarray(service.embed(["one"])["embeddings"])
        assert emb.ndim == 2 and emb.shape[0] == 1

    def test_add_then_search(self, service):
        out = service.add(TEXTS, ids=[f"d{i}" for i in range(len(TEXTS))])
        assert out["added"] == len(TEXTS)
        assert out["total"] >= len(TEXTS)

        result = service.search("cat on a mat", top_k=3)
        assert result["query"] == "cat on a mat"
        assert len(result["results"]) == 3
        top = result["results"][0]
        assert set(top) == {"id", "document", "distance", "metadata"}
        # a trained model isn't needed for shape checks, but the char model
        # should still put a cat-ish doc in the top results
        docs = [r["document"] for r in result["results"]]
        assert any("cat" in d for d in docs)

    def test_add_generates_ids(self, service):
        out = service.add(["auto id doc"])
        assert out["added"] == 1

    def test_add_id_length_mismatch_422(self, service):
        with pytest.raises(ServiceError) as exc:
            service.add(["a", "b"], ids=["only_one"])
        assert exc.value.status == 422

    def test_empty_texts_422(self, service):
        with pytest.raises(ServiceError) as exc:
            service.embed([])
        assert exc.value.status == 422

    def test_degraded_mode_503(self):
        svc = RetrievalService(model=None)
        assert svc.health()["status"] == "degraded"
        for call in (lambda: svc.embed(["x"]),
                     lambda: svc.add(["x"]),
                     lambda: svc.search("x")):
            with pytest.raises(ServiceError) as exc:
                call()
            assert exc.value.status == 503


class TestHTTPLayer:
    """Same checks through the real FastAPI app when fastapi is installed."""

    def test_routes_over_http(self, checkpoint, monkeypatch):
        fastapi = pytest.importorskip("fastapi")
        from fastapi.testclient import TestClient

        from twotowers_tpu.serve.app import create_app

        monkeypatch.setenv("MODEL_CHECKPOINT", checkpoint)
        with TestClient(create_app()) as client:
            health = client.get("/health").json()
            assert health["model_loaded"] is True

            r = client.post("/embed", json={"texts": ["hello"]})
            assert r.status_code == 200
            assert np.asarray(r.json()["embeddings"]).shape == (1, 16)

            r = client.post("/add", json={"documents": TEXTS})
            assert r.status_code == 200 and r.json()["added"] == len(TEXTS)

            r = client.post("/search", json={"query": "cat", "top_k": 2})
            assert r.status_code == 200
            assert len(r.json()["results"]) == 2

            r = client.post("/embed", json={"texts": []})
            assert r.status_code == 422
