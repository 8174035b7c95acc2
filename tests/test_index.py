"""Unit tests for the retrieval index engines and score+top-k op."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from twotowers_tpu.index import GloVeSearch, MeanVectorSearch, TwoTowerSearch
from twotowers_tpu.models import (
    EmbeddingSpec,
    TowerSpec,
    TwoTowerSpec,
    init_two_tower,
)
from twotowers_tpu.ops.topk_score import score_topk, score_topk_xla
from twotowers_tpu.tokenizers import CharTokenizer

DOCS = [
    "machine learning models need data",
    "deep learning uses neural networks",
    "dogs are loyal animals",
    "cats sleep most of the day",
    "tpus accelerate matrix multiplication",
]


class TestScoreTopK:
    def test_matches_dense_argsort(self, np_rng):
        docs = np_rng.normal(size=(40, 16)).astype(np.float32)
        queries = np_rng.normal(size=(3, 16)).astype(np.float32)
        scores, idx = score_topk_xla(jnp.asarray(docs), jnp.asarray(queries), k=5)
        dense = queries @ docs.T
        for qi in range(3):
            want = np.argsort(-dense[qi])[:5]
            np.testing.assert_array_equal(np.asarray(idx)[qi], want)
            np.testing.assert_allclose(
                np.asarray(scores)[qi], dense[qi][want], rtol=1e-5
            )

    def test_padding_rows_masked(self, np_rng):
        docs = np_rng.normal(size=(8, 4)).astype(np.float32)
        docs[5:] = 100.0  # huge scores in padding rows
        queries = np_rng.normal(size=(2, 4)).astype(np.float32)
        _, idx = score_topk_xla(
            jnp.asarray(docs), jnp.asarray(queries), k=3, n_docs=jnp.int32(5)
        )
        assert np.asarray(idx).max() < 5

    def test_dispatcher_fallback(self, np_rng):
        docs = jnp.asarray(np_rng.normal(size=(8, 4)).astype(np.float32))
        queries = jnp.asarray(np_rng.normal(size=(1, 4)).astype(np.float32))
        s1, i1 = score_topk(docs, queries, k=2, use_pallas=False)
        s2, i2 = score_topk_xla(docs, queries, k=2)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


@pytest.fixture
def trained_like_model(rng):
    tok = CharTokenizer().fit(DOCS + ["query text"])
    spec = TwoTowerSpec(
        embedding=EmbeddingSpec(kind="lookup", vocab_size=tok.vocab_size,
                                embedding_dim=16),
        tower=TowerSpec(arch="mean", embedding_dim=16, hidden_dim=32),
        tied_weights=True,
    )
    params = init_two_tower(rng, spec)
    return params, spec, tok


class TestTwoTowerSearch:
    def test_index_and_search_shapes(self, trained_like_model):
        params, spec, tok = trained_like_model
        search = TwoTowerSearch(params, spec, tok, max_length=32,
                                encode_batch_size=4)
        search.index_documents(DOCS)
        assert search.num_documents == len(DOCS)
        results = search.search("machine learning", top_k=3)
        assert len(results) == 3
        scores = [s for _, s in results]
        assert scores == sorted(scores, reverse=True)

    def test_identical_text_ranks_first(self, trained_like_model):
        params, spec, tok = trained_like_model
        search = TwoTowerSearch(params, spec, tok, max_length=32,
                                encode_batch_size=4)
        search.index_documents(DOCS)
        # tied towers: searching with an indexed doc's text returns it first
        results = search.search(DOCS[2], top_k=1)
        assert results[0][0] == DOCS[2]
        assert results[0][1] == pytest.approx(1.0, abs=1e-4)

    def test_windowed_encode_matches_single_window(self, trained_like_model):
        """r5: the bounded in-flight dispatch window (merge every 64 chunks)
        must be a pure memory optimisation — identical vectors either way."""
        params, spec, tok = trained_like_model
        search = TwoTowerSearch(params, spec, tok, max_length=16,
                                encode_batch_size=2)
        texts = [f"doc number {i}" for i in range(135)]  # 68 chunks > window
        windowed = search._encode_texts(texts, "document")
        big = TwoTowerSearch(params, spec, tok, max_length=16,
                             encode_batch_size=256)
        single = big._encode_texts(texts, "document")
        np.testing.assert_allclose(windowed, single, atol=1e-6)

    def test_top_k_clamped_to_corpus(self, trained_like_model):
        params, spec, tok = trained_like_model
        search = TwoTowerSearch(params, spec, tok, max_length=16)
        search.index_documents(DOCS[:2])
        assert len(search.search("x", top_k=10)) == 2

    def test_batch_search_matches_single(self, trained_like_model):
        params, spec, tok = trained_like_model
        search = TwoTowerSearch(params, spec, tok, max_length=32,
                                encode_batch_size=4)
        search.index_documents(DOCS)
        batch = search.search_batch(["dogs", "tpus"], top_k=2)
        assert batch[0] == search.search("dogs", top_k=2)
        assert batch[1] == search.search("tpus", top_k=2)

    def test_save_load_roundtrip(self, trained_like_model, tmp_path):
        params, spec, tok = trained_like_model
        search = TwoTowerSearch(params, spec, tok, max_length=32,
                                encode_batch_size=4)
        search.index_documents(DOCS)
        before = search.search("neural networks", top_k=3)
        search.save_index(str(tmp_path / "idx"))

        fresh = TwoTowerSearch(params, spec, tok, max_length=32,
                               encode_batch_size=4)
        fresh.load_index(str(tmp_path / "idx"))
        assert fresh.num_documents == len(DOCS)
        assert fresh.search("neural networks", top_k=3) == before

    def test_search_without_index_raises(self, trained_like_model):
        params, spec, tok = trained_like_model
        search = TwoTowerSearch(params, spec, tok)
        with pytest.raises(RuntimeError, match="No index"):
            search.search("anything")


class TestMeanVectorSearch:
    @pytest.fixture
    def vectors(self, np_rng):
        # sorted: set order depends on PYTHONHASHSEED, which would make the
        # word->vector assignment (and rankings) vary across processes
        words = sorted(set(w for d in DOCS for w in d.lower().split()))
        return {w: np_rng.normal(size=8).astype(np.float32) for w in words}

    def test_index_shapes_and_ranking(self, vectors):
        search = MeanVectorSearch(vectors)
        search.index_documents(DOCS)
        results = search.search("machine learning data", top_k=5)
        assert len(results) == 5
        # the doc sharing most words should rank first
        assert results[0][0] == DOCS[0]

    def test_unknown_words_zero_vector(self, vectors):
        search = MeanVectorSearch(vectors)
        vec = search.encode(["zzz qqq www"])
        np.testing.assert_allclose(vec, 0.0)

    def test_save_load_roundtrip(self, vectors, tmp_path):
        search = MeanVectorSearch(vectors)
        search.index_documents(DOCS)
        before = search.search("dogs animals", top_k=2)
        search.save_index(str(tmp_path / "g"))
        fresh = MeanVectorSearch(vectors)
        fresh.load_index(str(tmp_path / "g"))
        assert fresh.search("dogs animals", top_k=2) == before

    def test_glove_fallback_runs_offline(self):
        # gensim is absent in this environment: hashed fallback must engage
        search = GloVeSearch(model_name="glove-twitter-25", dim=16)
        search.index_documents(DOCS)
        results = search.search("dogs are loyal", top_k=2)
        assert len(results) == 2
        assert results[0][0] == DOCS[2]  # word overlap dominates hashed vectors
