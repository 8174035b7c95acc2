"""Sharded index property tests: sharded top-k == single-shard top-k."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from twotowers_tpu.index import ShardedDocIndex, ShardedTwoTowerSearch, TwoTowerSearch
from twotowers_tpu.models import EmbeddingSpec, TowerSpec, TwoTowerSpec, init_two_tower
from twotowers_tpu.parallel import make_mesh
from twotowers_tpu.tokenizers import CharTokenizer


class TestShardedDocIndex:
    @pytest.mark.parametrize("num_shards", [1, 2, 4])
    def test_matches_dense_argsort(self, np_rng, num_shards):
        mesh = make_mesh(data=1, model=num_shards)
        docs = np_rng.normal(size=(1000, 32)).astype(np.float32)
        queries = np_rng.normal(size=(7, 32)).astype(np.float32)

        index = ShardedDocIndex(mesh)
        index.build(docs)
        scores, idx = index.search_vectors(queries, k=9)

        dense = queries @ docs.T
        for qi in range(7):
            want = np.argsort(-dense[qi], kind="stable")[:9]
            np.testing.assert_array_equal(idx[qi], want)
            np.testing.assert_allclose(scores[qi], dense[qi][want], rtol=1e-4)

    def test_k_clamped_to_corpus(self, np_rng):
        mesh = make_mesh(data=1, model=2)
        index = ShardedDocIndex(mesh)
        index.build(np_rng.normal(size=(5, 8)).astype(np.float32))
        scores, idx = index.search_vectors(
            np_rng.normal(size=(1, 8)).astype(np.float32), k=50
        )
        assert idx.shape == (1, 5)

    def test_padding_rows_never_returned(self, np_rng):
        mesh = make_mesh(data=1, model=4)
        n = 300  # pads to 512 across 4 shards; shard 3 has few real rows
        index = ShardedDocIndex(mesh)
        index.build(np_rng.normal(size=(n, 16)).astype(np.float32))
        _, idx = index.search_vectors(
            np_rng.normal(size=(4, 16)).astype(np.float32), k=20
        )
        assert idx.max() < n

    @pytest.mark.parametrize("num_shards", [1, 4])
    def test_to_host_roundtrip(self, np_rng, num_shards):
        # uneven count: 3 shards carry real rows, the padding tail is dropped
        mesh = make_mesh(data=2, model=num_shards)
        docs = np_rng.normal(size=(301, 16)).astype(np.float32)
        index = ShardedDocIndex(mesh)
        index.build(docs)
        np.testing.assert_array_equal(index.to_host(), docs)

    def test_to_host_before_build_raises(self):
        with pytest.raises(RuntimeError, match="not built"):
            ShardedDocIndex(make_mesh(data=1, model=2)).to_host()

    def test_search_before_build_raises(self):
        mesh = make_mesh(data=1, model=2)
        with pytest.raises(RuntimeError, match="not built"):
            ShardedDocIndex(mesh).search_vectors(np.ones((1, 8), np.float32), 3)


class TestShardedTwoTowerSearch:
    @pytest.fixture
    def model(self, rng):
        docs = [f"document number {i} about topic {i % 7}" for i in range(40)]
        tok = CharTokenizer().fit(docs)
        spec = TwoTowerSpec(
            embedding=EmbeddingSpec(kind="lookup", vocab_size=tok.vocab_size,
                                    embedding_dim=16),
            tower=TowerSpec(arch="mean", embedding_dim=16, hidden_dim=32),
            tied_weights=True,
        )
        return init_two_tower(rng, spec), spec, tok, docs

    def test_matches_unsharded_engine(self, model):
        params, spec, tok, docs = model
        mesh = make_mesh(data=1, model=4)

        sharded = ShardedTwoTowerSearch(params, spec, tok, mesh,
                                        max_length=32, encode_batch_size=8)
        sharded.index_documents(docs)
        single = TwoTowerSearch(params, spec, tok, max_length=32,
                                encode_batch_size=8)
        single.index_documents(docs)

        for query in ("document number 3", "topic 5", "completely new text"):
            a = sharded.search(query, top_k=5)
            b = single.search(query, top_k=5)
            assert [d for d, _ in a] == [d for d, _ in b]
            np.testing.assert_allclose([s for _, s in a], [s for _, s in b],
                                       rtol=1e-4)

    def test_save_load_roundtrip(self, model, tmp_path):
        params, spec, tok, docs = model
        mesh = make_mesh(data=1, model=2)
        sharded = ShardedTwoTowerSearch(params, spec, tok, mesh,
                                        max_length=32, encode_batch_size=8)
        sharded.index_documents(docs)
        before = sharded.search("document number 7", top_k=3)
        sharded.save_index(str(tmp_path / "idx"))

        fresh = ShardedTwoTowerSearch(params, spec, tok, mesh,
                                      max_length=32, encode_batch_size=8)
        fresh.load_index(str(tmp_path / "idx"))
        assert fresh.search("document number 7", top_k=3) == before
