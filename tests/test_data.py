"""Unit tests for TripletDataset, batching and synthetic generation."""

import numpy as np
import pandas as pd
import pytest

from twotowers_tpu.data import (
    TripletDataset,
    iterate_batches,
    num_batches,
    pairs_to_triplets,
)
from twotowers_tpu.data.factory.synthetic import (
    expand_synthetic_dataset,
    generate_synthetic_pairs,
    write_triplets_parquet,
)
from twotowers_tpu.tokenizers import CharTokenizer


@pytest.fixture
def triplet_parquet(tmp_path):
    df = pd.DataFrame({
        "q_text": ["query one", "query two", "query three"],
        "d_pos_text": ["positive doc 1", "positive doc 2", "positive doc 3"],
        "d_neg_text": ["negative doc 1", "negative doc 2", "negative doc 3"],
    })
    path = tmp_path / "triplets.parquet"
    df.to_parquet(path)
    return str(path)


@pytest.fixture
def pairs_parquet(tmp_path):
    df = pd.DataFrame({
        "query": ["q1", "q1", "q1", "q2", "q2"],
        "document": ["p1", "p2", "n1", "p3", "n2"],
        "label": [1, 1, 0, 1, 0],
    })
    path = tmp_path / "pairs.parquet"
    df.to_parquet(path)
    return str(path)


class TestPairsToTriplets:
    def test_cartesian_product(self):
        q, p, n = pairs_to_triplets(
            ["a", "a", "a", "a"], ["p1", "p2", "n1", "n2"], [1, 1, 0, 0]
        )
        assert len(q) == 4  # 2 pos x 2 neg
        assert set(zip(p, n)) == {("p1", "n1"), ("p1", "n2"), ("p2", "n1"), ("p2", "n2")}

    def test_queries_without_both_dropped(self):
        q, p, n = pairs_to_triplets(["a", "b"], ["p", "n"], [1, 0])
        assert q == []


class TestTripletDataset:
    def test_triplet_format_loading(self, triplet_parquet):
        ds = TripletDataset(triplet_parquet, CharTokenizer(), max_length=32)
        assert len(ds) == 3
        assert ds.query_texts[0] == "query one"

    def test_alternate_column_names(self, tmp_path):
        df = pd.DataFrame({
            "query": ["q"], "positive_doc": ["p"], "negative_doc": ["n"],
        })
        path = tmp_path / "alt.parquet"
        df.to_parquet(path)
        ds = TripletDataset(str(path), CharTokenizer(), max_length=8)
        assert ds.get_original_texts(0) == ("q", "p", "n")

    def test_pairs_format_converted(self, pairs_parquet):
        ds = TripletDataset(pairs_parquet, CharTokenizer(), max_length=8)
        assert len(ds) == 3  # q1: 2 pos x 1 neg; q2: 1 pos x 1 neg

    def test_tokenizer_fit_when_unfit(self, triplet_parquet):
        tok = CharTokenizer()
        assert not tok.is_fitted
        TripletDataset(triplet_parquet, tok, max_length=8)
        assert tok.is_fitted

    def test_prefit_tokenizer_not_refit(self, triplet_parquet):
        tok = CharTokenizer().fit(["abc"])
        vocab_before = dict(tok.string_to_index)
        TripletDataset(triplet_parquet, tok, max_length=8)
        assert tok.string_to_index == vocab_before

    def test_arrays_static_shape(self, triplet_parquet):
        ds = TripletDataset(triplet_parquet, CharTokenizer(), max_length=16)
        q, p, n = ds.arrays()
        assert q.shape == p.shape == n.shape == (3, 16)
        assert q.dtype == np.int32

    def test_tsv_loading(self, tmp_path):
        df = pd.DataFrame({
            "query": ["q1", "q1"], "document": ["pos", "neg"], "label": [1, 0],
        })
        path = tmp_path / "pairs.tsv"
        df.to_csv(path, sep="\t", index=False)
        ds = TripletDataset(str(path), CharTokenizer(), max_length=8)
        assert len(ds) == 1

    def test_unsupported_format_raises(self, tmp_path):
        path = tmp_path / "data.csv"
        path.write_text("a,b\n1,2\n")
        with pytest.raises(ValueError, match="Unsupported file format"):
            TripletDataset(str(path), CharTokenizer())

    def test_bad_columns_raise(self, tmp_path):
        df = pd.DataFrame({"foo": ["x"], "bar": ["y"]})
        path = tmp_path / "bad.parquet"
        df.to_parquet(path)
        with pytest.raises(ValueError, match="Unsupported dataframe format"):
            TripletDataset(str(path), CharTokenizer())


class TestBatching:
    def _arrays(self, n, seq=6):
        base = np.arange(n * seq, dtype=np.int32).reshape(n, seq) % 50 + 1
        return base, base + 1, base + 2

    def test_fixed_shapes_with_padding(self):
        arrays = self._arrays(10)
        batches = list(iterate_batches(arrays, batch_size=4, shuffle=False))
        assert len(batches) == 3
        for b in batches:
            assert b.queries.shape == (4, 6)
        assert batches[-1].weights.tolist() == [1.0, 1.0, 0.0, 0.0]
        assert batches[-1].num_real == 2

    def test_drop_remainder(self):
        arrays = self._arrays(10)
        batches = list(iterate_batches(arrays, 4, shuffle=False, drop_remainder=True))
        assert len(batches) == 2
        assert num_batches(10, 4, drop_remainder=True) == 2
        assert num_batches(10, 4) == 3

    def test_shuffle_deterministic_by_seed(self):
        arrays = self._arrays(8)
        a = list(iterate_batches(arrays, 4, shuffle=True, seed=7))
        b = list(iterate_batches(arrays, 4, shuffle=True, seed=7))
        c = list(iterate_batches(arrays, 4, shuffle=True, seed=8))
        np.testing.assert_array_equal(a[0].queries, b[0].queries)
        assert not np.array_equal(a[0].queries, c[0].queries)

    def test_all_samples_covered_once(self):
        arrays = self._arrays(9)
        seen = []
        for b in iterate_batches(arrays, 4, shuffle=True, seed=1):
            real = int(b.weights.sum())
            seen.extend(b.queries[:real, 0].tolist())
        assert sorted(seen) == sorted(arrays[0][:, 0].tolist())

    def test_pair_arity_without_negatives(self):
        q, p, _ = self._arrays(5)
        batches = list(iterate_batches((q, p, None), 4, shuffle=False))
        assert batches[0].negatives is None


class TestSynthetic:
    def test_generate_pairs_columns_and_labels(self):
        df = generate_synthetic_pairs(num_pairs=10, negatives_per_query=2, seed=3)
        assert list(df.columns) == ["query", "document", "label"]
        assert (df["label"] == 1).sum() == 10
        assert (df["label"] == 0).sum() == 20

    def test_generation_deterministic_by_seed(self):
        a = generate_synthetic_pairs(5, seed=42)
        b = generate_synthetic_pairs(5, seed=42)
        assert a.equals(b)

    def test_expand_grows_dataset(self):
        df = generate_synthetic_pairs(5, seed=0)
        out = expand_synthetic_dataset(df, additional_pairs=10, seed=1)
        assert len(out) > len(df)

    def test_triplets_parquet_roundtrip(self, tmp_path):
        df = generate_synthetic_pairs(8, seed=0)
        path = write_triplets_parquet(df, str(tmp_path / "t.parquet"))
        ds = TripletDataset(str(path), CharTokenizer(), max_length=32)
        assert len(ds) > 0
