"""Tests for the BPE and WordPiece tokenizers — the subword surface the
reference's config docs advertise (/root/reference/artifacts/docs/
config.md:65) but never implement."""

import numpy as np
import pytest

from twotowers_tpu.tokenizers import (
    BPETokenizer,
    WordPieceTokenizer,
    build_tokenizer,
    tokenizer_from_state,
)
from twotowers_tpu.tokenizers.subword import learn_bpe_merges

CORPUS = [
    "machine learning models learn representations from data",
    "deep learning is representation learning with neural networks",
    "the quick brown fox jumps over the lazy dog",
    "representation learning learns useful features from data",
    "neural networks process data in parallel on accelerators",
] * 3


@pytest.fixture(params=["bpe", "wordpiece"])
def fitted(request):
    return build_tokenizer(request.param, num_merges=60).fit(CORPUS)


class TestSubwordCommon:
    def test_registry_build(self):
        assert isinstance(build_tokenizer("bpe"), BPETokenizer)
        assert isinstance(build_tokenizer("wordpiece"), WordPieceTokenizer)

    def test_pad_unk_reserved(self, fitted):
        assert fitted.PAD == 0 and fitted.UNK == 1
        assert fitted.token_to_id["<PAD>"] == 0
        assert fitted.token_to_id["<UNK>"] == 1

    def test_encode_decode_roundtrip(self, fitted):
        text = "representation learning with neural networks"
        assert fitted.decode(fitted.encode(text)) == text

    def test_batch_output_static_shape(self, fitted):
        batch = fitted(["machine learning", "neural networks on data"], max_len=16)
        assert batch.shape == (2, 16)
        assert batch.dtype == np.int32
        assert np.all(batch >= 0)

    def test_truncation(self, fitted):
        long_text = " ".join(["representation"] * 50)
        batch = fitted([long_text], max_len=8)
        assert batch.shape == (1, 8)
        assert np.all(batch[0] != 0)  # fully used, no pad

    def test_state_dict_roundtrip(self, fitted):
        clone = tokenizer_from_state(fitted.state_dict())
        text = "deep learning models process data"
        assert clone.encode(text) == fitted.encode(text)
        assert clone.vocab_size == fitted.vocab_size

    def test_save_load_file(self, fitted, tmp_path):
        path = tmp_path / "tok.json"
        fitted.save(str(path))
        clone = type(fitted).load(str(path))
        assert clone.encode("neural networks") == fitted.encode("neural networks")

    def test_fit_deterministic_across_corpus_order(self):
        """Same corpus in a different order must give the identical vocab
        (multi-host determinism, SURVEY.md §7.3)."""
        kind = "bpe"
        a = build_tokenizer(kind, num_merges=40).fit(CORPUS)
        b = build_tokenizer(kind, num_merges=40).fit(list(reversed(CORPUS)))
        assert a.token_to_id == b.token_to_id
        w = build_tokenizer("wordpiece", num_merges=40).fit(CORPUS)
        x = build_tokenizer("wordpiece", num_merges=40).fit(list(reversed(CORPUS)))
        assert w.token_to_id == x.token_to_id

    def test_is_fitted(self):
        tok = build_tokenizer("bpe")
        assert not tok.is_fitted
        assert tok.fit(CORPUS).is_fitted


class TestBPE:
    def test_merges_reduce_token_count(self):
        few = BPETokenizer(num_merges=0).fit(CORPUS)
        many = BPETokenizer(num_merges=100).fit(CORPUS)
        text = "representation learning"
        assert len(many.encode(text)) < len(few.encode(text))

    def test_frequent_word_becomes_single_token(self):
        tok = BPETokenizer(num_merges=200).fit(CORPUS)
        ids = tok.encode("learning")
        assert len(ids) == 1  # highest-frequency word fully merged

    def test_unseen_chars_fall_back_to_unk(self):
        tok = BPETokenizer(num_merges=30).fit(CORPUS)
        ids = tok.encode("éé")
        assert tok.UNK in ids

    def test_learn_bpe_merges_ordered_and_deterministic(self):
        from collections import Counter

        counts = Counter({"aab": 10, "aac": 5, "abc": 2})
        merges = learn_bpe_merges(counts, 3)
        assert merges == sorted(set(merges), key=merges.index)  # no dupes
        again = learn_bpe_merges(Counter(counts), 3)
        assert merges == again
        assert merges[0] == ("a", "a")  # most frequent pair first

    def test_max_vocab_size_caps(self):
        tok = BPETokenizer(num_merges=500, max_vocab_size=30).fit(CORPUS)
        assert tok.vocab_size <= 30


class TestWordPiece:
    def test_greedy_longest_match(self):
        tok = WordPieceTokenizer(num_merges=200).fit(CORPUS)
        # "learning" is frequent enough to be one word-start piece
        assert len(tok.encode("learning")) == 1

    def test_continuation_pieces_prefixes(self):
        tok = WordPieceTokenizer(num_merges=10).fit(CORPUS)
        has_continuation = any(
            t.startswith("##") for t in tok.token_to_id if t not in ("<PAD>", "<UNK>")
        )
        assert has_continuation

    def test_unmatchable_word_is_single_unk(self):
        tok = WordPieceTokenizer(num_merges=30).fit(CORPUS)
        assert tok.encode("ééé") == [tok.UNK]

    def test_decode_joins_continuations(self):
        tok = WordPieceTokenizer(num_merges=60).fit(CORPUS)
        text = "neural networks"
        assert tok.decode(tok.encode(text)) == text

    def test_very_long_word_guard(self):
        tok = WordPieceTokenizer(num_merges=30, max_word_chars=8).fit(CORPUS)
        assert tok.encode("a" * 100) == [tok.UNK]


class TestSubwordInPipeline:
    def test_subword_tokenizer_trains_a_model(self, np_rng):
        """End-to-end: BPE tokenizer -> two-tower forward/loss."""
        import jax
        import jax.numpy as jnp

        from twotowers_tpu.models import (
            build_loss,
            forward,
            init_two_tower,
            spec_from_config,
        )

        tok = build_tokenizer("bpe", num_merges=40).fit(CORPUS)
        ids = jnp.asarray(tok(CORPUS[:4], max_len=24))
        spec = spec_from_config(
            {"encoder": {"tied_weights": True}}, tok.vocab_size
        )
        params = init_two_tower(jax.random.PRNGKey(0), spec)
        q, d, n = forward(params, spec, ids, ids, ids)
        loss, _ = build_loss("triplet").fn(q, d, n)
        assert np.isfinite(float(loss))
