"""Unit tests for char/word tokenizers (parity with reference semantics)."""

import numpy as np
import pytest

from twotowers_tpu.tokenizers import (
    CharTokenizer,
    WordTokenizer,
    build_tokenizer,
    tokenizer_from_state,
)

CORPUS = ["hello world", "hello there", "TPU towers!", "42 is the answer"]


class TestCharTokenizer:
    def test_fit_builds_sorted_vocab_with_pad_zero(self):
        tok = CharTokenizer().fit(["bca"])
        # sorted unique chars -> a=1, b=2, c=3; PAD=0 reserved
        assert tok.string_to_index == {"a": 1, "b": 2, "c": 3}
        assert tok.vocab_size == 4  # includes padding id

    def test_encode_decode_roundtrip(self):
        tok = CharTokenizer().fit(CORPUS)
        ids = tok.encode("hello")
        assert tok.decode(ids) == "hello"

    def test_unknown_chars_encode_to_zero(self):
        tok = CharTokenizer().fit(["abc"])
        assert tok.encode("axz") == [1, 0, 0]

    def test_truncate_and_pad(self):
        tok = CharTokenizer().fit(CORPUS)
        assert tok.truncate_and_pad([5, 6], 4) == [5, 6, 0, 0]
        assert tok.truncate_and_pad([5, 6, 7, 8, 9], 4) == [5, 6, 7, 8]

    def test_encode_batch_static_shape(self):
        tok = CharTokenizer().fit(CORPUS)
        batch = tok.encode_batch(CORPUS, max_len=16)
        assert batch.shape == (4, 16)
        assert batch.dtype == np.int32
        # per-row contents match scalar path
        for i, text in enumerate(CORPUS):
            expected = tok.truncate_and_pad(tok.encode(text), 16)
            assert batch[i].tolist() == expected

    def test_state_roundtrip(self, tmp_path):
        tok = CharTokenizer().fit(CORPUS)
        path = tmp_path / "tok.json"
        tok.save(str(path))
        restored = CharTokenizer.load(str(path))
        assert restored.string_to_index == tok.string_to_index
        assert restored.encode("hello") == tok.encode("hello")

    def test_determinism_across_corpus_order(self):
        a = CharTokenizer().fit(CORPUS)
        b = CharTokenizer().fit(list(reversed(CORPUS)))
        assert a.string_to_index == b.string_to_index


class TestWordTokenizer:
    def test_special_tokens(self):
        tok = WordTokenizer().fit(CORPUS)
        assert tok.word_to_index["<PAD>"] == 0
        assert tok.word_to_index["<UNK>"] == 1

    def test_frequency_sorted_vocab(self):
        tok = WordTokenizer().fit(["dog dog dog cat cat bird"])
        assert tok.word_to_index["dog"] == 2
        assert tok.word_to_index["cat"] == 3
        assert tok.word_to_index["bird"] == 4

    def test_tie_break_alphabetical_deterministic(self):
        a = WordTokenizer().fit(["zebra apple", "apple zebra"])
        b = WordTokenizer().fit(["apple zebra", "zebra apple"])
        assert a.word_to_index == b.word_to_index
        assert a.word_to_index["apple"] < a.word_to_index["zebra"]

    def test_lowercase_and_punctuation(self):
        tok = WordTokenizer(lowercase=True, strip_punctuation=True).fit(["Hello, World!"])
        assert "hello" in tok.word_to_index
        assert "," not in tok.word_to_index

    def test_unknown_words_to_unk(self):
        tok = WordTokenizer().fit(["known words here"])
        ids = tok.encode("unknown token")
        assert ids == [tok.UNK, tok.UNK]

    def test_decode_skips_pad(self):
        tok = WordTokenizer().fit(["alpha beta"])
        ids = tok.truncate_and_pad(tok.encode("alpha beta"), 6)
        assert tok.decode(ids) == "alpha beta"

    def test_state_roundtrip(self, tmp_path):
        tok = WordTokenizer(max_len=10).fit(CORPUS)
        path = tmp_path / "tok.json"
        tok.save(str(path))
        restored = WordTokenizer.load(str(path))
        assert restored.word_to_index == tok.word_to_index
        assert restored.max_len == 10

    def test_max_vocab_size(self):
        tok = WordTokenizer(max_vocab_size=4).fit(["a a b b c d e"])
        assert tok.vocab_size == 4  # PAD, UNK + top-2 words


class TestRegistry:
    def test_build_by_name(self):
        assert isinstance(build_tokenizer("char"), CharTokenizer)
        assert isinstance(build_tokenizer("word"), WordTokenizer)

    def test_unknown_name_raises(self):
        with pytest.raises(ValueError, match="Unknown tokenizer"):
            build_tokenizer("sentencepiece")

    def test_tokenizer_from_state(self):
        tok = WordTokenizer().fit(CORPUS)
        restored = tokenizer_from_state(tok.state_dict())
        assert isinstance(restored, WordTokenizer)
        assert restored.word_to_index == tok.word_to_index
