"""Native C++ tokenizer core: parity with the Python paths + throughput."""

import numpy as np
import pytest

from twotowers_tpu.native.tokenize import (
    WordVocabTable,
    available,
    char_encode_batch,
    word_encode_batch,
)
from twotowers_tpu.tokenizers import CharTokenizer, WordTokenizer

pytestmark = pytest.mark.skipif(not available(), reason="no C++ toolchain")

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "TPUs multiply matrices with systolic arrays!",
    "hello, world: 123 tokens_and_underscores",
    "",
    "repeated repeated repeated words words",
] * 30  # >=64 texts to engage the native path


class TestCharNative:
    def test_matches_python_path(self):
        tok = CharTokenizer().fit(CORPUS)
        native = tok.encode_batch(CORPUS, max_len=48)  # native (>=64 texts)
        python = np.stack([
            np.asarray(tok.truncate_and_pad(tok.encode(t), 48), np.int32)
            for t in CORPUS
        ])
        np.testing.assert_array_equal(native, python)

    def test_direct_call_unknown_chars(self):
        tok = CharTokenizer().fit(["abc"])
        out = char_encode_batch(["axz", ""], tok._lut, 4)
        np.testing.assert_array_equal(out, [[1, 0, 0, 0], [0, 0, 0, 0]])

    def test_truncation(self):
        tok = CharTokenizer().fit(["abcdef"])
        out = char_encode_batch(["abcdef"], tok._lut, 3)
        assert out.shape == (1, 3)
        np.testing.assert_array_equal(out[0], tok.encode("abcdef")[:3])


class TestWordNative:
    def test_matches_python_path(self):
        tok = WordTokenizer(max_len=16).fit(CORPUS)
        native = tok.encode_batch(CORPUS, max_len=16)
        python = np.stack([
            np.asarray(tok.truncate_and_pad(tok.encode(t), 16), np.int32)
            for t in CORPUS
        ])
        np.testing.assert_array_equal(native, python)

    def test_unknown_words_unk(self):
        tok = WordTokenizer().fit(["known tokens here"] * 1)
        table = WordVocabTable(tok.word_to_index)
        out = word_encode_batch(["unseen stuff"], table, 4)
        np.testing.assert_array_equal(out[0], [1, 1, 0, 0])

    def test_non_ascii_falls_back_consistently(self):
        texts = ["café au lait naïve"] * 70
        tok = WordTokenizer().fit(texts)
        batch = tok.encode_batch(texts, 8)  # python fallback (non-ascii)
        want = np.asarray(tok.truncate_and_pad(tok.encode(texts[0]), 8), np.int32)
        np.testing.assert_array_equal(batch[0], want)


class TestThroughput:
    def test_native_not_slower(self):
        """Sanity: native >= 1x python on a big batch (usually 5-20x)."""
        import time

        texts = [f"document number {i} with some repeated filler text "
                 f"about topic {i % 50} and more words" for i in range(5000)]
        tok = CharTokenizer().fit(texts)

        from twotowers_tpu.tokenizers.base import BaseTokenizer

        # Warm both paths first: the native call lazily loads (and may build)
        # the shared library, which must not land in the timed section.
        tok.encode_batch(texts[:128], 64)
        BaseTokenizer.encode_batch(tok, texts[:128], 64)

        def best_of(fn, n=3):
            best = float("inf")
            for _ in range(n):
                t0 = time.perf_counter()
                out = fn()
                best = min(best, time.perf_counter() - t0)
            return out, best

        native, native_time = best_of(lambda: tok.encode_batch(texts, 64))
        python, python_time = best_of(
            lambda: BaseTokenizer.encode_batch(tok, texts, 64))

        np.testing.assert_array_equal(native, python)
        assert native_time < python_time * 1.5  # generous: no regression
