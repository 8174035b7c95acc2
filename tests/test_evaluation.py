"""Unit tests for IR metrics and the evaluation harness.

Metric goldens are hand-computed; NDCG additionally cross-checks sklearn's
tie-averaged semantics (the reference used sklearn ndcg_score directly).
"""

import numpy as np
import pytest

import jax

from twotowers_tpu.evaluation import (
    evaluate_model,
    mean_reciprocal_rank,
    ndcg_at_k,
    precision_at_k,
    print_evaluation_results,
    recall_at_k,
)
from twotowers_tpu.evaluation.metrics import _ndcg_tie_averaged
from twotowers_tpu.models import (
    EmbeddingSpec,
    TowerSpec,
    TwoTowerSpec,
    init_two_tower,
)
from twotowers_tpu.tokenizers import CharTokenizer


class TestMRR:
    def test_first_position(self):
        assert mean_reciprocal_rank([1, 0, 0]) == 1.0

    def test_third_position(self):
        assert mean_reciprocal_rank([0, 0, 1]) == pytest.approx(1 / 3)

    def test_no_relevant(self):
        assert mean_reciprocal_rank([0, 0, 0]) == 0.0


class TestPrecisionRecall:
    def test_precision_basic(self):
        assert precision_at_k([1, 0, 1, 0], 2) == 0.5
        assert precision_at_k([1, 1, 0, 0], 2) == 1.0

    def test_precision_pads_short_lists(self):
        # reference pads with zeros below k (evaluate.py:56-58)
        assert precision_at_k([1], 4) == 0.25

    def test_recall_basic(self):
        assert recall_at_k([1, 0, 1, 0], 2, total_relevant=2) == 0.5
        assert recall_at_k([1, 1, 0, 0], 2, total_relevant=2) == 1.0

    def test_recall_zero_relevant(self):
        assert recall_at_k([0, 0], 2, total_relevant=0) == 0.0

    def test_recall_short_list(self):
        assert recall_at_k([1], 5, total_relevant=2) == 0.5


class TestNDCG:
    def test_perfect_ranking(self):
        assert ndcg_at_k([1, 1, 0, 0], 4) == pytest.approx(1.0)

    def test_rank_sensitivity(self):
        # the defect the reference's NDCG had (VERDICT r4 weak #1): a rank-2
        # hit must beat a rank-10 hit and lose to a rank-1 hit, strictly.
        rank1 = ndcg_at_k([1] + [0] * 9, 10)
        rank2 = ndcg_at_k([0, 1] + [0] * 8, 10)
        rank10 = ndcg_at_k([0] * 9 + [1], 10)
        assert rank1 == pytest.approx(1.0)
        assert rank1 > rank2 > rank10 > 0.0
        # exact values: DCG discount 1/log2(i+2), single relevant → IDCG=1
        assert rank2 == pytest.approx(1 / np.log2(3))
        assert rank10 == pytest.approx(1 / np.log2(11))

    def test_rank2_outside_k_window(self):
        # hits beyond k contribute nothing; k=5 with the hit at rank 6 is 0
        assert ndcg_at_k([0] * 5 + [1] + [0] * 4, 5) == 0.0
        # ...but content at ranks 2-5 moves ndcg@5 (it could not, pre-fix)
        assert ndcg_at_k([0, 1, 1, 0, 0], 5) != ndcg_at_k([0, 1, 0, 0, 1], 5)

    def test_graded_relevance(self):
        # graded gains, hand computed: rel [3,1,2] at k=3
        got = ndcg_at_k([3, 1, 2], 3)
        dcg = 3 / np.log2(2) + 1 / np.log2(3) + 2 / np.log2(4)
        idcg = 3 / np.log2(2) + 2 / np.log2(3) + 1 / np.log2(4)
        assert got == pytest.approx(dcg / idcg)

    def test_no_relevant_is_zero(self):
        assert ndcg_at_k([0, 0, 0], 3) == 0.0

    def test_short_list(self):
        assert ndcg_at_k([1], 5) == pytest.approx(1.0)
        assert ndcg_at_k([0, 1], 5) == pytest.approx(1 / np.log2(3))

    def test_reference_compat_matches_sklearn_call_shape(self):
        sklearn = pytest.importorskip("sklearn.metrics")
        rng = np.random.default_rng(0)
        for _ in range(20):
            rel = rng.integers(0, 2, size=8).astype(float)
            if rel.sum() == 0:
                continue
            k = int(rng.integers(1, 8))
            got = ndcg_at_k(rel, k, reference_compat=True)
            y_true = np.sort(rel)[::-1].reshape(1, -1)
            y_score = rel.reshape(1, -1)
            want = sklearn.ndcg_score(y_true, y_score, k=k)
            assert got == pytest.approx(want, abs=1e-9)

    def test_reference_compat_is_degenerate(self):
        # documents WHY compat mode is quarantined: rank-2 == rank-9 == a
        # constant independent of rank, i.e. affine in precision@1
        vals = [ndcg_at_k([0] * r + [1] + [0] * (9 - r), 5,
                          reference_compat=True) for r in range(1, 10)]
        assert all(v == pytest.approx(vals[0]) for v in vals)

    def test_fallback_matches_sklearn(self):
        sklearn = pytest.importorskip("sklearn.metrics")
        rng = np.random.default_rng(1)
        for _ in range(20):
            rel = rng.integers(0, 3, size=6).astype(float)
            if rel.sum() == 0:
                continue
            k = int(rng.integers(1, 6))
            y_true = np.sort(rel)[::-1]
            want = sklearn.ndcg_score(
                y_true.reshape(1, -1), rel.reshape(1, -1), k=k
            )
            got = _ndcg_tie_averaged(y_true, rel, k)
            assert got == pytest.approx(want, abs=1e-9)


class TestEvaluateModel:
    @pytest.fixture
    def model(self, rng):
        tok = CharTokenizer().fit(["machine learning", "deep nets", "dog", "cat",
                                   "tpu hardware", "systolic arrays"])
        spec = TwoTowerSpec(
            embedding=EmbeddingSpec(kind="lookup", vocab_size=tok.vocab_size,
                                    embedding_dim=16),
            tower=TowerSpec(arch="mean", embedding_dim=16, hidden_dim=32),
            tied_weights=True,
        )
        params = init_two_tower(rng, spec)
        return params, spec, tok

    def test_returns_all_metrics(self, model):
        params, spec, tok = model
        test_data = [
            ("machine learning", ["deep nets", "dog", "cat"], [1, 0, 0]),
            ("tpu hardware", ["systolic arrays", "cat"], [1, 0]),
        ]
        results = evaluate_model(params, spec, test_data, tok,
                                 k_values=[1, 5], batch_size=2, max_length=16)
        for key in ("precision@1", "precision@5", "recall@1", "recall@5",
                    "mrr", "ndcg@1", "ndcg@5"):
            assert key in results
            assert 0.0 <= results[key] <= 1.0

    def test_identical_query_doc_ranks_first(self, model):
        params, spec, tok = model
        # the same text through tied towers has cosine 1 with itself
        test_data = [("machine learning",
                      ["dog", "machine learning", "cat"], [0, 1, 0])]
        results = evaluate_model(params, spec, test_data, tok,
                                 k_values=[1], batch_size=2, max_length=16)
        assert results["precision@1"] == 1.0
        assert results["mrr"] == 1.0

    def test_metric_subset(self, model):
        params, spec, tok = model
        test_data = [("dog", ["dog", "cat"], [1, 0])]
        results = evaluate_model(params, spec, test_data, tok,
                                 metrics=["mrr"], batch_size=2, max_length=8)
        assert list(results) == ["mrr"]

    def test_print_results_smoke(self, model, capsys):
        print_evaluation_results({"precision@1": 0.5, "recall@5": 0.7,
                                  "mrr": 0.6, "ndcg@5": 0.8})
        out = capsys.readouterr().out
        assert "Precision" in out and "MRR: 0.6000" in out


class TestEncoderWindow:
    def test_windowed_encode_matches_single_window(self, rng):
        """r5: the evaluation encoder's bounded in-flight window (merge every
        64 chunks) must not change results."""
        from twotowers_tpu.evaluation.evaluate import _Encoder

        tok = CharTokenizer().fit(["some corpus text"])
        spec = TwoTowerSpec(
            embedding=EmbeddingSpec(kind="lookup", vocab_size=tok.vocab_size,
                                    embedding_dim=8),
            tower=TowerSpec(arch="mean", embedding_dim=8, hidden_dim=16),
            tied_weights=True,
        )
        params = init_two_tower(rng, spec)
        texts = [f"text {i}" for i in range(135)]  # 68 chunks at bs=2
        small = _Encoder(params, spec, tok, max_length=12, batch_size=2)
        big = _Encoder(params, spec, tok, max_length=12, batch_size=256)
        np.testing.assert_allclose(small(texts, "document"),
                                   big(texts, "document"), atol=1e-6)
