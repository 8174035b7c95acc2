"""Tests for the dataset factory: selectors, samplers, build pipeline,
format conversion, and the offline MS MARCO-shaped end-to-end path."""

import json

import numpy as np
import pandas as pd
import pytest

from twotowers_tpu.data.factory.build_dataset import build_triplets, write_genealogy
from twotowers_tpu.data.factory.convert import (
    convert_dataset_format,
    convert_triplets_to_pairs,
    transform_and_save_dataset,
)
from twotowers_tpu.data.factory.selectors import (
    answer_in_text,
    build_inter_query_pool,
    classic_positives,
    high_ngram_overlap,
    intra_query_zero_filtered,
    ngram_set,
    random_inter_query,
)


@pytest.fixture
def msmarco_df():
    """Offline MS MARCO v1.1-shaped frame: query/answers/passages rows."""
    def row(query, answers, selected, texts):
        return {
            "query": query,
            "answers": answers,
            "passages": {"is_selected": selected, "passage_text": texts},
        }

    return pd.DataFrame([
        row("what is a tpu", ["a tensor processing unit"],
            [1, 0, 0],
            ["A TPU is a tensor processing unit built for matrix math.",
             "Bananas are yellow fruit that grow in bunches on plants.",
             "The answer is a tensor processing unit made by google."]),
        row("how do dense retrievers work", [],
            [0, 1],
            ["Cats sleep for most of the day in warm places around homes.",
             "Dense retrievers embed queries and documents into one space."]),
        row("best pasta recipe", ["boil water first"],
            [1, 0, 0],
            ["Boil water first, salt it, and cook the pasta al dente.",
             "You should always boil water first before adding pasta.",
             "Mountains form over millions of years through plate tectonics."]),
    ])


class TestFilters:
    def test_answer_in_text_case_insensitive(self):
        assert answer_in_text("The Answer Is HERE somewhere", ["answer is here"])
        assert not answer_in_text("nothing relevant", ["answer"])
        assert not answer_in_text("text", [])

    def test_ngram_set(self):
        grams = ngram_set("a b c d", n=3)
        assert grams == {"a b c", "b c d"}

    def test_high_ngram_overlap(self):
        text = "one two three four five six seven eight nine ten"
        assert high_ngram_overlap(text, text)
        assert not high_ngram_overlap(text, "totally different words here now ok")

    def test_short_texts_no_overlap(self):
        assert not high_ngram_overlap("a b", "a b")  # below n-gram length


class TestSelectors:
    def test_classic_positives_multi_positive(self, msmarco_df):
        positives = list(classic_positives(msmarco_df))
        assert len(positives) == 3  # one per is_selected==1 passage
        assert positives[0]["query"] == "what is a tpu"
        assert "tensor processing" in positives[0]["positive"]
        assert positives[0]["answers"] == ["a tensor processing unit"]


class TestSamplers:
    def test_inter_query_pool_flattens_all(self, msmarco_df):
        pool = build_inter_query_pool(msmarco_df)
        assert len(pool) == 8  # 3 + 2 + 3 passages

    def test_random_inter_query_deterministic(self, msmarco_df):
        pool = build_inter_query_pool(msmarco_df)
        a = random_inter_query(pool, seed=3)
        b = random_inter_query(pool, seed=3)
        assert [a({}) for _ in range(5)] == [b({}) for _ in range(5)]

    def test_intra_query_filters_answer_leak(self, msmarco_df):
        sampler = intra_query_zero_filtered(seed=0)
        ctx = next(classic_positives(msmarco_df))  # the tpu query
        # candidates: bananas passage (ok) and "answer is a tensor processing
        # unit" (leaks the answer -> filtered)
        for _ in range(10):
            neg = sampler(ctx)
            assert neg is not None
            assert "tensor processing" not in neg

    def test_intra_query_filters_near_duplicate(self, msmarco_df):
        sampler = intra_query_zero_filtered(seed=0)
        positives = list(classic_positives(msmarco_df))
        pasta = positives[2]
        neg = sampler(pasta)
        # only the mountains passage survives (the other is a near-dup of the
        # positive and, anyway, contains the answer)
        assert neg is not None and "Mountains" in neg

    def test_intra_query_returns_none_when_empty(self):
        df = pd.DataFrame([{
            "query": "q", "answers": [],
            "passages": {"is_selected": [1], "passage_text": ["only positive"]},
        }])
        sampler = intra_query_zero_filtered()
        ctx = next(classic_positives(df))
        assert sampler(ctx) is None


class TestBuildTriplets:
    def test_classic_preset(self, msmarco_df):
        preset = {"positive_selector": "classic",
                  "negative_sampler": {"type": "random_inter"},
                  "negatives_per_pos": 1}
        out = build_triplets(msmarco_df, preset, seed=0)
        assert list(out.columns) == ["q_text", "d_pos_text", "d_neg_text"]
        assert len(out) == 3  # one negative per positive

    def test_multi_neg_preset(self, msmarco_df):
        preset = {"positive_selector": "classic",
                  "negative_sampler": {"type": "random_inter"},
                  "negatives_per_pos": 4}
        out = build_triplets(msmarco_df, preset, seed=0)
        assert len(out) == 12

    def test_intra_query_preset_drops_exhausted(self, msmarco_df):
        preset = {"positive_selector": "classic",
                  "negative_sampler": {"type": "intra_query_zero"},
                  "negatives_per_pos": 2}
        out = build_triplets(msmarco_df, preset, seed=0)
        # every positive has at least one valid intra negative in the fixture
        assert len(out) == 6
        # negatives come from the same query's passages
        tpu_rows = out[out.q_text == "what is a tpu"]
        assert all("Bananas" in n for n in tpu_rows.d_neg_text)

    def test_unknown_sampler_raises(self, msmarco_df):
        with pytest.raises(ValueError, match="unknown negative_sampler"):
            build_triplets(msmarco_df, {"negative_sampler": {"type": "bogus"}})

    def test_determinism_by_seed(self, msmarco_df):
        preset = {"negative_sampler": {"type": "random_inter"},
                  "negatives_per_pos": 2}
        a = build_triplets(msmarco_df, preset, seed=5)
        b = build_triplets(msmarco_df, preset, seed=5)
        assert a.equals(b)

    def test_genealogy_sidecar(self, msmarco_df, tmp_path):
        preset = {"negative_sampler": {"type": "random_inter"}}
        out = build_triplets(msmarco_df, preset, seed=0)
        path = tmp_path / "triplets.parquet"
        out.to_parquet(path)
        sidecar = write_genealogy(path, preset=preset, preset_path="p.yml",
                                  split="train", input_rows=3,
                                  output_rows=len(out), seed=0)
        record = json.loads(sidecar.read_text())
        assert record["pipeline"][0]["rows"] == 3
        assert record["pipeline"][1]["rows"] == len(out)


class TestConvert:
    def test_pairs_to_triplets_format(self):
        df = pd.DataFrame({
            "query": ["q", "q", "q"],
            "document": ["p1", "p2", "n1"],
            "label": [1, 1, 0],
        })
        out = convert_dataset_format(df, "triplets")
        assert list(out.columns) == ["query", "positive_doc", "negative_doc"]
        assert len(out) == 2

    def test_triplets_to_pairs_dedup(self):
        df = pd.DataFrame({
            "q_text": ["q", "q"],
            "d_pos_text": ["p", "p"],
            "d_neg_text": ["n1", "n2"],
        })
        out = convert_triplets_to_pairs(df)
        # p appears once despite two triplet rows
        assert len(out) == 3
        assert set(out["label"]) == {0, 1}

    def test_transform_and_save_roundtrip(self, tmp_path):
        df = pd.DataFrame({
            "query": ["q", "q"], "document": ["p", "n"], "label": [1, 0],
        })
        src = tmp_path / "pairs.tsv"
        df.to_csv(src, sep="\t", index=False)
        dst = tmp_path / "out.parquet"
        result = transform_and_save_dataset(src, dst, "triplets",
                                            input_in_raw=False,
                                            output_in_processed=False)
        out = pd.read_parquet(result)
        assert len(out) == 1


class TestPresetFiles:
    @pytest.mark.parametrize("name,sampler,negs", [
        ("classic.yml", "random_inter", 1),
        ("multi_positive.yml", "random_inter", 1),
        ("intra_query_neg.yml", "intra_query_zero", 2),
        ("multi_pos_multi_neg.yml", "random_inter", 4),
    ])
    def test_presets_match_reference_semantics(self, name, sampler, negs):
        import yaml
        from pathlib import Path

        preset = yaml.safe_load(
            (Path(__file__).parent.parent / "presets" / name).read_text()
        )
        assert preset["positive_selector"] == "classic"
        assert preset["negative_sampler"]["type"] == sampler
        assert preset["negatives_per_pos"] == negs

    def test_all_presets_buildable(self, msmarco_df):
        import yaml
        from pathlib import Path

        for preset_file in (Path(__file__).parent.parent / "presets").glob("*.yml"):
            preset = yaml.safe_load(preset_file.read_text())
            out = build_triplets(msmarco_df, preset, seed=0)
            assert len(out) > 0, preset_file.name
