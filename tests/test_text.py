"""Text-analysis function quality tests (blow_spark.functions).

The documents fixture's `lang` column is a synthetic label uncorrelated
with the (English-word-salad) text, so language-ID accuracy is pinned on
hand-written sentences in real languages instead."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from blow_spark import functions as BF
from blow_spark.sources import read_table

LANG_SAMPLES = [
    ("en", "the cat sat on the mat and it was happy with the warm sun"),
    ("de", "der Hund ist nicht mit der Katze auf das Sofa gesprungen und sich gefreut"),
    ("fr", "le chat est dans la maison et les enfants ne sont pas pour une promenade"),
    ("es", "el perro es una mascota que vive en la casa con los niños para siempre"),
    ("zh", "今天的天气很好我们一起去公园散步吧"),
    ("ja", "今日はいい天気ですね公園にさんぽへ行きましょう"),
    ("ko", "오늘 날씨가 좋아서 공원에 산책하러 갑니다"),
    ("ru", "Сегодня хорошая погода и мы идем гулять в парк"),
]


def test_lang_id_on_real_sentences(spark):
    df = spark.createDataFrame(LANG_SAMPLES, ["lang", "text"])
    rows = df.select("lang", BF.lang_id(F.col("text")).alias("pred")).collect()
    wrong = [(r["lang"], r["pred"]) for r in rows if r["lang"] != r["pred"]]
    assert not wrong, f"misclassified: {wrong}"


def test_lang_id_unknown_is_und(spark):
    df = spark.createDataFrame([("xx", "zzz qqq www kkk")], ["lang", "text"])
    assert df.select(BF.lang_id(F.col("text"))).collect()[0][0] == "und"


def test_quality_score_bounds(spark, sf_dir):
    d = read_table(spark, sf_dir, "documents")
    stats = d.select(BF.quality_score(F.col("text")).alias("q")).agg(
        F.min("q").alias("lo"), F.max("q").alias("hi")
    ).collect()[0]
    assert 0.0 <= stats["lo"] <= stats["hi"] <= 1.0


def test_quality_score_monotone(spark):
    df = spark.createDataFrame(
        [("short",), (" ".join(["word"] * 10),), (" ".join(["word"] * 100),)], ["text"]
    )
    scores = [r[0] for r in df.select(BF.quality_score(F.col("text"))).collect()]
    assert scores == sorted(scores)
    assert scores[-1] == 1.0


def test_token_counts(spark):
    df = spark.createDataFrame([("hello world, it's 42 degrees!",)], ["text"])
    r = df.select(
        BF.token_count_ws(F.col("text")).alias("ws"),
        BF.token_count_bpe_ish(F.col("text")).alias("bpe"),
    ).collect()[0]
    assert r["ws"] == 5
    # hello | world | , | it | ' | s | 42 | degrees | !
    assert r["bpe"] == 9


def test_doc_fingerprint_stability_and_sensitivity(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"),
         (2, "alpha beta gamma delta epsilon"),
         (3, "totally unrelated words about query engines and shuffles")],
        ["doc_id", "text"],
    )
    fp = {r["doc_id"]: r["fp"] for r in
          df.select("doc_id", BF.doc_fingerprint(F.col("text")).alias("fp")).collect()}
    assert fp[1] == fp[2]
    # doc_fingerprint is a 1-permutation minhash: similar docs MAY share it
    # (that's the point); disjoint shingle sets must not
    assert fp[1] != fp[3]


def test_word_shingles_short_docs_empty_not_crash(spark):
    """Regression: sequence(1, 0) counts DOWN, so unguarded shingling threw
    on any document with fewer than n tokens."""
    df = spark.createDataFrame([("one two",), ("a",), ("",), ("x y z",)], ["text"])
    rows = df.select(BF.word_shingles(F.col("text")).alias("sh")).collect()
    sizes = [len(r["sh"]) for r in rows]
    assert sizes == [0, 0, 0, 1]


def test_collapse_repeated_tokens_properties(spark):
    """No two adjacent tokens equal in the output; idempotent; preserves
    first occurrence of each run; counts consistent."""
    from blow_spark.queries import queries

    rows = queries()["text_collapse_repeated_tokens"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        toks = r.clean_text.split(" ") if r.clean_text else []
        assert len(toks) == r.n_kept <= r.n_tokens
        assert all(a != b for a, b in zip(toks, toks[1:]))


def test_edit_distance_join_is_symmetric_candidate_free(spark):
    """The length-band prefilter must be lossless for d<=3: every pair the
    quadratic scan admits is admitted by the banded join (band is implied
    by the edit-distance bound, so results are identical by construction);
    sanity-check the triangle inequality dist(a,b) >= |len(a)-len(b)|."""
    from blow_spark.queries import queries

    rows = queries()["similarity_join_edit_distance"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert r.name_a < r.name_b
        assert r.edit_dist <= 3
        assert abs(len(r.name_a) - len(r.name_b)) <= r.edit_dist
