"""Property-based tests (hypothesis): Spark column implementations vs
pure-Python reference implementations on generated inputs.

Each property draws a BATCH of strings and evaluates them through one
DataFrame pass (per-example Spark jobs would be ~1 s each; batched, the
whole module is a few jobs)."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from blow_spark import functions as BF

# printable-ish text including whitespace runs, unicode, empties
TEXT = st.text(
    alphabet=st.characters(codec="utf-8", exclude_characters="\x00"),
    max_size=120,
)
BATCH = st.lists(TEXT, min_size=1, max_size=25)


def _py_shingles(text: str, n: int = 3) -> list[str]:
    toks = [t for t in re.split(r"\s+", text.strip().lower()) if t != ""]
    grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    seen, out = set(), []
    for g in grams:
        if g not in seen:
            seen.add(g)
            out.append(g)
    return out


_SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@given(BATCH)
@_SETTINGS
def test_word_shingles_matches_python_reference(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "text"])
    got = {
        r["i"]: list(r["sh"])
        for r in df.select("i", BF.word_shingles(F.col("text")).alias("sh")).collect()
    }
    for i, t in enumerate(texts):
        want = _py_shingles(t)
        # Java regex \s and Python's re \s disagree on a few exotic
        # unicode spaces; compare on the shared definition
        if re.search(r"[^\S \t\n\r\f\v]", t):
            continue
        assert got[i] == want, f"text={t!r}"


@given(BATCH)
@_SETTINGS
def test_quality_score_bounds_property(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    rows = df.select(BF.quality_score(F.col("text")).alias("q")).collect()
    for r in rows:
        assert 0.0 <= r["q"] <= 1.0


@given(st.lists(st.text(alphabet="abcdefg ", min_size=12, max_size=60), min_size=2, max_size=10))
@_SETTINGS
def test_minhash_containment_property(spark, texts):
    """A document is always a near-duplicate of itself: identical texts →
    identical signatures, regardless of content."""
    rows = [(i, t) for i, t in enumerate(texts)] + [
        (i + 1000, t) for i, t in enumerate(texts)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    from blow_spark.dedup import minhash_signatures

    sigs = {
        r["doc_id"]: tuple(r["minhash"])
        for r in minhash_signatures(df, "text", "doc_id", num_hashes=16).collect()
    }
    for i, t in enumerate(texts):
        if len([x for x in re.split(r"\s+", t.strip()) if x]) >= 3:
            assert sigs[i] == sigs[i + 1000]


INTERVAL = st.tuples(
    st.integers(min_value=0, max_value=500_000),
    st.integers(min_value=0, max_value=50_000),
)  # (start_sec, duration_sec) — spans many 1h cells or none
INTERVALS = st.lists(INTERVAL, min_size=1, max_size=12)


@given(INTERVALS, INTERVALS, st.sampled_from([60, 3600, 86400]))
@_SETTINGS
def test_interval_overlap_join_matches_reference(spark, a_iv, b_iv, cell):
    """Grid-cell overlap join == the O(n²) reference on arbitrary
    intervals at several cell granularities (cell ≪, ≈, ≫ span)."""
    from datetime import datetime, timedelta

    from blow_spark import ops

    epoch = datetime(2024, 1, 1)
    mk = lambda s, d: (epoch + timedelta(seconds=s), epoch + timedelta(seconds=s + d))
    a_rows = [(i, *mk(s, d)) for i, (s, d) in enumerate(a_iv)]
    b_rows = [(i, *mk(s, d)) for i, (s, d) in enumerate(b_iv)]
    a = spark.createDataFrame(a_rows, "a_id INT, a_start TIMESTAMP, a_end TIMESTAMP")
    b = spark.createDataFrame(b_rows, "b_id INT, b_start TIMESTAMP, b_end TIMESTAMP")
    got = {
        (r["a_id"], r["b_id"])
        for r in ops.interval_overlap_join(
            a, b, "a_start", "a_end", "b_start", "b_end", cell_seconds=cell
        ).collect()
    }
    want = {
        (ia, ib)
        for ia, (sa, ea) in enumerate([(s, s + d) for s, d in a_iv])
        for ib, (sb, eb) in enumerate([(s, s + d) for s, d in b_iv])
        if sa <= eb and sb <= ea
    }
    assert got == want


@settings(max_examples=5, deadline=None)
@given(
    deltas=st.lists(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=15),   # key
                st.integers(min_value=0, max_value=999),  # value
                st.booleans(),                            # delete marker
            ),
            min_size=0,
            max_size=8,
            unique_by=lambda t: t[0],
        ),
        min_size=1,
        max_size=3,
    )
)
def test_merge_into_parquet_matches_dict_model(spark, tmp_path_factory, deltas):
    """Model-based MERGE: applying K random deltas through
    ops.merge_into_parquet must equal replaying them on a plain Python
    dict (upsert non-deletes, pop deletes) — the declarative MERGE
    semantics with no engine in the loop."""
    from blow_spark import ops

    path = str(tmp_path_factory.mktemp("merge_model") / "t")
    base = [(k, k * 100) for k in range(0, 10)]
    spark.createDataFrame(base, "k long, v long").write.parquet(path)
    model = dict(base)
    for delta in deltas:
        df = spark.createDataFrame(
            [(k, v, d) for k, v, d in delta] or [(None, None, None)],
            "k long, v long, dead boolean",
        ).filter("k IS NOT NULL")
        ops.merge_into_parquet(spark, path, df, ["k"], delete_col="dead")
        for k, v, dead in delta:
            if dead:
                model.pop(k, None)
            else:
                model[k] = v
        got = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
        assert got == model


@given(
    st.one_of(
        st.floats(-1e13, 1e13, allow_nan=False),
        st.integers(-10**12, 10**12).map(lambda k: k + 0.5),  # exact ties
        st.integers(-10**6, 10**6).map(float),
    )
)
@settings(max_examples=300, deadline=None)
def test_round_half_away_matches_exact_decimal(x):
    """similarity._round_half_away must equal ROUND_HALF_UP applied to
    the double's EXACT decimal expansion — the semantics Spark's round()
    (BigDecimal HALF_UP) and DuckDB's std::round share, and the premise
    of the vectorized scorers' oracle-exactness claim. Hypothesis sweeps
    ordinary magnitudes, exact .5 ties, and exact integers."""
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np

    from blow_spark import similarity

    want = int(Decimal(x).quantize(Decimal(1), rounding=ROUND_HALF_UP))
    got = int(similarity._round_half_away(np.array([x], dtype=np.float64))[0])
    assert got == want, (x, got, want)


@given(st.integers(1, 9), st.integers(0, 9))
@settings(max_examples=40, deadline=None)
def test_stream_reader_restart_protocol_any_stop_point(committed_batches, extra):
    """Randomized restart protocol: run N committed batches, lose the
    reader, restart from the committed offset — the regressed watermark
    must self-heal with no duplicate and no gap, for ANY stop point."""
    from blow_spark import datasource

    opts = {"n": "10000", "rows_per_batch": "1000"}
    r = datasource.GeneratorStreamReader(opts)
    emitted, start = [], r.initialOffset()
    for _ in range(committed_batches):
        end = r.latestOffset()
        for p in r.partitions(start, end):
            emitted += list(range(p.start, p.end))
        r.commit(end)
        start = end
    committed_hi = committed_batches * 1000

    r2 = datasource.GeneratorStreamReader(opts)  # fresh incarnation
    start, emitted2 = {"index": committed_hi}, []
    for _ in range(12 + extra):
        end = r2.latestOffset()
        for p in r2.partitions(start, end):
            emitted2 += list(range(p.start, p.end))
        r2.commit(end)
        start = end
    assert emitted == list(range(committed_hi))
    assert emitted2 == list(range(committed_hi, 10000)), (
        committed_batches,
        emitted2[:5],
        emitted2[-5:] if emitted2 else None,
    )
