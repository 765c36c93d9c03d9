"""Round-5 LLM-pipeline operators: BM25 retrieval, bigram-LM scoring,
duplicated-span detection, and histogram-derived exact grouped quantiles.

Each operator gets (a) a hand-computable or independent-algorithm oracle
at unit scale and (b) where it matters, a physical-plan pin for the
property that keeps it alive at 100 TB."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from osmnetfusion_spark.operators import dedup, textstats
from osmnetfusion_spark.operators.quantiles import grouped_quantiles

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


# ------------------------------------------------------------------ BM25


def _bm25_bruteforce(texts, terms, k1=1.2, b=0.75):
    import re

    toks = [
        [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t] for s in texts
    ]
    n = float(len(toks))
    dls = [float(len(t)) for t in toks]
    avgdl = sum(dls) / n
    out = []
    for d, tk in enumerate(toks):
        score = 0.0
        for trm in terms:
            tf = float(tk.count(trm))
            df = float(sum(1 for t2 in toks if trm in t2))
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            score += idf * tf * (k1 + 1.0) / (
                tf + k1 * (1.0 - b + b * dls[d] / avgdl)
            )
        out.append((d, round(score, 6)))
    return {d: s for d, s in out if any(t in toks[d] for t in terms)}


def test_bm25_matches_bruteforce(spark):
    texts = [
        "spark shuffles the window frame for every join",
        "a window over a window makes two shuffles",
        "the quick brown fox",
        "join join join spark",
        "completely unrelated text about gardens",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["bm25"]
        for r in textstats.bm25_topk(df, ["spark", "window", "join"], k=10).collect()
    }
    want = _bm25_bruteforce(texts, ["spark", "window", "join"])
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=2e-6)


def test_bm25_empty_terms_raises(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        textstats.bm25_topk(df, [])


def test_bm25_plan_is_scan_plus_takeordered(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(textstats.bm25_topk(d, ["spark", "join"], k=5))
    # corpus stats re-enter as a 1-row broadcast; the ranking is a
    # distributed partial top-k; nothing shuffles the corpus itself
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan


# ------------------------------------------------------------- bigram LM


def test_lm_score_hand_example(spark):
    # doc1 "a b a b": bigrams (a,b)(b,a)(a,b); doc2 "a b": (a,b)
    # c(a,b)=3 c(b,a)=1; ctx a=3, b=1; V=2, alpha=.5
    # p(b|a)=(3+.5)/(3+1)=0.875  p(a|b)=(1+.5)/(1+1)=0.75
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in textstats.lm_score(df, alpha=0.5).collect()}
    nll1 = -(math.log(0.875) + math.log(0.75) + math.log(0.875)) / 3.0
    assert rows[1]["n_bigrams"] == 3
    assert rows[1]["nll"] == pytest.approx(round(nll1, 6), abs=2e-6)
    assert rows[2]["n_bigrams"] == 1
    assert rows[2]["nll"] == pytest.approx(round(-math.log(0.875), 6), abs=2e-6)


def test_lm_score_short_docs_emit_no_row(spark):
    df = spark.createDataFrame(
        [(1, "single"), (2, ""), (3, "two tokens")], "doc_id long, text string"
    )
    assert [r["doc_id"] for r in textstats.lm_score(df).collect()] == [3]


def test_lm_score_lower_for_predictable_text(spark):
    # a doc made of the corpus's dominant bigram chain must score lower
    # (more predictable) than a doc of one-off bigrams
    rows = [(i, "a b a b a b a b") for i in range(20)]
    rows.append((100, "q w e r t y u i"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["nll"] for r in textstats.lm_score(df).collect()}
    assert got[0] < got[100]


# ---------------------------------------------------------- span dedup


def test_span_dedup_known_counts(spark):
    # w=3: doc1 windows {abc, bcd}, doc2 {xab, abc} -> abc duplicated
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "x a b c")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_windows"], r["dup_windows"], r["dup_span_frac"])
        for r in dedup.span_dedup(df, w=3).collect()
    }
    assert got == {1: (2, 1, 0.5), 2: (2, 1, 0.5)}


def test_span_dedup_counts_within_doc_repeats(spark):
    # the same window twice INSIDE one doc is a duplicate too (Lee et al.
    # count total occurrences, not distinct docs)
    df = spark.createDataFrame([(1, "a b a b")], "doc_id long, text string")
    got = dedup.span_dedup(df, w=2).collect()[0]
    # windows: ab, ba, ab -> ab occurs twice
    assert (got["n_windows"], got["dup_windows"]) == (3, 2)


def test_span_dedup_short_docs_emit_no_row(spark):
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b c")], "doc_id long, text string"
    )
    assert [r["doc_id"] for r in dedup.span_dedup(df, w=3).collect()] == [2]


def test_span_dedup_hash_equals_exact(spark):
    # the poly-hash path must agree with the collision-free raw-string
    # path at test scale (the contract oracle hashes; this is the anchor)
    d = spark.read.parquet(f"{SF}/documents.parquet")
    a = {
        r["doc_id"]: (r["n_windows"], r["dup_windows"])
        for r in dedup.span_dedup(d, w=8).collect()
    }
    b = {
        r["doc_id"]: (r["n_windows"], r["dup_windows"])
        for r in dedup.span_dedup(d, w=8, exact=True).collect()
    }
    assert a == b


def test_span_dedup_validates_w(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        dedup.span_dedup(df, w=0)


def test_span_dedup_join_is_not_forced_broadcast(spark):
    # the duplicated-window set grows with the corpus (the line_dedup
    # lesson): the attribution join must carry NO broadcast hint -- AQE
    # decides from runtime sizes
    d = spark.read.parquet(f"{SF}/documents.parquet")
    logical = dedup.span_dedup(d, w=8)._jdf.queryExecution().logical().toString()
    assert "UnresolvedHint" not in logical
    assert "ResolvedHint" not in logical


# ----------------------------------------------------- grouped quantiles


def test_grouped_quantiles_match_numpy(spark):
    rng = np.random.default_rng(42)
    rows = [
        (f"g{int(g)}", int(v))
        for g, v in zip(rng.integers(0, 3, 600), rng.integers(0, 40, 600))
    ]
    df = spark.createDataFrame(rows, "grp string, val long")
    qs = [0.0, 0.1, 0.25, 0.5, 0.9, 1.0]
    got = {
        r["grp"]: r
        for r in grouped_quantiles(df, ["grp"], "val", qs).collect()
    }
    by_grp: dict = {}
    for g, v in rows:
        by_grp.setdefault(g, []).append(v)
    for g, vals in by_grp.items():
        assert got[g]["n_rows"] == len(vals)
        for q in qs:
            want = float(np.percentile(vals, q * 100, method="linear"))
            name = f"q{int(round(q * 100)):02d}"
            assert got[g][name] == pytest.approx(want, abs=2e-6), (g, q)


def test_grouped_quantiles_single_value_group(spark):
    df = spark.createDataFrame([("a", 7)], "grp string, val long")
    r = grouped_quantiles(df, ["grp"], "val", [0.5, 1.0]).collect()[0]
    assert (r["q50"], r["q100"], r["n_rows"]) == (7.0, 7.0, 1)


def test_grouped_quantiles_exclude_nulls(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("a", 3)], "grp string, val long"
    )
    r = grouped_quantiles(df, ["grp"], "val", [0.5]).collect()[0]
    assert (r["n_rows"], r["q50"]) == (2, 2.0)


def test_grouped_quantiles_validation(spark):
    df = spark.createDataFrame([("a", 1)], "grp string, val long")
    with pytest.raises(ValueError):
        grouped_quantiles(df, ["grp"], "val", [])
    with pytest.raises(ValueError):
        grouped_quantiles(df, ["grp"], "val", [1.5])
    with pytest.raises(ValueError):
        grouped_quantiles(df, ["grp"], "val", [0.5], out_names=["a", "b"])


def test_grouped_quantiles_window_is_key_partitioned(spark):
    # the cumulative window must partition by the group keys -- an
    # unpartitioned window would funnel the histogram through one task
    d = spark.read.parquet(f"{SF}/documents.parquet").select(
        "lang", F.length("text").alias("n")
    )
    plan = _plan(grouped_quantiles(d, ["lang"], "n", [0.5]))
    assert "SinglePartition" not in plan, plan
    assert "hashpartitioning(lang" in plan, plan
