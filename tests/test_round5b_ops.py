"""Round-5 batch B operators: integer-exact PageRank, content-defined
chunking, TF-IDF top-k, and PII redaction.

Each gets a hand-computable oracle at unit scale plus the property that
motivates it (rank mass behavior, CDC insertion-shift immunity,
byte-exact scrub cascade) and, where the 100 TB shape depends on it, a
physical-plan pin."""

import re

import pytest
from pyspark.sql import functions as F

from osmnetfusion_spark.operators import cleaning, graph
from osmnetfusion_spark.operators.dedup import cdc_chunks
from osmnetfusion_spark.operators.textstats import tfidf_topk


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


# -------------------------------------------------------------- pagerank


def _pagerank_bruteforce(edges, iters=5, scale=10**12, d_num=85, d_den=100):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    outd = {}
    for u, _ in edges:
        outd[u] = outd.get(u, 0) + 1
    rank = {n: scale for n in nodes}
    base = (scale * (d_den - d_num)) // d_den
    for _ in range(iters):
        inc = {n: 0 for n in nodes}
        for u, v in edges:
            inc[v] += rank[u] // outd[u]
        rank = {n: base + (d_num * inc[n]) // d_den for n in nodes}
    return rank


def test_pagerank_matches_bruteforce(spark):
    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in graph.pagerank(df, iters=5).collect()}
    assert got == _pagerank_bruteforce(edges)


def test_pagerank_sink_without_outlinks_gets_base_plus_inflow(spark):
    # node 3 is a pure sink: appears only as dst, still ranked
    edges = [(0, 3), (1, 3), (2, 3), (3, 3)][:3]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in graph.pagerank(df, iters=2).collect()}
    assert set(got) == {0, 1, 2, 3}
    assert got[3] > got[0] == got[1] == got[2]


def test_pagerank_partitioning_invariant(spark):
    docs = spark.range(0, 97).select(F.col("id").alias("doc_id"))
    e = graph.derive_link_graph(docs)
    a = {r["node"]: r["rank"]
         for r in graph.pagerank(e.repartition(1), iters=3).collect()}
    b = {r["node"]: r["rank"]
         for r in graph.pagerank(e.repartition(13, "dst"), iters=3).collect()}
    assert a == b


def test_derive_link_graph_no_self_loops_and_outdegree(spark):
    docs = spark.range(0, 50).select(F.col("id").alias("doc_id"))
    e = graph.derive_link_graph(docs).collect()
    assert all(r["src"] != r["dst"] for r in e)
    outd = {}
    for r in e:
        outd[r["src"]] = outd.get(r["src"], 0) + 1
    assert min(outd.values()) >= 1 and set(outd) == set(range(50))


# ----------------------------------------------------------- cdc_chunks


def test_cdc_insertion_shift_immunity(spark):
    # THE content-defined property: an insertion near the head changes
    # O(1) chunks; every chunk after the next boundary is byte-identical,
    # so the duplicated-chunk fraction of the padded twin stays high.
    base = "alpha beta gamma delta epsilon zeta eta theta " * 6
    docs = spark.createDataFrame(
        [(0, base), (1, "INSERTED-PREFIX-WORD " + base)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in cdc_chunks(docs, avg=4).collect()}
    # both docs share almost all content-defined chunks
    assert rows[0]["dup_chunk_frac"] >= 0.5
    assert rows[1]["dup_chunk_frac"] >= 0.5


def test_cdc_chunks_partition_all_tokens(spark):
    docs = spark.createDataFrame(
        [(7, "one two three four five six seven eight nine ten")],
        "doc_id long, text string",
    )
    out = cdc_chunks(docs, avg=8).collect()
    assert len(out) == 1 and out[0]["n_chunks"] >= 1


def test_cdc_chunks_empty_doc_emits_no_row(spark):
    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "words exist here")],
        "doc_id long, text string",
    )
    got = {r["doc_id"] for r in cdc_chunks(docs).collect()}
    assert got == {3}


def test_cdc_chunks_validates_avg(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        cdc_chunks(docs, avg=1)


def test_cdc_chunks_join_not_forced_broadcast(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f g h i j")], "doc_id long, text string"
    )
    # the duplicated-chunk set is unbounded at corpus scale (line_dedup
    # lesson) -- the attribution join must not carry a broadcast HINT
    plan = _plan(cdc_chunks(docs))
    assert "ResolvedHint" not in plan


# ----------------------------------------------------------- tfidf_topk


def test_tfidf_hand_example(spark):
    import math

    docs = spark.createDataFrame(
        [(0, "cat cat dog"), (1, "dog fish"), (2, "fish fish fish")],
        "doc_id long, text string",
    )
    out = tfidf_topk(docs, k=2).collect()
    by = {(r["doc_id"], r["term"]): r for r in out}
    # "cat": tf=2 in doc0, df=1, N=3 -> 2*ln(3)
    assert by[(0, "cat")]["tfidf"] == round(2 * math.log(3.0), 6)
    assert by[(0, "cat")]["rank"] == 1
    # "dog" in doc0: tf=1, df=2 -> ln(1.5)
    assert by[(0, "dog")]["tfidf"] == round(math.log(1.5), 6)
    assert all(r["rank"] <= 2 for r in out)


def test_tfidf_rank_window_is_doc_partitioned(spark):
    docs = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    plan = _plan(tfidf_topk(docs, k=3))
    # the top-k window must be keyed by doc (per-group state), never global
    assert "partitionBy=[__did]" in plan.replace(" ", "") or "__did" in plan


def test_tfidf_validates_k(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        tfidf_topk(docs, k=0)


# ----------------------------------------------------------- pii_redact


def test_pii_redact_counts_and_bytes(spark):
    txt = (
        "mail a.b+c@ex-am.ple.org and d@e.fg, host 192.168.0.1 "
        "call +49 89 1234567 end"
    )
    df = spark.createDataFrame([(1, txt)], "doc_id long, text string")
    row = cleaning.pii_redact(df, keep_text=True).collect()[0]
    assert row["n_email"] == 2
    assert row["n_ipv4"] == 1
    assert row["n_phone"] == 1
    assert row["redacted"] == (
        "mail <EMAIL> and <EMAIL>, host <IP> call <PHONE> end"
    )


def test_pii_redact_cascade_order(spark):
    # email requires an alphabetic TLD, so a raw-IP host falls through to
    # the IP rule; an IP EMBEDDED in a dotted mail host is consumed by
    # the email rule first (cascade order is part of the contract)
    df = spark.createDataFrame(
        [(1, "x user@1.2.3.44 y"), (2, "x user@10.0.0.1.example.com y")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in cleaning.pii_redact(df, keep_text=True).collect()
    }
    assert rows[1]["redacted"] == "x user@<IP> y"
    assert rows[1]["n_email"] == 0 and rows[1]["n_ipv4"] == 1
    assert rows[2]["redacted"] == "x <EMAIL> y"
    # the count audit (on RAW text) sees both pattern classes in doc 2
    assert rows[2]["n_email"] == 1 and rows[2]["n_ipv4"] == 1


def test_pii_redact_clean_text_unchanged(spark):
    df = spark.createDataFrame(
        [(1, "no personal data in here at all")], "doc_id long, text string"
    )
    row = cleaning.pii_redact(df, keep_text=True).collect()[0]
    assert row["redacted"] == "no personal data in here at all"
    assert row["n_email"] == row["n_ipv4"] == row["n_phone"] == 0


def test_pii_patterns_are_re2_safe():
    # the oracle replays the cascade in RE2: keep to the agreeing subset
    for _, pat, _ in cleaning.PII_PATTERNS:
        assert "(?=" not in pat and "(?<" not in pat and "\\1" not in pat
        re.compile(pat)


def test_pii_redact_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = _plan(cleaning.pii_redact(df))
    assert "Exchange" not in plan


# -------------------------------------------------------- ccnet_buckets


def test_ccnet_buckets_terciles_per_lang(spark):
    # 9 docs in one lang with clearly separated NLL levels -> 3/3/3 split;
    # repetitive text scores low NLL, mixed-vocab text scores high
    rows = []
    for i in range(3):
        rows.append((i, "aa bb " * 20, "de"))                  # fluent
    for i in range(3, 6):
        rows.append((i, "aa bb cc dd ee ff gg hh " * 5, "de"))  # middle
    for i in range(6, 9):
        rows.append((i, f"u{i}a v{i}b w{i}c x{i}d y{i}e z{i}f q{i}g r{i}h "
                        f"s{i}i t{i}j", "de"))                  # rare bigrams
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["doc_id"]: r for r in
           __import__("osmnetfusion_spark.operators.cleaning",
                      fromlist=["ccnet_buckets"]).ccnet_buckets(df).collect()}
    assert len(out) == 9
    buckets = [out[i]["bucket"] for i in range(9)]
    assert buckets[:3] == ["head"] * 3
    assert buckets[3:6] == ["middle"] * 3
    assert buckets[6:] == ["tail"] * 3
    # nll ordering consistent with buckets
    assert max(out[i]["nll"] for i in range(3)) <= min(
        out[i]["nll"] for i in range(3, 6))


def test_ccnet_buckets_langs_are_independent(spark):
    # the same text lands in different buckets depending on its language
    # peers -- thresholds are per-language
    rows = [(0, "p q " * 10, "aa"), (1, "p q r s t u v w x y", "aa"),
            (2, "p q s t v w y z p r", "aa"),
            (3, "p q " * 10, "bb")]  # sole bb doc: its own tercile -> head
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    from osmnetfusion_spark.operators.cleaning import ccnet_buckets
    out = {r["doc_id"]: r["bucket"] for r in ccnet_buckets(df).collect()}
    assert out[3] == "head"
    assert set(out) == {0, 1, 2, 3}


# ----------------------------------------------------------- gopher_rules


def test_gopher_rules_each_rule_fires(spark):
    from osmnetfusion_spark.operators.cleaning import gopher_rules

    good = ("the cat and the dog sat close to the mat in a warm room that "
            "was quite nice for all of them to rest and sleep deeply")
    rows = [
        (0, good),                                   # passes everything
        (1, "too short for the gate"),               # ok_words fails
        (2, "# # # " * 20 + good),                   # symbol ratio fails
        (3, "- a\n- b\n- c\n- d", ),                 # bullets fail (+words)
        (4, good.replace(" ", "... ")),              # ellipsis-symbols fail
        (5, " ".join("9" * 3 for _ in range(40))),   # alpha + stop fail
    ]
    rows = [(i, t if isinstance(t, str) else t[0]) for i, t in
            [(r[0], r[1]) for r in rows]]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in gopher_rules(df).collect()}
    assert out[0]["gopher_pass"] is True
    assert out[1]["ok_words"] is False and out[1]["gopher_pass"] is False
    assert out[2]["ok_symbols"] is False
    assert out[3]["bullet_frac"] == 1.0 and out[3]["ok_bullets"] is False
    assert out[4]["ok_symbols"] is False
    assert out[5]["ok_alpha"] is False and out[5]["ok_stop"] is False


def test_gopher_rules_ellipsis_lines(spark):
    from osmnetfusion_spark.operators.cleaning import gopher_rules

    df = spark.createDataFrame(
        [(1, "first line...\nsecond line...\nthird stays")],
        "doc_id long, text string",
    )
    row = gopher_rules(df).collect()[0]
    assert row["ellipsis_frac"] == round(2 / 3, 6)
    assert row["ok_ellipsis"] is False


def test_gopher_rules_unknown_threshold_raises(spark):
    from osmnetfusion_spark.operators.cleaning import gopher_rules

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        gopher_rules(df, min_wordz=3)


def test_gopher_rules_shuffle_free(spark):
    from osmnetfusion_spark.operators.cleaning import gopher_rules

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    assert "Exchange" not in _plan(gopher_rules(df))


# --------------------------------------------------------- phrase_search


def test_phrase_search_hand_example(spark):
    from osmnetfusion_spark.operators.textstats import phrase_search

    docs = spark.createDataFrame(
        [
            (0, "big table value small table value end"),
            (1, "table alone and value alone"),
            (2, "table value"),
            (3, "value table"),  # reversed -> no match
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           phrase_search(docs, ["table", "value"]).collect()}
    assert set(out) == {0, 2}
    assert out[0]["n_occurrences"] == 2 and out[0]["first_pos"] == 1
    assert out[2]["n_occurrences"] == 1 and out[2]["first_pos"] == 0


def test_phrase_search_single_term_and_validation(spark):
    from osmnetfusion_spark.operators.textstats import phrase_search

    docs = spark.createDataFrame(
        [(0, "a b a"), (1, "b b")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in phrase_search(docs, ["a"]).collect()}
    assert out[0]["n_occurrences"] == 2 and 1 not in out
    with pytest.raises(ValueError):
        phrase_search(docs, [])


def test_phrase_search_pushes_term_filter_into_postings(spark):
    from osmnetfusion_spark.operators.textstats import phrase_search

    docs = spark.createDataFrame([(0, "x y")], "doc_id long, text string")
    plan = _plan(phrase_search(docs, ["x", "y"]))
    # postings must be filtered by term BEFORE the position join -- the
    # index property that keeps postings O(term frequency), not O(corpus)
    assert "Filter" in plan and "Join" in plan
