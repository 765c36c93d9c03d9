"""Pin the r6 numpy hash kernels (_fasthash) to the Catalyst column
definitions they replaced. The DuckDB oracle already pins the kernels at
the query level; these tests pin them at the OPERATOR level on crafted
texts that force the edge cases (empty/None text, short docs, repeated
tokens, punctuation-only, unicode separators)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from osmnetfusion_spark.operators import _fasthash as fh
from osmnetfusion_spark.operators import dedup
from osmnetfusion_spark.operators.textstats import (
    LANGS, lang_id, poly_hash, poly_hash64, tokens_col,
)

TEXTS = [
    None, "", "   ", "a", "one two", "x y z w v u t s",
    "the the the the and and of",
    "Hello, World! 123 -- mixed CASE and punct...",
    "a b c d e f g h i j k l m n o p",
    "dup dup dup dup dup dup dup dup dup",
    "tab\tand\nnewline separated tokens here okay",
    "café naïve résumé unicode separators",
    "0 1 2 3 4 5 6 7 8 9 10 11 12",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(TEXTS)), "text": TEXTS})
    ).localCheckpoint()


def test_shingle_kernel_matches_column_definition(spark, docs):
    col = docs.select(
        "doc_id", dedup.shingle_hashes(F.col("text"), 3).alias("sh")
    ).orderBy("doc_id").collect()
    ker = docs.select(
        "doc_id", dedup.shingle_hashes_fast(3)(F.col("text")).alias("sh")
    ).orderBy("doc_id").collect()
    assert [(r.doc_id, list(r.sh)) for r in col] == [
        (r.doc_id, list(r.sh)) for r in ker
    ]


def test_span_kernel_matches_exact_mode(spark, docs):
    """exact=True keys by raw window strings (collision-free); the poly64
    kernel must produce the same per-doc dup statistics."""
    a = dedup.span_dedup(docs, w=3, exact=True).orderBy("doc_id").collect()
    b = dedup.span_dedup(docs, w=3, exact=False).orderBy("doc_id").collect()
    assert [(r.doc_id, r.n_windows, r.dup_windows, r.dup_span_frac) for r in a] == [
        (r.doc_id, r.n_windows, r.dup_windows, r.dup_span_frac) for r in b
    ]


def test_span_kernel_values_match_column_poly64_windows(spark, docs):
    """Window keys themselves (not just the stats) match the column-side
    per-window poly64 fold the oracle computes."""
    toks = tokens_col(F.col("text"))
    n = F.size(toks)
    w = 3
    key = lambda i: F.concat_ws("\x1f", F.slice(toks, i, w))  # noqa: E731
    wins = F.when(
        n - (w - 1) >= 1,
        F.transform(
            F.sequence(F.lit(1), n - (w - 1)),
            lambda i: poly_hash64(key(i)) * F.lit(0) + _win_poly64(toks, i, w),
        ),
    ).otherwise(F.array().cast("array<long>"))
    col = docs.select("doc_id", wins.alias("k")).orderBy("doc_id").collect()
    from osmnetfusion_spark.operators._fasthash import span_keys_kernel

    ker = docs.select(
        "doc_id", span_keys_kernel(w)(F.col("text")).alias("k")
    ).orderBy("doc_id").collect()
    assert [(r.doc_id, list(r.k)) for r in col] == [
        (r.doc_id, list(r.k)) for r in ker
    ]


def _win_poly64(toks, i, w):
    """Direct per-window fold of per-token poly64 residues (the oracle's
    definition of the span window key)."""
    from osmnetfusion_spark.operators.textstats import (
        POLY_BASE, POLY_BASE2, POLY_MOD, POLY_MOD2,
    )

    window = F.slice(toks, i, w)
    r1 = F.aggregate(
        window,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * POLY_BASE + poly_hash64(t) % POLY_MOD) % POLY_MOD,
    )
    r2 = F.aggregate(
        window,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * POLY_BASE2 + poly_hash64(t) % POLY_MOD2) % POLY_MOD2,
    )
    return r1 * F.lit(POLY_MOD2).cast("long") + r2


def test_cdc_kernel_matches_column_construction(spark, docs):
    """Chunk keys match the old posexplode + window-cumsum + collect_list
    construction (rebuilt here column-side)."""
    from pyspark.sql import Window

    avg = 4
    toks = tokens_col(F.col("text"))
    tok = docs.select(
        F.col("doc_id").alias("__did"), F.posexplode(toks).alias("pos", "tok")
    )
    bnd = (poly_hash(F.col("tok")) % avg == 0).cast("long")
    w = (
        Window.partitionBy("__did").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_cid = tok.select(
        "__did", "pos", "tok", F.coalesce(F.sum(bnd).over(w), F.lit(0)).alias("cid")
    )
    chunks_old = (
        with_cid.groupBy("__did", "cid")
        .agg(
            F.concat_ws(
                "\x1f",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ),
            ).alias("chunk")
        )
        .select("__did", poly_hash64(F.col("chunk")).alias("ckey"))
    )
    old = sorted((r["__did"], r["ckey"]) for r in chunks_old.collect())
    from osmnetfusion_spark.operators._fasthash import cdc_keys_kernel

    new = sorted(
        (r.doc_id, k)
        for r in docs.select(
            "doc_id", cdc_keys_kernel(avg)(F.col("text")).alias("ks")
        ).collect()
        for k in r.ks
    )
    assert old == new


def test_lang_stats_kernel_matches_column_lang_id(spark, docs):
    from osmnetfusion_spark.operators._fasthash import lang_stats_kernel

    col = docs.select(
        "doc_id",
        lang_id(F.col("text")).alias("lang_pred"),
        F.size(tokens_col(F.col("text"))).cast("long").alias("n_tokens"),
    ).orderBy("doc_id").collect()
    ker = docs.select(
        "doc_id", lang_stats_kernel()(F.col("text")).alias("st")
    ).orderBy("doc_id").collect()
    assert [(r.doc_id, r.lang_pred, r.n_tokens) for r in col] == [
        (r.doc_id, r.st.lang_pred, r.st.n_tokens) for r in ker
    ]
    assert len(LANGS) == 4  # guard: stopword families unchanged


def test_minhash_kernel_matches_rehash_minima(spark, docs):
    from osmnetfusion_spark.operators._fasthash import minhash_kernel

    base = docs.select(
        "doc_id", dedup.shingle_hashes_fast(3)(F.col("text")).alias("__sh")
    ).filter(F.size("__sh") > 0)

    def mh(i):
        a, b = dedup.MINHASH_A[i], dedup.MINHASH_B[i]
        return F.array_min(
            F.transform(
                F.col("__sh"), lambda h: (F.lit(a) * h + F.lit(b)) % dedup.POLY_MOD
            )
        ).alias(f"mh_{i}")

    col = base.select("doc_id", *[mh(i) for i in range(8)]).orderBy("doc_id").collect()
    k = minhash_kernel(3, 8, dedup.MINHASH_A, dedup.MINHASH_B, dedup.POLY_MOD)
    ker = (
        docs.select("doc_id", k(F.col("text")).alias("m"))
        .filter(F.col("m.mh_0").isNotNull())
        .orderBy("doc_id")
        .collect()
    )
    assert [(r.doc_id, *[r[f"mh_{i}"] for i in range(8)]) for r in col] == [
        (r.doc_id, *[r.m[f"mh_{i}"] for i in range(8)]) for r in ker
    ]
