"""PII scrubbing for web-text corpora.

Training-data releases redact personally identifiable information before
publication (the C4 / Dolma / FineWeb pipelines all carry an email/IP
/phone scrub stage).  This module implements it as pure JVM column
expressions -- ``regexp_count`` on the raw text for the audit counts and
a fixed cascade of ``regexp_replace`` for the scrub -- so the hot path
stays inside whole-stage codegen with zero Python.

The patterns are deliberately restricted to the regex subset whose
semantics agree between Java's engine and RE2 (no backreferences, no
lookaround, leftmost-first alternation-free), so a DuckDB oracle can
replay the cascade byte-for-byte; the contract proves byte-identical
redacted text via the shared 64-bit polynomial fingerprint.

Scale shape: per-row narrow expressions only -- no shuffle, no UDF, no
state; the operator composes with any scan and pushes through column
pruning. Regex cost is linear in text bytes (RE2-class patterns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import poly_hash64, poly_hash64_sql

__all__ = ["PII_PATTERNS", "pii_redact", "pii_redact_sql_columns"]

# (name, pattern, replacement) -- cascade order is part of the contract:
# an email containing an IP-shaped host is consumed by the email rule
# before the IP rule sees it. Patterns restricted to the Java/RE2-agreeing
# subset (character classes, bounded repeats, \b).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d[\d ]{6,}\d", "<PHONE>"),
]


def pii_redact(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_text: bool = False,
) -> DataFrame:
    """Count and scrub emails / IPv4s / phone numbers.

    Output: ``(id, n_email, n_ipv4, n_phone, redacted_fp)`` -- counts
    are taken on the ORIGINAL text (the audit number a release report
    quotes), the fingerprint is `poly_hash64` of the text after the full
    replacement cascade (order: email, ipv4, phone). With
    ``keep_text=True`` the redacted string itself is kept as
    ``redacted`` (the production path; the contract ships the 8-byte
    fingerprint instead to keep the compare payload small).
    """
    t = F.col(text_col)
    counts = [
        F.regexp_count(t, F.lit(pat)).cast("long").alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    red = t
    for _, pat, rep in PII_PATTERNS:
        red = F.regexp_replace(red, pat, rep)
    cols = [F.col(id_col), *counts, poly_hash64(red).alias("redacted_fp")]
    if keep_text:
        cols.append(red.alias("redacted"))
    return df.select(*cols)


def pii_redact_sql_columns(text: str) -> dict[str, str]:
    """DuckDB twin expressions keyed by output column name."""
    out = {}
    red = text
    for name, pat, rep in PII_PATTERNS:
        # standard SQL string literal: backslash is literal, only quotes
        # need doubling (DuckDB is not in C-escape mode)
        esc = pat.replace("'", "''")
        out[f"n_{name}"] = (
            f"CAST(length(regexp_extract_all({text}, '{esc}')) AS BIGINT)"
        )
        red = f"regexp_replace({red}, '{esc}', '{rep}', 'g')"
    out["redacted_fp"] = poly_hash64_sql(red)
    return out


def ccnet_buckets(
    docs: DataFrame,
    alpha: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): split each
    language's documents into head / middle / tail by the per-language
    terciles of the bigram-LM negative log-likelihood -- the decision
    rule CCNet uses to keep the fluent third of every language and
    discard (or down-weight) the rest.

    Composition of two existing operators: :func:`~..textstats.lm_score`
    for the per-doc NLL and
    :func:`~.quantiles.grouped_quantiles` for the per-language tercile
    thresholds, joined back and compared ON THE ROUNDED values (both
    sides 6 dp) so the bucket boundary can never flip on a last-ulp
    difference.  Output: ``(doc_id, lang, nll, bucket)`` for every doc
    with >= 2 word tokens.

    Scale shape: lm_score's groupBys + one histogram-quantile pass per
    language (bounded by distinct rounded NLL values) + one
    lang-keyed equi-join of per-doc rows against a #langs-row threshold
    table (AQE broadcasts it).  No window over docs, no driver loop.
    """
    from .textstats import lm_score
    from .quantiles import grouped_quantiles

    scored = lm_score(docs, alpha=alpha, text_col=text_col, doc_id=id_col)
    with_lang = scored.join(
        docs.select(F.col(id_col), F.col(lang_col)), id_col
    )
    thr = grouped_quantiles(
        with_lang, [lang_col], "nll", [1.0 / 3.0, 2.0 / 3.0], ["q33", "q66"]
    ).select(lang_col, "q33", "q66")
    return (
        with_lang.join(thr, lang_col)
        .select(
            F.col(id_col),
            F.col(lang_col),
            "nll",
            F.when(F.col("nll") <= F.col("q33"), F.lit("head"))
            .when(F.col("nll") <= F.col("q66"), F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("bucket"),
        )
    )
