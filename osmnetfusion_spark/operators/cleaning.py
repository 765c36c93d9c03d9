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
    language + one lang-keyed equi-join of per-doc rows against a
    #langs-row threshold table (AQE broadcasts it).  No window over
    docs, no driver loop.  The quantile histogram's per-language state
    is bounded by the DISTINCT 6dp-rounded NLL values, and NLL is
    physically bounded (~[0, 30] nats for any real corpus/vocab), so
    the histogram caps at ~3e7 rows per language INDEPENDENT of corpus
    size -- the grouped_quantiles "bucket first" precondition holds by
    construction here.
    """
    from .textstats import lm_score
    from .quantiles import grouped_quantiles

    scored = lm_score(docs, alpha=alpha, text_col=text_col, doc_id=id_col)
    with_lang = scored.join(
        docs.select(F.col(id_col), F.col(lang_col)), id_col
    # consumed twice (threshold derivation + final bucket join): lazily
    # checkpoint so the lm_score DAG executes once, not twice
    ).localCheckpoint(eager=False)
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


# Gopher quality-rule thresholds (Rae et al. 2021, table A1 subset --
# the deterministic, lexicon-free rules). Parameters of gopher_rules.
GOPHER_DEFAULTS = dict(
    min_words=20, max_words=100_000,
    min_mean_word_len=2.0, max_mean_word_len=10.0,
    max_symbol_ratio=0.1, max_bullet_frac=0.9, max_ellipsis_frac=0.3,
    min_alpha_frac=0.8, min_stop_hits=2,
)


def gopher_rules(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    **thresholds,
) -> DataFrame:
    """Gopher repetition-free quality rules (Rae et al. 2021): the
    deterministic document-shape gates every modern web-corpus pipeline
    reuses (Gopher -> MassiveText -> RefinedWeb -> Dolma/FineWeb):
    word-count bounds, mean-word-length bounds, symbol-to-word ratio
    (``#`` and ellipses), bullet-line and ellipsis-line fractions,
    alphabetic-word fraction, and a minimum count of DISTINCT stopwords.

    Output: per-doc metrics (rounded 6 dp), one boolean per rule, and
    ``gopher_pass`` = AND of all rules.  Thresholds overridable by
    keyword (defaults :data:`GOPHER_DEFAULTS`).

    Scale shape: pure narrow JVM column expressions over the text --
    no shuffle, no UDF, no state; composes with scan pruning like
    `pii_redact`.
    """
    from .textstats import LANGS, STOPWORDS, tokens_col

    th = dict(GOPHER_DEFAULTS)
    unknown = set(thresholds) - set(th)
    if unknown:
        raise ValueError(f"unknown gopher thresholds: {sorted(unknown)}")
    th.update(thresholds)

    t = F.col(text_col)
    toks = tokens_col(t)
    n_words = F.size(toks).cast("long")
    safe_n = F.greatest(n_words, F.lit(1))
    mean_wl = F.round(
        F.aggregate(toks, F.lit(0).cast("long"), lambda a, w: a + F.length(w))
        / safe_n, 6)
    n_sym = (
        F.length(t) - F.length(F.regexp_replace(t, r"#", ""))
        + (F.length(t) - F.length(F.regexp_replace(t, r"\.\.\.", ""))) / F.lit(3)
        + F.length(t) - F.length(F.regexp_replace(t, "…", ""))
    )
    sym_ratio = F.round(n_sym.cast("double") / safe_n, 6)
    lines = F.split(t, "\n")
    n_lines = F.greatest(F.size(lines), F.lit(1))
    is_bullet = lambda l: (  # noqa: E731
        F.ltrim(l).startswith("- ") | F.ltrim(l).startswith("* ")
        | F.ltrim(l).startswith("•")
    )
    bullet_frac = F.round(
        F.size(F.filter(lines, is_bullet)).cast("double") / n_lines, 6)
    is_ell = lambda l: F.rtrim(l).endswith("...") | F.rtrim(l).endswith("…")  # noqa: E731
    ellipsis_frac = F.round(
        F.size(F.filter(lines, is_ell)).cast("double") / n_lines, 6)
    alpha_frac = F.round(
        F.size(F.filter(toks, lambda w: w.rlike("[a-z]"))).cast("double")
        / safe_n, 6)
    all_stop = F.array(*[F.lit(w) for lg in LANGS for w in STOPWORDS[lg]])
    stop_hits = F.size(F.array_intersect(toks, all_stop)).cast("long")

    flags = {
        "ok_words": (n_words >= th["min_words"]) & (n_words <= th["max_words"]),
        "ok_mean_len": (mean_wl >= th["min_mean_word_len"])
        & (mean_wl <= th["max_mean_word_len"]),
        "ok_symbols": sym_ratio <= th["max_symbol_ratio"],
        "ok_bullets": bullet_frac <= th["max_bullet_frac"],
        "ok_ellipsis": ellipsis_frac <= th["max_ellipsis_frac"],
        "ok_alpha": alpha_frac >= th["min_alpha_frac"],
        "ok_stop": stop_hits >= th["min_stop_hits"],
    }
    gopher_pass = F.lit(True)
    for f in flags.values():
        gopher_pass = gopher_pass & f
    return docs.select(
        F.col(id_col),
        n_words.alias("n_words"), mean_wl.alias("mean_word_len"),
        sym_ratio.alias("symbol_ratio"), bullet_frac.alias("bullet_frac"),
        ellipsis_frac.alias("ellipsis_frac"), alpha_frac.alias("alpha_frac"),
        stop_hits.alias("stop_hits"),
        *[c.alias(n) for n, c in flags.items()],
        gopher_pass.alias("gopher_pass"),
    )


def gopher_rules_sql(text: str, **thresholds) -> dict[str, str]:
    """DuckDB twin expressions for :func:`gopher_rules`, same names."""
    from .textstats import LANGS, STOPWORDS, tokens_sql

    th = dict(GOPHER_DEFAULTS)
    th.update(thresholds)
    toks = tokens_sql(text)
    n_words = f"CAST(length({toks}) AS BIGINT)"
    safe_n = f"greatest({n_words}, 1)"
    wl_sum = (
        f"list_reduce(list_prepend(0::BIGINT, "
        f"list_transform({toks}, w -> length(w)::BIGINT)), (a,b) -> a + b)"
    )
    mean_wl = f"round({wl_sum} * 1.0 / {safe_n}, 6)"
    # chr(8230) = the Unicode ellipsis character (ASCII-only SQL text)
    n_sym = (
        f"(length({text}) - length(replace({text}, '#', ''))"
        f" + (length({text}) - length(replace({text}, '...', ''))) / 3"
        f" + length({text}) - length(replace({text}, chr(8230), '')))"
    )
    sym_ratio = f"round(CAST({n_sym} AS DOUBLE) / {safe_n}, 6)"
    lines = f"string_split({text}, chr(10))"
    n_lines = f"greatest(length({lines}), 1)"
    bullet = (
        f"length(list_filter({lines}, l -> starts_with(ltrim(l), '- ')"
        f" OR starts_with(ltrim(l), '* ') OR starts_with(ltrim(l), chr(8226))))"
    )
    bullet_frac = f"round(CAST({bullet} AS DOUBLE) / {n_lines}, 6)"
    ell = (
        f"length(list_filter({lines}, l -> ends_with(rtrim(l), '...')"
        f" OR ends_with(rtrim(l), chr(8230))))"
    )
    ellipsis_frac = f"round(CAST({ell} AS DOUBLE) / {n_lines}, 6)"
    alpha = (
        f"length(list_filter({toks}, w -> regexp_matches(w, '[a-z]')))"
    )
    alpha_frac = f"round(CAST({alpha} AS DOUBLE) / {safe_n}, 6)"
    all_stop = "[" + ", ".join(
        f"'{w}'" for lg in LANGS for w in STOPWORDS[lg]
    ) + "]"
    stop_hits = (
        f"CAST(length(list_distinct(list_filter({toks},"
        f" t -> list_contains({all_stop}, t)))) AS BIGINT)"
    )
    flags = {
        "ok_words": f"({n_words} >= {th['min_words']} AND {n_words} <= {th['max_words']})",
        "ok_mean_len": f"({mean_wl} >= {th['min_mean_word_len']} AND {mean_wl} <= {th['max_mean_word_len']})",
        "ok_symbols": f"({sym_ratio} <= {th['max_symbol_ratio']})",
        "ok_bullets": f"({bullet_frac} <= {th['max_bullet_frac']})",
        "ok_ellipsis": f"({ellipsis_frac} <= {th['max_ellipsis_frac']})",
        "ok_alpha": f"({alpha_frac} >= {th['min_alpha_frac']})",
        "ok_stop": f"({stop_hits} >= {th['min_stop_hits']})",
    }
    out = {
        "n_words": n_words, "mean_word_len": mean_wl,
        "symbol_ratio": sym_ratio, "bullet_frac": bullet_frac,
        "ellipsis_frac": ellipsis_frac, "alpha_frac": alpha_frac,
        "stop_hits": stop_hits, **flags,
        "gopher_pass": "(" + " AND ".join(flags.values()) + ")",
    }
    return out
