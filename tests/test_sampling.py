"""Deterministic sampling + packing: statistical sanity, exact
reproducibility under repartitioning, and packing invariants."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from osmnetfusion_spark.operators import sampling


@pytest.fixture(scope="module")
def docs(spark):
    rng = np.random.default_rng(5)
    pdf = pd.DataFrame({
        "doc_id": np.arange(10_000),
        "domain": rng.integers(0, 7, 10_000),
        "n_tokens": rng.integers(1, 900, 10_000),
    })
    return spark.createDataFrame(pdf)


def test_sample_rate_unbiased_and_stable(docs):
    out = sampling.sample_rate(docs, "doc_id", 0.2)
    n = out.count()
    assert abs(n / 10_000 - 0.2) < 0.02  # uniformity of the hash
    # partitioning-invariant: identical id set at any layout
    ids1 = {r.doc_id for r in out.collect()}
    ids2 = {
        r.doc_id
        for r in sampling.sample_rate(docs.repartition(17), "doc_id", 0.2).collect()
    }
    assert ids1 == ids2
    # nested rates: the 10% sample is a subset of the 20% sample
    ids_small = {
        r.doc_id for r in sampling.sample_rate(docs, "doc_id", 0.1).collect()
    }
    assert ids_small <= ids1


def test_sample_rate_bounds(docs):
    assert sampling.sample_rate(docs, "doc_id", 0.0).count() == 0
    assert sampling.sample_rate(docs, "doc_id", 1.0).count() == 10_000
    with pytest.raises(ValueError, match="rate"):
        sampling.sample_rate(docs, "doc_id", 1.5)


def test_sample_weighted_rates_and_nesting(docs):
    w = (
        F.when(F.col("domain") < 2, F.lit(0.5))
        .when(F.col("domain") < 4, F.lit(0.25))
        .otherwise(F.lit(1.0))
    )
    out = sampling.sample_weighted(
        docs.withColumn("w", w), "doc_id", "w"
    ).toPandas()
    rates = out.groupby("domain").size() / 10_000 * 7  # ~1428 docs/domain
    for dom, want in [(0, 0.5), (1, 0.5), (2, 0.25), (3, 0.25), (4, 1.0)]:
        assert abs(rates[dom] - want) < 0.06, (dom, rates[dom])
    # weight monotonicity: every row kept at w=0.25 is kept at w=0.5
    k25 = {r.doc_id for r in sampling.sample_weighted(
        docs.withColumn("w", F.lit(0.25)), "doc_id", "w").collect()}
    k50 = {r.doc_id for r in sampling.sample_weighted(
        docs.withColumn("w", F.lit(0.5)), "doc_id", "w").collect()}
    assert k25 <= k50
    # w=1.0 keeps everything, w=0.0 nothing
    assert sampling.sample_weighted(
        docs.withColumn("w", F.lit(1.0)), "doc_id", "w").count() == 10_000
    assert sampling.sample_weighted(
        docs.withColumn("w", F.lit(0.0)), "doc_id", "w").count() == 0


def test_knuth_hash_large_and_negative_ids(spark):
    """Overflow regression: ids >= ~3.47e9 (real OSM node ids) overflowed
    the naive id*KNUTH under signed 64-bit; the split multiply must stay
    in [0, 2^32) for the whole long domain and agree with Python's exact
    arithmetic (and hence with the small-id oracle formula)."""
    ids = [0, 1, 12_000_000_000, 3_474_652_830, 2**62, -1, -12_000_000_000]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r.doc_id: r.h
        for r in df.select("doc_id", sampling.knuth_hash("doc_id").alias("h")).collect()
    }
    for i in ids:
        want = ((i % sampling.M32) * sampling.KNUTH) % sampling.M32
        assert got[i] == want, (i, got[i], want)
        assert 0 <= got[i] < sampling.M32
    # and the samplers accept such ids without ANSI overflow
    assert sampling.sample_rate(df, "doc_id", 0.5).count() <= len(ids)


def test_sample_weighted_null_and_range_handling(spark):
    pdf = pd.DataFrame({"doc_id": [1, 2, 3], "w": [0.5, None, 1.0]})
    df = spark.createDataFrame(pdf)
    # default: a NULL weight is a data bug -> evaluation-time error
    with pytest.raises(Exception, match="NULL weight"):
        sampling.sample_weighted(df, "doc_id", "w").count()
    # explicit policies
    kept = sampling.sample_weighted(df, "doc_id", "w", on_null="keep")
    assert 2 in {r.doc_id for r in kept.collect()}
    dropped = sampling.sample_weighted(df, "doc_id", "w", on_null="drop")
    assert 2 not in {r.doc_id for r in dropped.collect()}
    # out-of-range weights always raise
    bad = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "w": [1.5]}))
    with pytest.raises(Exception, match="out of"):
        sampling.sample_weighted(bad, "doc_id", "w").count()
    with pytest.raises(ValueError, match="on_null"):
        sampling.sample_weighted(df, "doc_id", "w", on_null="ignore")


def test_sample_per_group_exact_k_and_stable(docs):
    out = sampling.sample_per_group(docs, "domain", "doc_id", 50).toPandas()
    sizes = out.groupby("domain").size()
    assert (sizes == 50).all()  # every domain has >50 docs at this seed
    again = sampling.sample_per_group(
        docs.repartition(13), "domain", "doc_id", 50
    ).toPandas()
    assert set(map(tuple, out[["domain", "doc_id"]].values)) == set(
        map(tuple, again[["domain", "doc_id"]].values)
    )


def test_sample_per_group_small_group(spark):
    pdf = pd.DataFrame({"doc_id": [1, 2, 3], "g": [0, 0, 1]})
    out = sampling.sample_per_group(
        spark.createDataFrame(pdf), "g", "doc_id", 10
    ).count()
    assert out == 3  # min(k, |group|)


def test_pack_sequences_invariants(docs):
    out = sampling.pack_sequences(
        docs, "n_tokens", "doc_id", budget=8192, pack_keys="domain"
    ).toPandas()
    assert len(out) == 10_000  # every row packed
    # per (domain, pack): concat-then-chunk means each pack's docs start
    # inside its budget window, in layout order
    for (_, pid), g in out.groupby(["domain", "pack_id"]):
        assert (g.pack_offset >= pid * 0).all()
        assert (g.pack_offset < 8192).all()
    # pack ids are dense from 0 per domain
    for _, g in out.groupby("domain"):
        pids = sorted(g.pack_id.unique())
        assert pids[0] == 0 and pids == list(range(len(pids)))
        # total tokens == last pack_id * budget + tail: the running sum
        # reconstructs exactly
        total = g.n_tokens.sum()
        assert total > pids[-1] * 8192  # last window is non-empty


def test_pack_sequences_order_modes_differ(docs):
    a = sampling.pack_sequences(docs, "n_tokens", "doc_id", 8192).toPandas()
    b = sampling.pack_sequences(
        docs, "n_tokens", "doc_id", 8192, order="hash"
    ).toPandas()
    assert not a.sort_values("doc_id").pack_id.equals(
        b.sort_values("doc_id").pack_id
    )
    with pytest.raises(ValueError, match="order"):
        sampling.pack_sequences(docs, "n_tokens", "doc_id", 8192, order="random")


def test_knuth_oracle_sql_matches_engine_on_hard_ids(spark):
    """ADVICE r4: the contract oracle's hash SQL must agree with the
    engine on the id domains the engine was hardened for (>= 3.47e9,
    negative) -- the naive (id*K) % 2^32 overflows BIGINT in DuckDB
    there, silently invalidating the contract if the fixture grows."""
    import duckdb

    from osmnetfusion_spark.driver_contract import _knuth_sql

    ids = [0, 1, 7, 3_474_652_830, 12_000_000_000, 2**62, -1, -12_000_000_000]
    con = duckdb.connect()
    got_sql = {
        i: con.execute(f"SELECT {_knuth_sql(str(i))}").fetchone()[0] for i in ids
    }
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got_engine = {
        r.doc_id: r.h
        for r in df.select("doc_id", sampling.knuth_hash("doc_id").alias("h")).collect()
    }
    for i in ids:
        want = ((i % sampling.M32) * sampling.KNUTH) % sampling.M32
        assert got_sql[i] == want == got_engine[i], (i, got_sql[i], got_engine[i], want)


def test_pack_sequences_exact_past_2_53(spark):
    """ADVICE r4: pack_id must use exact integer floor-div -- double
    division rounds the quotient once the running sum passes 2^53 and
    mis-assigns packs. Lengths ~2^52 push the running sum past 2^55."""
    import pandas as pd

    n, length, budget = 12, 1 << 52, 3_000_001
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(n), "n_tok": [length] * n})
    )
    out = (
        sampling.pack_sequences(df, "n_tok", "doc_id", budget, pack_keys=None,
                                order="hash")
        .orderBy("doc_id").collect()
    )
    # exact python reference over the same layout order
    order = sorted(range(n), key=lambda i: (((i % sampling.M32) * sampling.KNUTH) % sampling.M32, i))
    before, want = 0, {}
    for i in order:
        want[i] = (before // budget, before % budget)
        before += length
    for r in out:
        assert (r.pack_id, r.pack_offset) == want[r.doc_id], (r, want[r.doc_id])


def test_pack_sequences_global_window_warns(spark):
    """pack_keys=None plans a single-task global sort; the footgun must
    warn loudly (VERDICT r4 #5)."""
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1, 2], "n_tok": [3, 4]}))
    with pytest.warns(ResourceWarning, match="single-partition global"):
        sampling.pack_sequences(df, "n_tok", "doc_id", 8, pack_keys=None)
