"""MinHash-LSH banding: candidate recall + exact-Jaccard verification.

Also a regression pin for the band-hash fold overflow: the original
``acc * POLY_MOD`` fold against a 2^61-1 modulus overflowed 64-bit longs
under ANSI mode as soon as a band had >= 2 rows.
"""

from pyspark.sql import functions as F

from osmnetfusion_spark.operators import dedup


def _docs(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),  # exact dup of 1
        (3, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),  # near dup
        (4, "completely different words nothing shared here at all folks"),
        (5, "yet another unrelated document with its own vocabulary set"),
        (6, "completely different words nothing shared here at all folks"),  # dup of 4
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lsh_candidates_recall_exact_dups(spark):
    """Identical texts (Jaccard 1.0) share every band hash, so LSH must
    surface ALL exact-duplicate pairs with jaccard == 1.0; every reported
    jaccard must match the exact shingle-set computation."""
    d = _docs(spark)
    lsh = dedup.lsh_candidate_pairs(d, num_hashes=16, bands=4).collect()
    got = {(r.id_a, r.id_b): r.jaccard for r in lsh}

    assert got.get((1, 2)) == 1.0
    assert got.get((4, 6)) == 1.0
    # the near-dup (8/12 shared 3-gram shingles) should bucket together too
    assert (1, 3) in got and 0 < got[(1, 3)] < 1.0

    # every reported jaccard matches the exact shingle-set definition
    sh = {
        r.doc_id: set(r.sh)
        for r in d.select(
            "doc_id", dedup.shingle_hashes_fast(3)(F.col("text")).alias("sh")
        ).collect()
    }
    for (a, b), j in got.items():
        inter = len(sh[a] & sh[b])
        union = len(sh[a] | sh[b])
        assert j == round(inter / union, 6), (a, b)


def test_lsh_scales_without_overflow(spark):
    """Many docs through the band fold (ANSI mode): no long overflow, and
    unrelated docs do not flood the candidate set."""
    base = spark.range(0, 400).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("doc "), F.col("id").cast("string"),
            F.lit(" body token"), (F.col("id") % 7).cast("string"),
            F.lit(" filler words vary "), (F.col("id") * 31 % 97).cast("string"),
            F.lit(" tail "), (F.col("id") * 17 % 89).cast("string"),
        ).alias("text"),
    )
    out = dedup.lsh_candidate_pairs(base, num_hashes=16, bands=4)
    n = out.count()
    assert n < 400 * 20, f"candidate explosion: {n}"


def test_near_dup_lsh_pair_recall(spark):
    """LSH-candidate near-dup scale path vs the exact blocked product on
    sf0.01: perfect precision by construction (exact-cosine verify), and
    pair recall >= 0.95 at the default planes=3 x 16 tables (measured
    0.991; threshold pairs sit right AT the cos 0.30 margin, the hardest
    recall regime). Deterministic -- fixed planes, fixed data."""
    from osmnetfusion_spark.operators import similarity

    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    exact = {
        (r.id_a, r.id_b)
        for r in similarity.embedding_near_dup_pairs(e, threshold=0.30).collect()
    }
    approx = {
        (r.id_a, r.id_b)
        for r in similarity.embedding_near_dup_pairs_lsh(e, threshold=0.30).collect()
    }
    assert approx <= exact  # exact verify => no false positives
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.95, f"pair recall {recall:.3f} < 0.95 ({len(exact)} exact pairs)"


def test_contamination_check_semantics(spark):
    """Crafted corpus: exact copy of a benchmark item -> full overlap;
    partial rewrite -> counted shared n-grams only; disjoint text -> no
    row; self-pairs excluded; min_overlap threshold enforced."""
    from osmnetfusion_spark.operators import dedup

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),     # copy of bench 100
            (2, "alpha beta gamma delta nine ten eleven"),  # shares 2 3-grams
            (3, "one two three four five six"),             # disjoint
            (100, "alpha beta gamma delta epsilon zeta"),   # the bench itself
        ],
        "doc_id long, text string",
    )
    bench = docs.filter("doc_id = 100").selectExpr("doc_id AS bench_id", "text")
    out = {
        (r.doc_id, r.bench_id): (r.n_overlap, r.doc_ngrams)
        for r in dedup.contamination_check(docs, bench, n=3, min_overlap=2).collect()
    }
    # doc 1: 4 distinct 3-grams, all shared; doc 2: shares exactly the 2
    # leading 3-grams; doc 3 and the self-pair (100,100) must not appear
    assert out == {(1, 100): (4, 4), (2, 100): (2, 5)}

    strict = dedup.contamination_check(docs, bench, n=3, min_overlap=3).collect()
    assert {(r.doc_id, r.bench_id) for r in strict} == {(1, 100)}


def test_ann_lsh_recall_vs_exact(spark):
    """ANN quality gate (VERDICT r2 #7): recall@5 vs exact cosine top-5
    on the sf0.01 embeddings. These embeddings are the realistic hard
    regime -- true neighbors sit at cos ~0.25-0.49 (per-plane collision
    ~0.6), so a single table tops out near 0.3 recall at any bounded
    probe width; the multi-table path is the scale answer. All values are
    deterministic (fixed plane weights, fixed data), so the margins pin
    parameter/wiring regressions, not noise. Measured at HEAD:
    single-table (contract params) 0.292; planes=4 x 12 tables 1.000;
    hamming-2 probes lift planes=6 x 8 tables 0.888 -> 1.000."""
    from pyspark.sql import functions as F

    from osmnetfusion_spark.operators import similarity

    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 50)

    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk(e, q, k=5).collect()
    }

    def recall(planes, probe_hamming, tables):
        got = {
            (r.query_id, r.neighbor_id)
            for r in similarity.lsh_bucket_topk(
                e, q, k=5, planes=planes,
                probe_hamming=probe_hamming, tables=tables,
            ).collect()
        }
        return len(got & exact) / len(exact)

    # the documented scale configuration clears 0.9 with margin
    r_scale = recall(4, 1, 12)
    assert r_scale >= 0.9, f"scale-path recall@5 dropped to {r_scale:.3f}"

    # single-table contract path: low by nature on this corpus, but a
    # bucket-hash or probe regression would drop it toward ~1/2^planes
    r_single = recall(6, 1, 1)
    assert 0.15 <= r_single < r_scale, (
        f"single-table recall {r_single:.3f} out of expected band"
    )

    # hamming-2 probes must actually widen the candidate set (the old
    # probe generator silently ignored probe_hamming=2)
    r_h1, r_h2 = recall(6, 1, 8), recall(6, 2, 8)
    assert r_h2 >= r_h1, f"hamming-2 probes lost recall: {r_h2:.3f} < {r_h1:.3f}"
    assert r_h2 >= 0.95, f"planes=6 x 8 tables x hamming<=2 recall {r_h2:.3f}"


def test_ann_ivf_recall_and_exactness_in_probed_buckets(spark):
    """IVF quality gate: (a) the recall@5-vs-exact curve over nprobe must
    be monotone and sit well above the random-bucket baseline
    (nprobe/nlist) -- the sf0.01 embeddings are near-random (true
    neighbors at cos ~0.25-0.49), so an arbitrary 16-vector codebook
    partitions weakly and the honest signal is "beats random by >=2x",
    not a high absolute recall.  Deterministic data + deterministic
    assignment make the measured points (0.224 / 0.328 / 0.532 at
    nprobe=1/2/4, random = 0.0625 / 0.125 / 0.25) reproducible, so the
    margins pin quantizer/probe regressions; (b) raising nprobe to the
    full codebook must recover the exact result EXACTLY (IVF with all
    buckets probed degenerates to the brute-force scan)."""
    from pyspark.sql import functions as F

    from osmnetfusion_spark.operators import similarity

    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    cents = e.filter(F.col("vec_id") < 16)
    q = e.filter((F.col("vec_id") >= 16) & (F.col("vec_id") < 66))

    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk(e, q, k=5).collect()
    }

    def recall(nprobe):
        ivf = {
            (r.query_id, r.neighbor_id)
            for r in similarity.ivf_topk(
                e, q, cents, k=5, nprobe=nprobe
            ).collect()
        }
        return len(ivf & exact) / len(exact)

    r1, r2, r4 = recall(1), recall(2), recall(4)
    assert r1 <= r2 <= r4, f"recall not monotone in nprobe: {r1} {r2} {r4}"
    assert r1 >= 0.12, f"nprobe=1 recall {r1:.3f} < 2x random (0.0625)"
    assert r2 >= 0.25, f"nprobe=2 recall {r2:.3f} < 2x random (0.125)"
    assert r4 >= 0.45, f"nprobe=4 recall {r4:.3f} (measured 0.532)"

    ivf_all = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ivf_topk(e, q, cents, k=5, nprobe=16).collect()
    }
    assert ivf_all == exact, "nprobe=|codebook| must equal the exact scan"


def test_ann_ivf_codebook_cap(spark):
    import pytest
    from pyspark.sql import functions as F

    from osmnetfusion_spark.operators import similarity

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    with pytest.raises(ValueError, match="max_centroids"):
        similarity.ivf_topk(e, e.limit(1), e, max_centroids=3)


def test_line_dedup_boilerplate_removal(spark):
    """Crafted corpus: a cookie banner + footer repeat across all docs
    (df=4 > max_df=2) and must vanish; unique content lines survive in
    original order; doc 3 (all boilerplate) drops out entirely; empty
    lines are ignored."""
    from osmnetfusion_spark.operators import dedup

    banner, footer = "ACCEPT COOKIES", "(c) example.com"
    rows = [
        (0, f"{banner}\nalpha one\n\nbeta two\n{footer}"),
        (1, f"{banner}\ngamma three\n{footer}"),
        (2, f"{banner}\ndelta four\nalpha one\n{footer}"),
        (3, f"{banner}\n{footer}"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in dedup.line_dedup(df, max_df=2, sep="\n").collect()
    }
    assert set(out) == {0, 1, 2}  # doc 3 was pure boilerplate
    assert out[0].text_dedup == "alpha one\nbeta two"
    assert out[0].n_lines_kept == 2
    assert out[1].text_dedup == "gamma three"
    # 'alpha one' appears in 2 docs == max_df -> kept
    assert out[2].text_dedup == "delta four\nalpha one"


def test_semantic_dedup_crafted(spark):
    """SemDeDup semantics on a crafted set: b duplicates a (same
    direction), d duplicates c; e is alone in its cluster; attribution
    is the smallest lower-id mate; repartition-invariant."""
    import numpy as np
    import pandas as pd
    from osmnetfusion_spark.operators import similarity as SIM

    rows = {
        0: [1.0, 0.0, 0.0],          # centroid A / canonical
        1: [0.999, 0.01, 0.0],       # dup of 0
        2: [0.998, -0.01, 0.0],      # dup of 0 (min attribution, not 1)
        10: [0.0, 1.0, 0.0],         # centroid B / canonical
        11: [0.01, 0.999, 0.0],      # dup of 10
        20: [0.0, 0.0, 1.0],         # centroid C, alone
    }
    pdf = pd.DataFrame(
        {"vec_id": list(rows), "embedding": [np.array(v, dtype=np.float32) for v in rows.values()]}
    )
    e = spark.createDataFrame(pdf)
    cents = e.filter("vec_id in (0, 10, 20)")
    out = {r.vec_id: r for r in SIM.semantic_dedup(e, cents, threshold=0.99).collect()}
    assert out[0].keep and out[0].dup_of is None
    assert out[1].dup_of == 0 and not out[1].keep
    assert out[2].dup_of == 0          # min lower-id mate, not 1
    assert out[11].dup_of == 10
    assert out[20].keep
    out2 = {
        r.vec_id: (r.dup_of, r.keep)
        for r in SIM.semantic_dedup(e.repartition(5), cents, threshold=0.99).collect()
    }
    assert out2 == {k: (v.dup_of, v.keep) for k, v in out.items()}
    # keep-rate sanity on the real table: dedup never drops everything
    real = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rc = SIM.semantic_dedup(real, real.filter("vec_id < 8"), threshold=0.30)
    kept = rc.filter("keep").count()
    assert 0 < kept < rc.count()
