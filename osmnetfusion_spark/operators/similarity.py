"""Similarity search over embedding columns (array<float>).

- :func:`cosine_topk` -- brute-force exact top-k: broadcast the (small)
  query set against the corpus, dot products via ``zip_with`` +
  ``aggregate`` (JVM-side, no Python), per-query top-k window. The
  correctness baseline.
- :func:`lsh_bucket_topk` -- the scale path: random-hyperplane signature
  buckets the corpus; queries only scan their own + hamming-1 buckets.
  Recall (vs brute force) is asserted in tests, not assumed.
- :func:`embedding_near_dup_pairs` -- cosine >= tau near-dup pairs with
  equality blocking (dedup family member E).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .partitioning import fan_out


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_sql(a: str, b: str) -> str:
    """DuckDB twin; list_cosine_similarity uses the same formula."""
    dot = (
        f"list_reduce(list_prepend(0.0, list_transform(list_zip({a}, {b}), p -> p[1] * p[2])), (x, y) -> x + y)"
    )
    na = f"sqrt(list_reduce(list_prepend(0.0, list_transform({a}, x -> x * x)), (x, y) -> x + y))"
    nb = f"sqrt(list_reduce(list_prepend(0.0, list_transform({b}, x -> x * x)), (x, y) -> x + y))"
    return f"(({dot}) / (({na}) * ({nb})))"


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query (brute force, broadcast queries).

    Shuffle-free scan: corpus partitions stream past the broadcast query
    set; only the top-k window shuffles O(|queries| * k) rows... the window
    partitions by query so the pre-aggregation is the full cross product --
    acceptable because |queries| is small; LSH variant below is the scale
    path.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    c = fan_out(embeddings).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", F.round(cosine(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def hyperplane_signature(
    vec: Column, dim: int, planes: int = 12, plane_offset: int = 0
) -> Column:
    """Deterministic random-hyperplane sign signature (long).

    Plane p, component d has pseudo-random weight
    sin(1 + (p * dim + d) * 12.9898) * 43758.5453 fract -- the classic
    shader-noise construction: deterministic, library-free, identical on
    any platform with IEEE doubles.

    ``plane_offset`` shifts the plane index stream so multiple LSH tables
    (offset = table * planes) draw disjoint pseudo-random plane sets.
    """
    def weight(p: Column, d: Column) -> Column:
        x = (
            F.sin(((p + plane_offset) * dim + d).cast("double") * 12.9898 + 1.0)
            * 43758.5453
        )
        return x - F.floor(x) - 0.5

    sig = F.aggregate(
        F.sequence(F.lit(0), F.lit(planes - 1)),
        F.lit(0).cast("long"),
        lambda acc, p: acc
        + F.when(
            F.aggregate(
                F.zip_with(
                    vec,
                    F.sequence(F.lit(0), F.size(vec) - 1),
                    lambda v, d: v * weight(p, d),
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            > 0,
            F.pow(F.lit(2.0), p.cast("double")).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    return sig


def lsh_bucket_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    planes: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_hamming: int = 1,
    tables: int = 1,
) -> DataFrame:
    """Approximate top-k: hyperplane-bucketed search, multi-probe +
    multi-table.

    Corpus is bucketed once per table by signature (bucket key =
    table << planes | sig, one exploded row per table); each query probes
    its own bucket plus all hamming<=probe_hamming neighbors (1-bit flips,
    and the 2-bit flips when probe_hamming>=2) in every table. Candidate
    volume ~ tables * corpus/2^planes * n_probes; recall measured in
    tests (test_dedup_lsh.py).

    Why multiple tables: for weakly-similar neighbors (cos ~0.3, the
    realistic web-embedding regime -- per-plane collision p ~0.6) a single
    table cannot reach high recall at any candidate-bounded probe width
    (p^planes stays tiny), while L independent tables give
    1-(1-p^planes)^L -- e.g. planes=4, tables=12 => recall ~0.9 at ~2.4x
    corpus candidate volume. ``tables=1`` is bit-identical to the
    pre-multi-table operator (the q_ann_lsh oracle pins that path).
    """
    dim_row = embeddings.select(F.size(vec_col).alias("d")).first()
    dim = dim_row.d

    def sig(col: Column, t: int) -> Column:
        return hyperplane_signature(
            col, dim, planes, plane_offset=t * planes
        ) + F.lit(t << planes).cast("long")

    c = fan_out(embeddings).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn(
        "bucket",
        F.explode(F.array(*[sig(F.col("cv"), t) for t in range(tables)])),
    )
    masks = [0]
    if probe_hamming >= 1:
        masks += [1 << p for p in range(planes)]
    if probe_hamming >= 2:
        masks += [
            (1 << i) | (1 << j)
            for i in range(planes)
            for j in range(i + 1, planes)
        ]
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("qv"),
        )
        .withColumn(
            "tsig",
            F.explode(F.array(*[sig(F.col("qv"), t) for t in range(tables)])),
        )
        .withColumn(
            "bucket",
            F.explode(
                F.array(*[F.col("tsig").bitwiseXOR(F.lit(m)) for m in masks])
            ),
        )
    )
    scored = (
        F.broadcast(q)
        .join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", F.round(cosine(F.col("qv"), F.col("cv")), 6))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.30,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
) -> DataFrame:
    """Near-duplicate pairs: cosine >= threshold, blocked self-join.

    Value-identical to the definitional blocked join
    ``a JOIN b ON blk, id_a < id_b`` + per-pair ``cosine()`` fold, but the
    within-block pair scoring runs as ONE Arrow-batched numpy kernel per
    (block, dim) group instead of an interpreted higher-order-function
    chain per pair (guide §4.2). The kernel reproduces the column fold's
    IEEE operation sequence exactly -- ``dot = ((0 + v0*w0) + v1*w1)...``
    and ``norm = sqrt(((0 + v0^2) + v1^2)...)`` are accumulated with one
    vectorized add per dimension, preserving per-pair operation order, so
    every double is bit-identical to the JVM fold (measured 244 s -> ~2 s
    at sf1.0; oracle hash verified at sf0.01/0.1/1.0). The kernel only
    PRE-filters with a provable slack margin (raw cos >= threshold - 2e-6,
    NaN kept); the authoritative ``round(.,6) >= threshold`` runs in Spark
    on the surviving pairs, so boundary/NaN semantics are Spark's own.

    Semantics preserved from the join form: NULL blocks and NULL vectors
    pair with nothing; vectors of different lengths pair to NULL cosine
    (``zip_with`` pads with null) and are dropped -- the kernel groups by
    (block, dim) so such pairs never form; vectors containing a NULL
    element yield NULL cosine with every partner and are filtered before
    the kernel. Within-block pair volume is O(block^2) either way -- this
    is the exact operator; :func:`embedding_near_dup_pairs_lsh` remains
    the unbounded-block scale path.
    """
    import pandas as pd

    base = (
        embeddings.select(
            F.col(id_col).alias("id"),
            (F.col(block_col) if block_col else F.lit(1)).alias("blk"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .filter(F.col("blk").isNotNull() & F.col("v").isNotNull())
        .filter(~F.exists("v", lambda x: x.isNull()))
        .withColumn("dim", F.size("v"))
    )
    id_type = base.schema["id"].dataType.simpleString()
    pre = float(threshold) - 2e-6

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "raw": []})
        ids = pdf["id"].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        dim = int(pdf["dim"].iloc[0])
        if dim <= 0:
            mat = np.zeros((n, 0), dtype=np.float64)
        else:
            mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"].to_numpy()[order]])
        # norm: same sequential accumulation order as _norm()'s fold
        acc = np.zeros(n, dtype=np.float64)
        for k in range(dim):
            acc += mat[:, k] * mat[:, k]
        nrm = np.sqrt(acc)
        out_a, out_b, out_c = [], [], []
        tile = 2048  # bounds the pair matrix at ~tile^2 doubles
        with np.errstate(all="ignore"):
            for i0 in range(0, n, tile):
                i1 = min(i0 + tile, n)
                for j0 in range(i0, n, tile):
                    j1 = min(j0 + tile, n)
                    dot = np.zeros((i1 - i0, j1 - j0), dtype=np.float64)
                    for k in range(dim):
                        dot += mat[i0:i1, k, None] * mat[None, j0:j1, k]
                    cos = dot / (nrm[i0:i1, None] * nrm[None, j0:j1])
                    keep = (cos >= pre) | np.isnan(cos)
                    # strict id order replaces the join's id_a < id_b
                    keep &= ids[i0:i1, None] < ids[None, j0:j1]
                    ii, jj = np.nonzero(keep)
                    out_a.append(ids[i0 + ii])
                    out_b.append(ids[j0 + jj])
                    out_c.append(cos[keep])
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a) if out_a else [],
                "id_b": np.concatenate(out_b) if out_b else [],
                "raw": np.concatenate(out_c) if out_c else [],
            }
        )

    scored = base.groupBy("blk", "dim").applyInPandas(
        kernel, f"id_a {id_type}, id_b {id_type}, raw double"
    )
    return (
        scored.withColumn("cos_sim", F.round(F.col("raw"), 6))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def embedding_near_dup_pairs_lsh(
    embeddings: DataFrame,
    threshold: float = 0.30,
    planes: int = 3,
    tables: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
) -> DataFrame:
    """Near-dup pairs, LSH-candidate scale path.

    :func:`embedding_near_dup_pairs` is exact but its within-block
    product is O(block^2) -- fine when blocks are bounded, a scale-killer
    when one block holds 10^9 vectors. Here candidates are pairs sharing
    a composite (block, table, signature) bucket in ANY of ``tables``
    hyperplane tables (same construction as :func:`lsh_bucket_topk`),
    then exact-cosine verified -- per-bucket volume ~ block/2^planes, so
    the join is bucketed, never quadratic in the block. Approximate by
    nature: pair recall vs the exact operator is measured and gated in
    tests (0.991 at the default planes=3 x 16 tables on the sf0.01
    embeddings, where near-dup pairs sit right AT the cos 0.30 margin --
    the hardest regime; raise ``tables`` to push recall further at
    linear candidate cost). Precision is 1 by construction (exact
    verify).

    Vectors ride the bucket rows (n x tables explode) so no second join
    back to the corpus is needed; at extreme dimensionality prefer
    re-joining ids instead.
    """
    dim_row = embeddings.select(F.size(vec_col).alias("d")).first()
    dim = dim_row.d

    def sig(col: Column, t: int) -> Column:
        return hyperplane_signature(
            col, dim, planes, plane_offset=t * planes
        ) + F.lit(t << planes).cast("long")

    base = embeddings.select(
        F.col(id_col).alias("id"),
        (F.col(block_col) if block_col else F.lit(1)).alias("blk"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn(
        "bucket",
        F.explode(F.array(*[sig(F.col("v"), t) for t in range(tables)])),
    )
    a = base.select(F.col("id").alias("id_a"), "blk", "bucket", F.col("v").alias("va"))
    b = base.select(F.col("id").alias("id_b"), "blk", "bucket", F.col("v").alias("vb"))
    return (
        a.join(b, ["blk", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("cos_sim", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_centroids: int = 4096,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: the coarse-quantizer scale
    path between :func:`cosine_topk` (exact, small-Q) and
    :func:`lsh_bucket_topk` (signature buckets).

    ``centroids`` is the coarse codebook -- small by construction (IVF
    books are O(sqrt(corpus)) at most; we hard-cap the driver collect at
    ``max_centroids``). It is compiled into literal column expressions,
    so corpus-to-centroid assignment is a pure projection on the scan:
    NO join and NO shuffle touches the corpus. Each query probes its
    ``nprobe`` nearest centroids; the probe set is broadcast, so the
    bucket equi-join is also shuffle-free and only the O(|Q| * k) top-k
    window shuffles at the end. Candidate volume drops by roughly
    nprobe/|centroids| vs the exact scan.

    Determinism: similarities are rounded to 6 dp before every argmax /
    ordering, ties break on ascending centroid / neighbor id -- the same
    total order the DuckDB oracle (q_ann_ivf) expresses with
    ``row_number() OVER (ORDER BY round(cos, 6) DESC, id ASC)``. Recall
    vs the exact scan is asserted in tests, not assumed.
    """
    cents = centroids.select(id_col, vec_col).limit(max_centroids + 1).collect()
    if len(cents) > max_centroids:
        raise ValueError(
            f"coarse codebook exceeds max_centroids={max_centroids}; "
            "IVF wants a small quantizer (grow nlist via hierarchical "
            "books, not a giant driver collect)"
        )
    cents = sorted(cents, key=lambda r: r[id_col])
    cids = [int(r[id_col]) for r in cents]
    cid_arr = F.array(*[F.lit(c).cast("long") for c in cids])

    # The codebook ships as ONE nested-array literal and all |codebook|
    # cosines evaluate in a single zip_with -- a compact constant-size
    # expression tree instead of |codebook| x dim per-element literal
    # nodes. (Both the per-centroid `cosine()` form and a fully-unrolled
    # element_at multiply-add chain were measured slower at sf0.1 --
    # 4.8 s and 27 s respectively vs ~1 s -- the cost was plan
    # construction/analysis of the thousands-of-nodes trees, not row
    # work.) Value-preserving: the dot fold, the shared row norm, and
    # the Python-folded centroid norms perform the identical IEEE
    # operation sequences, pinned by the contract oracle + recall tests.
    if not cents:
        raise ValueError("empty codebook: centroids matched zero rows")
    bvecs = [[float(x) for x in r[vec_col]] for r in cents]
    dim = len(bvecs[0])
    if any(len(b) != dim for b in bvecs):
        raise ValueError("codebook vectors must share one dimensionality")

    def _py_norm(b: list[float]) -> float:
        acc = 0.0
        for x in b:  # same sequential order as the column fold
            acc += x * x
        return acc ** 0.5

    book_lit = F.lit(bvecs)
    bnorm_lit = F.lit([_py_norm(b) for b in bvecs])
    cv = F.col(vec_col).cast("array<double>")

    def with_cos(df: DataFrame) -> DataFrame:
        """Add __cos: rounded cosine to every codebook row, sharing one
        row-norm column (cosine() would re-fold it per centroid)."""
        return df.withColumn("__vn", _norm(F.col("cv"))).withColumn(
            "__cos",
            F.zip_with(
                book_lit,
                bnorm_lit,
                lambda b, nb: F.round(
                    _dot(F.col("cv"), b) / (F.col("__vn") * nb), 6
                ),
            ),
        )

    # corpus: first-max over centroids (cids ascending => smallest cid tie)
    # fan_out: the |codebook| x dim interpreted cosine fold per row is the
    # whole cost of assignment -- a single-partition scan serializes it
    corpus = with_cos(
        fan_out(embeddings).select(F.col(id_col).alias("neighbor_id"), cv.alias("cv"))
    ).select(
        "neighbor_id",
        "cv",
        F.element_at(
            cid_arr,
            F.array_position(F.col("__cos"), F.array_max("__cos")).cast("int"),
        ).alias("bucket"),
    )
    # queries: nprobe nearest centroids ((-cos asc, cid asc) struct sort)
    probes = (
        with_cos(queries.select(F.col(id_col).alias("query_id"), cv.alias("cv")))
        .select(
            "query_id",
            F.col("cv").alias("qv"),
            F.explode(
                F.slice(
                    F.sort_array(
                        F.zip_with(
                            F.col("__cos"),
                            cid_arr,
                            lambda c, cid: F.struct(
                                (-c).alias("nc"), cid.alias("cid")
                            ),
                        )
                    ),
                    1,
                    nprobe,
                )
            ).alias("__p"),
        )
        .select("query_id", "qv", F.col("__p.cid").alias("bucket"))
    )

    cand = corpus.join(F.broadcast(probes), "bucket").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = cand.withColumn(
        "cos_sim", F.round(cosine(F.col("qv"), F.col("cv")), 6)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def semantic_dedup(
    embeddings: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.97,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_centroids: int = 4096,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster every embedding to its nearest coarse
    centroid, compare pairs WITHIN a cluster only, and mark as duplicate
    every item whose rounded cosine to a LOWER-ID cluster-mate reaches
    ``threshold`` (the lowest-id mate is the canonical survivor --
    deterministic, partitioning-independent).

    Returns ``(vec_id, bucket, dup_of, keep)``: ``dup_of`` is the
    smallest canonical mate id (NULL for keepers), ``keep`` its
    negation.

    Scale shape: centroid assignment reuses the IVF codebook compilation
    -- the codebook ships as one nested-array literal, so the corpus is
    assigned in a pure scan projection (no join, no shuffle). The only
    quadratic surface is the within-cluster self-join on ``bucket``,
    which is exactly SemDeDup's own O(sum |cluster|^2) step; the
    codebook size controls it (clusters ~ corpus/nlist), and the
    equi-join shuffles both sides once on the bucket key. The dup-side
    reduction is a map-side-combinable min() -- no window.

    Determinism: cosines are rounded to 6 dp BEFORE the threshold
    compare (ties at the boundary resolve identically in the DuckDB
    oracle), and duplicate attribution is min(id) -- no float argmax.
    """
    cents = centroids.select(id_col, vec_col).limit(max_centroids + 1).collect()
    if len(cents) > max_centroids:
        raise ValueError(
            f"coarse codebook exceeds max_centroids={max_centroids}; "
            "semantic dedup wants a bounded quantizer"
        )
    if not cents:
        raise ValueError("empty codebook: centroids matched zero rows")
    cents = sorted(cents, key=lambda r: r[id_col])
    cids = [int(r[id_col]) for r in cents]
    cid_arr = F.array(*[F.lit(c).cast("long") for c in cids])
    bvecs = [[float(x) for x in r[vec_col]] for r in cents]
    dim = len(bvecs[0])
    if any(len(b) != dim for b in bvecs):
        raise ValueError("codebook vectors must share one dimensionality")

    def _py_norm(b: list[float]) -> float:
        acc = 0.0
        for x in b:
            acc += x * x
        return acc ** 0.5

    book_lit = F.lit(bvecs)
    bnorm_lit = F.lit([_py_norm(b) for b in bvecs])

    assigned = (
        embeddings.select(
            F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("cv")
        )
        .withColumn("__vn", _norm(F.col("cv")))
        .withColumn(
            "__cos",
            F.zip_with(
                book_lit,
                bnorm_lit,
                lambda b, nb: F.round(_dot(F.col("cv"), b) / (F.col("__vn") * nb), 6),
            ),
        )
        .select(
            "vid",
            "cv",
            F.element_at(
                cid_arr,
                F.array_position(F.col("__cos"), F.array_max("__cos")).cast("int"),
            ).alias("bucket"),
        )
    )
    a = assigned.select(
        F.col("vid").alias("id_a"), F.col("cv").alias("va"), "bucket"
    )
    b = assigned.select(
        F.col("vid").alias("id_b"), F.col("cv").alias("vb"), "bucket"
    )
    dup = (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("__sim", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .filter(F.col("__sim") >= F.lit(float(threshold)))
        .groupBy(F.col("id_b").alias("vid"))
        .agg(F.min("id_a").alias("dup_of"))
    )
    return (
        assigned.join(dup, "vid", "left")
        .select(
            F.col("vid").alias(id_col),
            "bucket",
            "dup_of",
            F.col("dup_of").isNull().alias("keep"),
        )
    )
