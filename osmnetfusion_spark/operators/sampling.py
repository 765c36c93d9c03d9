"""Deterministic corpus sampling and sequence packing.

Training-data pipelines need reproducible subsets ("2% of every domain",
"exactly 1,000 docs per language") and token-budget batch packing.
`df.sample()` is seed-dependent on partitioning and not oracle-checkable;
these operators derive every decision from the DATA via integer hash
arithmetic, so the same input always yields the same sample on any
cluster layout -- and an ANSI-SQL oracle can re-derive it exactly.

The hash is Knuth's multiplicative scheme over the row id folded to
32 bits: ``(id * 2654435761) % 2^32``. Not cryptographic -- the point is
a uniform-enough, dialect-portable (pure BIGINT arithmetic) total order
that is independent of the grouping key, so per-group thresholds and
ranks are unbiased.

Scale shape: rate sampling is a pure scan filter (no shuffle, pushes
down past column pruning); fixed-k per group is one window over the
group key (same cost as any per-key top-k); packing is one window over
the pack key ordered by the deterministic layout order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "knuth_hash", "sample_rate", "sample_weighted", "sample_per_group",
    "pack_sequences",
]

KNUTH = 2654435761  # 2^32 / golden ratio, Knuth TAOCP vol.3 §6.4
M32 = 1 << 32


def knuth_hash(id_col: Column | str) -> Column:
    """Fold a BIGINT id to a deterministic uniform-ish value in [0, 2^32).

    Computed as ``(id mod 2^32) * KNUTH mod 2^32`` with the multiply
    split at 16 bits so no intermediate exceeds 2^49 -- a naive
    ``id * KNUTH`` overflows signed 64-bit for ids >= ~3.47e9 (real OSM
    node ids are ~12e9; 64-bit doc ids can be negative), which throws
    under ANSI mode and silently keeps 100% of such rows otherwise
    (negative hash < any threshold). ``pmod`` keeps negatives in range.
    For ids < 2^31 the result is identical to the naive formula, which
    is what the BIGINT-arithmetic SQL oracles compute.
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h0 = F.pmod(c.cast("long"), F.lit(M32))
    a = F.shiftright(h0, 16)  # h0 >= 0, so arithmetic shift == floor-div
    b = h0.bitwiseAND(F.lit(0xFFFF))
    # (a*2^16 + b) * K  ==  (a*K mod 2^16)*2^16 + b*K   (mod 2^32)
    hi = F.pmod(a * F.lit(KNUTH), F.lit(1 << 16)) * F.lit(1 << 16)
    return F.pmod(hi + b * F.lit(KNUTH), F.lit(M32))


def sample_rate(df: DataFrame, id_col: str, rate: float) -> DataFrame:
    """Keep ~``rate`` of rows, decided per row by hash threshold.

    A pure filter: no shuffle, no state, stable under repartitioning,
    resumable (re-running selects the same rows). Pair with a stratum
    column upstream to get per-stratum rates (filter before groupBy).
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.filter(knuth_hash(id_col) < F.lit(int(rate * M32)))


def sample_weighted(
    df: DataFrame,
    id_col: str,
    weight_col: Column | str,
    on_null: str = "error",
) -> DataFrame:
    """Keep each row with probability ``weight_col`` (per-row, in [0,1]),
    decided by hash threshold -- deterministic importance downsampling
    for corpus mixture reweighting ("keep 50% of en, 25% of low-quality,
    all of everything else"). Weights usually come from a broadcast-
    joined mixture table or a quality-score expression upstream; still a
    pure scan filter, no shuffle, stable under repartitioning, and a row
    kept at weight w stays kept at any weight >= w (nested mixtures).

    A NULL weight (e.g. a key missing from the mixture table) is a data
    bug, not a sampling decision: the default raises at evaluation time.
    ``on_null``: "error" (default), "keep" (treat as 1.0), or "drop".
    Out-of-range weights always raise -- a silent w>1 keep-all or w<0
    drop-all would corrupt the mixture unnoticed.

    ``floor(w * 2^32)`` is the threshold on both the engine and oracle
    side -- floor, not cast, because SQL dialects disagree on
    double->int rounding (Spark truncates, DuckDB rounds half-even).
    """
    if on_null not in ("error", "keep", "drop"):
        raise ValueError(f"on_null must be error|keep|drop, got {on_null!r}")
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    w = w.cast("double")
    bad = F.raise_error(
        F.concat(F.lit("sample_weighted: weight out of [0, 1]: "), w.cast("string"))
    )
    w = F.when((w < 0.0) | (w > 1.0), bad).otherwise(w)
    if on_null == "error":
        w = F.coalesce(
            w, F.raise_error(F.lit("sample_weighted: NULL weight (missing mixture key?)"))
        )
    elif on_null == "keep":
        w = F.coalesce(w, F.lit(1.0))
    # on_null == "drop": NULL propagates through the comparison -> filtered
    return df.filter(knuth_hash(id_col) < F.floor(w * F.lit(float(M32))))


def sample_per_group(
    df: DataFrame, group_cols: str | list[str], id_col: str, k: int
) -> DataFrame:
    """Exactly min(k, |group|) rows per group, chosen by hash order.

    The hash total-orders each group independently of how the data
    arrived, so the selection is a uniform-without-replacement sample
    that is reproducible and oracle-checkable (row_number over the same
    arithmetic). One shuffle on the group key.
    """
    keys = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    w = Window.partitionBy(*keys).orderBy(
        knuth_hash(id_col).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def pack_sequences(
    df: DataFrame,
    len_col: str,
    id_col: str,
    budget: int,
    pack_keys: str | list[str] | None = None,
    order: str = "length_desc",
) -> DataFrame:
    """Assign rows to token-budget bins: contiguous cumulative-sum
    packing over a deterministic layout order.

    Each row gets ``pack_id = floor(running_sum_before / budget)`` and
    ``pack_offset = running_sum_before % budget`` -- the GPT-style
    concat-then-chunk layout: documents are laid end to end in the
    deterministic order and sliced into budget-size windows; a document
    straddling a boundary belongs to the window its first token lands
    in. First-fit-decreasing's packing gain over this is small when
    budget >> typical doc length, and unlike FFD this is a single
    window expression, not a sequential bin search.

    ``order``: "length_desc" (default; groups long docs together, the
    FFD-style layout) or "hash" (shuffles docs uniformly across packs --
    use when packs must be topic-decorrelated). Both orders are total
    (id tiebreak) so pack assignment is reproducible.

    With ``pack_keys`` the packing is per group (e.g. per language);
    one shuffle on the pack keys, cumulative window, no driver state.
    ``pack_keys=None`` plans a GLOBAL cumulative window -- one task
    sorts the whole input -- which is only sane for bounded per-group
    frames; at corpus scale always pass keys. The None path warns
    loudly so a silent single-task sort never ships by accident.
    """
    keys = (
        [pack_keys] if isinstance(pack_keys, str)
        else list(pack_keys) if pack_keys else []
    )
    if not keys:
        import warnings

        warnings.warn(
            "pack_sequences(pack_keys=None) plans a single-partition global "
            "window (one task sorts ALL rows) -- pass pack_keys (e.g. lang or "
            "a shard column) for any unbounded input",
            ResourceWarning,
            stacklevel=2,
        )
    if order == "length_desc":
        by = [F.col(len_col).desc(), F.col(id_col).asc()]
    elif order == "hash":
        by = [knuth_hash(id_col).asc(), F.col(id_col).asc()]
    else:
        raise ValueError(f"order must be length_desc|hash, got {order!r}")
    w = (
        Window.partitionBy(*keys).orderBy(*by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = F.sum(F.col(len_col).cast("long")).over(w)
    before = run - F.col(len_col).cast("long")
    # Exact integer floor-div (same idiom as temporal.range_interval_join's
    # fdiv): `/` on longs is double division, which rounds the quotient
    # once the running sum passes 2^53 and mis-assigns packs. Subtracting
    # pmod first makes the numerator exactly divisible and the
    # decimal(38,0) divide exact over the full signed-64 domain.
    off = F.pmod(before, F.lit(int(budget)))
    pid = ((before - off).cast("decimal(38,0)") / F.lit(int(budget))).cast("long")
    return df.select(
        "*",
        pid.alias("pack_id"),
        off.cast("long").alias("pack_offset"),
    )
