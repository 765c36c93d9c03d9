"""Batched grouped-map: applyInPandas semantics without per-group overhead.

``groupBy().applyInPandas`` pays an Arrow slice + Python call per group
(~10-15 ms); with thousands of small groups (parallel-edge merges, node
clusters) that dominates wall time -- and AQE's partition coalescing can
serialize it entirely on small shuffles. :func:`grouped_map_batched`
keeps the same contract (fold function sees exactly one complete group)
but ships whole partitions to Python: repartition by key, sort within
partitions so groups are contiguous, then ``mapInPandas`` with a carry
buffer for the group that straddles a batch boundary.

Cost: one Python round trip per partition + a pandas groupby per batch.
Scales the same way the reference's own mp.Pool partitioning did
(p3_functions.py:913-922), but with Spark shuffle semantics.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame


def grouped_map_batched(
    df: DataFrame,
    keys: list[str],
    fold: Callable[[pd.DataFrame], pd.DataFrame],
    schema: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Apply ``fold`` to each complete group of ``keys``, batched."""
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    rp = df.repartition(num_partitions, *keys).sortWithinPartitions(*keys)

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        for pdf in it:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if not len(pdf):
                continue
            last_key = tuple(pdf.iloc[-1][k] for k in keys)
            tail_mask = pd.Series(True, index=pdf.index)
            for k, v in zip(keys, last_key):
                tail_mask &= pdf[k].eq(v)
            # rows of the final (possibly incomplete) group carry over
            first_tail = tail_mask.idxmax() if tail_mask.any() else len(pdf)
            carry = pdf.iloc[first_tail:]
            body = pdf.iloc[:first_tail]
            if len(body):
                outs = [
                    fold(g.reset_index(drop=True))
                    for _, g in body.groupby(keys, sort=False)
                ]
                outs = [o for o in outs if o is not None and len(o)]
                if len(outs) == 1:
                    yield outs[0]
                elif outs:
                    import warnings

                    with warnings.catch_warnings():
                        # pandas FutureWarning about all-NA column dtype
                        # inference during concat; Arrow casts the result
                        # to the declared schema anyway
                        warnings.simplefilter("ignore", FutureWarning)
                        yield pd.concat(outs, ignore_index=True)
        if carry is not None and len(carry):
            out = fold(carry.reset_index(drop=True))
            if out is not None and len(out):
                yield out

    return rp.mapInPandas(run, schema=schema)
