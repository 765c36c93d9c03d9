"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with typed metadata
structs. The Spark-side plumbing (schemas, Arrow batch shapes, partition
strategy, UDF signatures) is real and tested; the actual codec step is
STUBBED because no image/audio library exists in this container -- decode
raises ``NotImplementedError`` unless ``fake=True``, which substitutes a
deterministic fake decoder so the pipeline shape can be exercised end to
end.

At cluster scale the rules encoded here:
- binary columns are never groupBy keys; metadata (length, digest) is
  derived once and carried as narrow columns
- decode/feature-extract runs in ``mapInPandas`` with a bounded Arrow batch
  size (payloads are MBs -- `spark.sql.execution.arrow.maxRecordsPerBatch`
  must cap memory, set in session.py)
- partitioning by content digest spreads hot mirrors of the same asset
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "byte_len bigint, digest_md5 string, magic string, modality string"
)


def media_metadata(df: DataFrame, payload: str = "html") -> DataFrame:
    """Typed metadata for a binary column -- pure column expressions."""
    magic = F.hex(F.substring(F.col(payload), 1, 4))
    return df.withColumns(
        {
            "byte_len": F.octet_length(F.col(payload)).cast("long"),
            "digest_md5": F.md5(F.col(payload)),
            "magic": magic,
            "modality": F.when(magic.startswith("FFD8"), "image/jpeg")
            .when(magic.startswith("89504E47"), "image/png")
            .when(magic.startswith("494433"), "audio/mp3")
            .otherwise("application/octet-stream"),
        }
    )


def decode_and_featurize(
    df: DataFrame,
    payload: str = "html",
    id_col: str = "url",
    fake: bool = False,
    n_features: int = 8,
) -> DataFrame:
    """Decode binary payloads and emit fixed-width feature vectors.

    Real decode is unavailable in this environment (no PIL/ffmpeg):
    ``fake=False`` raises ``NotImplementedError`` *inside the executor
    batch*, exactly where a real codec call would sit. ``fake=True`` uses a
    deterministic byte-histogram "feature" so schema, batching, and
    downstream joins are exercised for real.
    """
    schema = f"{id_col} string, width int, height int, features array<double>"

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, widths, heights, feats = [], [], [], []
            for key, blob in zip(pdf[id_col], pdf[payload]):
                b = bytes(blob)
                if not fake:
                    raise NotImplementedError(
                        "media decode requires a codec library (PIL/ffmpeg); "
                        "run with fake=True for the deterministic stub"
                    )
                arr = np.frombuffer(b, dtype=np.uint8)
                hist = np.bincount(arr % n_features, minlength=n_features)
                total = max(int(hist.sum()), 1)
                ids.append(key)
                widths.append(int(len(b) % 1024))
                heights.append(int((len(b) // 1024) + 1))
                feats.append((hist / total).astype(float).tolist())
            yield pd.DataFrame(
                {id_col: ids, "width": widths, "height": heights, "features": feats}
            )

    return df.select(id_col, payload).mapInPandas(run, schema=schema)


def frame_sample_plan(
    df: DataFrame, payload: str = "html", id_col: str = "url", every_n_bytes: int = 64
) -> DataFrame:
    """'Frame sampling' plumbing: one row per sampled offset of the payload.

    Stands in for video frame extraction: the explode pattern, offsets, and
    per-frame keys are the real plumbing; the sampled byte is the fake
    frame. Pure column expressions (no UDF).
    """
    n = F.octet_length(F.col(payload))
    offsets = F.sequence(F.lit(0), F.greatest((n - 1) / every_n_bytes, F.lit(0)).cast("int"))
    return df.select(
        id_col,
        F.explode(offsets).alias("frame_idx"),
        F.ascii(
            F.substring(F.col(payload).cast("string"), F.lit(1), F.lit(1))
        ).alias("_unused_probe"),
        F.octet_length(F.col(payload)).alias("byte_len"),
    ).withColumn("frame_offset", F.col("frame_idx") * every_n_bytes).drop("_unused_probe")
