"""Per-frame feature extraction + asset-level pooling (round 10) — the
multimodal family's missing middle: mm_frame_sample plans WHICH frames
to touch, mm_decode_stub marks the decode boundary, but nothing ran a
per-frame FEATURE KERNEL through the Arrow batch path and pooled the
results per asset — the shape every video/image embedding pipeline has
(decode frame -> feature vector -> pool).  This registers exactly that,
under the full hash gate.

The kernel is the documented deterministic decode stand-in (the
_fake_decode convention): each sampled frame's "feature vector" is the
code points of 4 characters read at the frame's offset into the payload
(cyclic) — an opaque per-item computation with the real kernel's
signature (bytes in, fixed-width vector out), swappable for a real
decoder where one ships.  Because it is deterministic arithmetic on the
payload, the DuckDB twin re-derives frames, offsets, features, and the
pooled sums exactly — the mapInPandas boundary itself is hash-gated,
not just row-counted.

No analog in the reference (SURVEY §2.1); multimodal extension surface.

Scale posture: the kernel runs inside mapInPandas over Arrow batches —
payload bytes never shuttle through the driver, per-frame rows are
emitted executor-side, and the pooling is a map-side-combinable
groupBy(doc_id) SUM.  At 100 TB the same topology holds with the real
decoder; the per-frame fan-out is bounded by the sampling stride
(every 2nd frame of a <= 7-frame payload here).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bigbugdata_spark.catalog import table
from bigbugdata_spark.registry import register

FEAT_DIM = 4

_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
    ]
    + [T.StructField(f"c{k}", T.LongType()) for k in range(FEAT_DIM)]
)


def _feature_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Arrow-batched frame-feature kernel: per input asset, emit one row
    per sampled frame (every 2nd of n_chars%7+1 frames) with the
    FEAT_DIM character codes at the frame's cyclic offset.  The inner
    per-item loop IS the decode-kernel boundary — a real decoder does
    opaque per-payload work here too; everything around it stays
    Arrow-vectorized."""
    for pdf in batches:
        doc_ids: list[int] = []
        frame_idxs: list[int] = []
        feats: list[list[int]] = [[] for _ in range(FEAT_DIM)]
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            n = len(text)
            if n == 0:
                continue
            n_frames = n % 7 + 1
            for f in range(0, n_frames, 2):
                off = (f * n) // n_frames
                doc_ids.append(doc_id)
                frame_idxs.append(f)
                for k in range(FEAT_DIM):
                    feats[k].append(ord(text[(off + k) % n]))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(doc_ids, dtype="int64"),
                "frame_idx": pd.Series(frame_idxs, dtype="int64"),
                **{
                    f"c{k}": pd.Series(feats[k], dtype="int64")
                    for k in range(FEAT_DIM)
                },
            }
        )


_POOL_SQL = f"""
    WITH meta AS (
        SELECT doc_id, text,
               CAST(length(text) AS BIGINT) AS n_chars,
               CAST(length(text) % 7 + 1 AS BIGINT) AS n_frames
        FROM documents WHERE length(text) > 0
    ),
    frames AS (
        SELECT doc_id, text, n_chars,
               CAST(u.f AS BIGINT) AS frame_idx,
               (CAST(u.f AS BIGINT) * n_chars) // n_frames AS off
        FROM meta, unnest(range(0, n_frames, 2)) AS u(f)
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_sampled,
           {", ".join(
               f"CAST(SUM(ord(substr(text,"
               f" CAST((off + {k}) % n_chars AS INT) + 1, 1)))"
               f" AS BIGINT) AS f{k}"
               for k in range(FEAT_DIM)
           )}
    FROM frames GROUP BY doc_id
"""


@register(
    "mm_frame_feature_pool",
    oracle=_POOL_SQL,
    tags=("multimodal", "pandas-udf", "agg"),
)
def mm_frame_feature_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_sampled, f0..f3): per asset, the number of sampled
    frames and the element-wise SUM of their frame-feature vectors —
    frame features computed executor-side in one mapInPandas kernel,
    pooled by a distributed aggregate; the oracle re-derives the whole
    chain in SQL, hash-gating the Arrow boundary."""
    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.length("text") > 0)
    )
    frames = docs.mapInPandas(_feature_batches, schema=_FRAME_SCHEMA)
    return frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        *[F.sum(f"c{k}").alias(f"f{k}") for k in range(FEAT_DIM)],
    )
