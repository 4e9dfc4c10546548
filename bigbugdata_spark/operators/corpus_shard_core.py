"""Non-registering shared definitions for the release-pipeline stage
classification: the shard hash (corpus_shard) and the curriculum stage
thresholds (corpus_curriculum), imported by pipe_release_manifest.

Exists so that pipeline_release can sit inside the driver's 50-slot
oracle cap WITHOUT dragging corpus_shard's and corpus_curriculum's
registrations in with it (the r18 rotation, VERDICT r17 #3): a
module-level import of a registering module spends that module's cap
slots at the importer's position (the funnel_steps/mta precedent).
Same pattern as scd_core / text_bpe_core / events_mad_core (ADVICE
r11).  corpus_shard.py and corpus_curriculum.py re-export these names,
so existing importers (tests/test_round8_ops.py) are unchanged.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigbugdata_spark.functions import hashing as H

N_SHARDS = 16
# affine shard hash — coefficients deliberately distinct from
# fragments.SPLIT_A/B so shard % split strata stay independent
SHARD_A, SHARD_B = 40_503_551, 1_299_721

CLEAN_Q = 1.0  # full rule-sum score counts as clean
SHORT_TOKENS = 56  # clean docs at or under this length go first


def shard_col(doc_id):
    """Column: shard id (0..N_SHARDS-1) of a BIGINT doc_id Column."""
    return ((F.lit(SHARD_A) * doc_id + F.lit(SHARD_B)) % F.lit(H.P)) % F.lit(
        N_SHARDS
    )


def sql_shard(doc_id: str = "doc_id") -> str:
    """DuckDB twin of shard_col (identical affine hash + reduction)."""
    return f"(({SHARD_A} * {doc_id} + {SHARD_B}) % {H.P}) % {N_SHARDS}"
