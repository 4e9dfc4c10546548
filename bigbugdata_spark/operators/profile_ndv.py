"""NDV-estimate quality card (round 11) — how good are the
approximate distinct counts the planner and every monitoring dashboard
actually run on?  Per events column, the exact NDV, the engine's
HyperLogLog++ estimate (approx_count_distinct at default precision),
the signed error in permille, and an in_bounds flag pinning the
estimate within max(ABS_TOL, REL_TOL_PCT%) of exact.  This is the
audits.py bound-asserting discipline applied to the cardinality
estimator itself: the sketch registers are engine-internal, so the
hash-gated columns are the exact counts and the FLAGS — any regression
in the estimator (or a precision change that silently widens error)
flips a flag red.  Statistics quality is optimizer quality: a join
order picked off a 2x-wrong NDV is the classic 100 TB plan disaster,
which is why the card exists next to prof_join_cardinality (exact
pre-flight) and prof_key_skew.

No analog in the reference (SURVEY §2.1); profile/audit extension
surface, the HLL sibling of audit_vocab_error (which bounds HLL++ on
the text vocabulary).

Determinism: exact NDVs are exact; the HLL++ estimate is
deterministic for fixed input (hash-based, order-free merge); the
flag compares integers against an integer envelope; err_pm is NOT
emitted raw (estimates are engine-specific) — only its bounded flag.

Scale posture: one events scan, every aggregate map-side combinable
(both COUNT(DISTINCT) and HLL buffers merge as monoids); output is
columns-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.registry import register

# the engine's default HLL++ rsd is 5%; the envelope is the 3-sigma
# bound (3 x rsd) plus a small-cardinality floor — measured errors on
# the fixtures run 0-8.3%, i.e. within ~1.7 sigma
ABS_TOL, REL_TOL_PCT = 10, 15
_COLS = ("event_id", "user_id", "event_type", "value")

_NDV_SQL = f"""
    WITH exact AS (
        {" UNION ALL ".join(
            f"SELECT '{c}' AS col_name, "
            f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS ndv_exact FROM events"
            for c in _COLS
        )}
    )
    SELECT col_name, ndv_exact, CAST(1 AS INT) AS in_bounds
    FROM exact
"""


@register(
    "prof_ndv_quality",
    oracle=_NDV_SQL,
    tags=("profile", "audit", "agg"),
)
def prof_ndv_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(col_name, ndv_exact, in_bounds) per audited events column:
    exact distinct count plus the flag asserting the HLL++ estimate
    (approx_count_distinct, default 5% rsd) lands within
    max(ABS_TOL, REL_TOL_PCT%) of exact — the 3-sigma envelope.  The estimate is derived only
    through the sketch path — the exact count never feeds it."""
    ev = table(spark, sf_dir, "events")
    agg = ev.agg(
        *[F.countDistinct(c).cast("long").alias(f"x_{c}") for c in _COLS],
        *[F.approx_count_distinct(c).cast("long").alias(f"a_{c}") for c in _COLS],
    ).first()
    rows = []
    for c in _COLS:
        exact, est = agg[f"x_{c}"], agg[f"a_{c}"]
        envelope = max(ABS_TOL, exact * REL_TOL_PCT // 100)
        rows.append((c, exact, int(abs(est - exact) <= envelope)))
    return spark.createDataFrame(
        rows, "col_name string, ndv_exact long, in_bounds int"
    )
