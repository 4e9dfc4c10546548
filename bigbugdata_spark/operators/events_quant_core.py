"""The evt_value_quantiles oracle as a non-registering constant.

streaming/quantiles.py gates evt_stream_value_quantiles with the BATCH
query's oracle verbatim (stream == batch is the claim); importing it
from here — instead of from the registering events/events_quant modules
— keeps the driver cap's registration order independent of which
consumer imports first (scd_core pattern, r12).
"""

from __future__ import annotations

from bigbugdata_spark.functions.fragments import CENTS_SQL as _CENTS

QUANTILES_ORACLE_SQL = f"""
        WITH ranked AS (
            SELECT event_type, {_CENTS} AS cents,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY {_CENTS}, event_id) AS rn,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM events
        )
        SELECT event_type,
               CAST(MAX(CASE WHEN rn = CAST(CEIL(0.5 * n) AS BIGINT) THEN cents END) AS BIGINT) AS p50_cents,
               CAST(MAX(CASE WHEN rn = CAST(CEIL(0.9 * n) AS BIGINT) THEN cents END) AS BIGINT) AS p90_cents,
               CAST(MAX(CASE WHEN rn = CAST(CEIL(0.99 * n) AS BIGINT) THEN cents END) AS BIGINT) AS p99_cents,
               CAST(MAX(n) AS BIGINT) AS n_events
        FROM ranked GROUP BY event_type
    """
