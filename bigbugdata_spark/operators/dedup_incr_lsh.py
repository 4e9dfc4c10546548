"""Incremental near-dup detection through a PERSISTED LSH band index
(round 9) — the second ingest-shaped dedup path, complementing
dedup_incremental's inverted gram index with the sub-linear one: the
corpus side is a bucketed (band-key -> doc) table plus a shingle-set
table, both built once per corpus content and APPENDED per admitted
batch, so a warm ingest cycle signs only the batch and probes band
buckets — candidate volume tracks bucket collisions, not gram document
frequency.  At 100 TB this is the path that wins when common grams are
hot (the inverted index pays per posting; the band index pays per
true-ish collision).

Same batch slice, same output contract, and the SAME oracle as
dedup_incremental (the ground-truth batch-restricted near-dup
relation): equality holds by the banding argument from
dedup_minhash_lsh (every true pair in this corpus sits at J >= 0.9,
missed with probability <= 4e-8), and a unit test additionally pins
result-relation equality against dedup_incremental at test scale.

Registered read query that materializes storage on first run — the
corpus_version_diff / dedup_incremental precedent.

Scaling rule (r12, VERDICT r11 #5 — the knob the IVF codebook's K rule
is to that family): band count and rows-per-band do NOT scale with
corpus size.  A band key is LSH_ROWS=4 concatenated 64-bit minhash
values (~256 bits of key space), so RANDOM cross-pair collisions are
~2^-256-vanishing at any realistic corpus size — candidate volume is
collision-bound: expected candidates per batch doc =
LSH_BANDS * sum over its truly-similar corpus docs of J^LSH_ROWS,
which depends on near-dup DENSITY, not corpus size.  At constant
density the probe cost is linear in |batch| (and the index append
linear in |batch|), so the 10x probe's per-replica slope should be
flat — measured at TWO replication points in bench_scale_probe
(SCALE_SECOND_POINT) and pinned structurally by
test_lsh_candidate_volume_linear.  The deployment knobs remain the
standard S-curve pair: LSH_ROWS sets the similarity threshold
(~(1/b)^(1/r)); LSH_BANDS buys recall linearly in probe cost.  Neither
needs a corpus-size rule because neither cost term grows with n.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigbugdata_spark.caching import pin
from bigbugdata_spark.functions import hashing as H
from bigbugdata_spark.functions.fragments import JACCARD_T
from bigbugdata_spark.operators.dedup_incr_core import (
    _INC_PRED_SQL,
    _corpus_fingerprint,
    _incoming_col,
    INDEX_BUCKETS,
    append_bucketed,
    begin_append_intent,
    commit_append_intent,
    attach_index_tables,
    ensure_index_root,
    index_path,
    remove_incomplete_locations,
    sweep_stale_generations,
)
from bigbugdata_spark.registry import register

# oracle: the identical ground-truth restricted relation the gram-index
# path is gated by (see dedup_incr.dedup_incremental's registration) —
# re-stated here so the two modules stay import-independent
_INCR_ORACLE_SQL = f"""
    WITH sh AS (
        SELECT doc_id,
               {H.sql_shingle_hashes(H.sql_word_hashes(H.sql_tokens('text')))}
                   AS grams
        FROM documents
    ),
    grams AS (
        SELECT doc_id, unnest(grams) AS g FROM sh WHERE len(grams) > 0
    ),
    sizes AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz
        FROM grams GROUP BY doc_id
    ),
    newg AS (SELECT * FROM grams WHERE {_INC_PRED_SQL}),
    common AS (
        SELECT n.doc_id AS new_id, c.doc_id AS match_id,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM newg n JOIN grams c ON n.g = c.g AND n.doc_id <> c.doc_id
        GROUP BY n.doc_id, c.doc_id
    )
    SELECT new_id, match_id,
           CAST(c AS DOUBLE) / (s1.sz + s2.sz - c) AS jaccard
    FROM common
    JOIN sizes s1 ON common.new_id = s1.doc_id
    JOIN sizes s2 ON common.match_id = s2.doc_id
    WHERE CAST(c AS DOUBLE) / (s1.sz + s2.sz - c) >= {JACCARD_T}
"""


def _band_frame(sh: DataFrame) -> DataFrame:
    """(doc_id, bkey) LSH band keys from a (doc_id, grams) shingle
    frame — the dedup_minhash_lsh signature pipeline verbatim, with the
    (band, key) pair folded into ONE string column so the persisted
    index buckets (and the probe join co-locates) on a single key."""
    from bigbugdata_spark.operators.dedup import LSH_BANDS, LSH_ROWS

    ex = sh.select("doc_id", F.explode("grams").alias("h"))
    sig = ex.groupBy("doc_id").agg(
        *[
            F.min(H.minhash_term(F.col("h"), j)).alias(f"s{j}")
            for j in range(LSH_BANDS * LSH_ROWS)
        ]
    )
    band_arr = F.array(
        *[
            F.concat_ws(
                ",",
                F.lit(b),
                *[F.col(f"s{b * LSH_ROWS + r}") for r in range(LSH_ROWS)],
            )
            for b in range(LSH_BANDS)
        ]
    )
    return sig.select("doc_id", F.explode(band_arr).alias("bkey"))


def _index_names(fp: str) -> tuple[str, str]:
    return f"lsh_band_{fp}", f"lsh_set_{fp}"


def lsh_index(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """The persisted LSH index: lsh_band_<fp> (doc_id, bkey) bucketed by
    bkey, and lsh_set_<fp> (doc_id, grams) bucketed by doc_id for the
    exact-Jaccard verify.  Built once per corpus content; appended per
    admitted batch by append_batch_to_lsh_index."""
    fp = _corpus_fingerprint(sf_dir)
    band_name, set_name = _index_names(fp)
    if not spark.catalog.tableExists(band_name):
        from bigbugdata_spark.operators.dedup import _doc_shingles
        from bigbugdata_spark.sources.bucketed import write_bucketed

        ensure_index_root()
        sweep_stale_generations(spark, ("lsh_band_", "lsh_set_"), fp)
        if attach_index_tables(
            spark,
            (
                (band_name, "doc_id BIGINT, bkey STRING", "bkey"),
                (set_name, "doc_id BIGINT, grams ARRAY<BIGINT>", "doc_id"),
            ),
        ):
            return spark.table(band_name), spark.table(set_name)
        remove_incomplete_locations(_index_names(fp))
        sh = pin(_doc_shingles(spark, sf_dir))
        write_bucketed(
            _band_frame(sh), band_name, "bkey", n_buckets=INDEX_BUCKETS,
            path=index_path(band_name),
        )
        write_bucketed(
            sh, set_name, "doc_id", n_buckets=INDEX_BUCKETS,
            path=index_path(set_name),
        )
        sh.unpersist(blocking=False)
    return spark.table(band_name), spark.table(set_name)


def append_batch_to_lsh_index(
    spark: SparkSession, batch_sh: DataFrame, fp: str
) -> None:
    """Maintenance: an admitted batch's band keys and shingle sets
    APPEND into the same bucket layouts (append==rebuild proven by
    test). `batch_sh` is (doc_id, grams) for the batch only."""
    band_name, set_name = _index_names(fp)
    batch_sh = pin(batch_sh)
    # crash-consistency window (r17): band rows landing without their
    # shingle sets would drop verified pairs on a later adoption —
    # the intent sentinel turns that torn state into a cold rebuild
    intent = begin_append_intent((band_name, set_name))
    append_bucketed(_band_frame(batch_sh), band_name, "bkey")
    append_bucketed(batch_sh, set_name, "doc_id")
    commit_append_intent(intent)
    batch_sh.unpersist(blocking=False)


@register(
    "dedup_incremental_lsh",
    oracle=_INCR_ORACLE_SQL,
    tags=("dedup", "join"),
    index_writer=True,
)
def dedup_incremental_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(new_id, match_id, jaccard) for the deterministic ~10% batch
    slice against the whole corpus, through the persisted band index:
    batch shingles -> batch signatures -> band-bucket probe (one
    equi-join on the bucketed bkey) -> exact-Jaccard verify against
    the shingle-set table.  Corpus text is never re-shingled on a
    warm run (plan test)."""
    from bigbugdata_spark.operators.dedup import _doc_shingles

    bands_idx, sets = lsh_index(spark, sf_dir)
    batch_sh = pin(
        _doc_shingles(spark, sf_dir).filter(_incoming_col())
    )
    cand = (
        _band_frame(batch_sh)
        .alias("n")
        .join(bands_idx.alias("c"), "bkey")
        .where(F.col("n.doc_id") != F.col("c.doc_id"))
        .select(
            F.col("n.doc_id").alias("new_id"),
            F.col("c.doc_id").alias("match_id"),
        )
        .distinct()
    )
    g1 = batch_sh.select(
        F.col("doc_id").alias("new_id"), F.col("grams").alias("g1")
    )
    g2 = sets.select(
        F.col("doc_id").alias("match_id"), F.col("grams").alias("g2")
    )
    jac = F.size(F.array_intersect("g1", "g2")).cast("double") / F.size(
        F.array_union("g1", "g2")
    )
    return (
        cand.join(g1, "new_id")
        .join(g2, "match_id")
        .select("new_id", "match_id", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_T)
    )
