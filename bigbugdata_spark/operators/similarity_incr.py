"""Incremental ANN index maintenance (round 8, VERDICT r7 #4) — the
ingest-shaped twin for the similarity family, matching what
dedup_incremental did for dedup: a new-embedding batch is assigned to
the EXISTING IVF codebook without recomputing it, and the registered
query is the per-cell assignment-delta accounting a production index
maintainer publishes per ingest cycle ("cell 7 grew 12%; rebalance when
drift exceeds threshold").

Why the codebook is frozen: at 100 TB the coarse quantizer is trained
once (or per rebuild window) and serves many ingest cycles — assignment
of a daily batch is O(|batch| x sqrt(K)) with the two-level router,
embarrassingly parallel, and requires NO corpus scan. Recomputing the
codebook per batch would both cost a corpus scan and silently
invalidate every stored assignment (cell ids shift), which is exactly
the bug class the delta accounting would expose: n_after must equal
n_before + n_added per cell, an invariant the oracle re-derives from
scratch.

Round 13 (VERDICT r12 #2): the registered query now does BATCH-SIZED
work.  Through r12 it recomputed the full inverted file twice
(before/after) to stay oracle-checkable — O(corpus) per ingest cycle,
the round's probe-worst at 10x ratio 8.22.  The index generation
machinery below (the dedup_incr.py precedent) persists the frozen
codebook and the per-cell counts of the stored inverted file once per
(corpus content, algorithm version); a warm cycle reads K codebook rows
+ K count rows, routes only the batch, and publishes the delta.  The
full from-scratch recompute now lives ONLY in the DuckDB oracle — so a
persisted generation that drifted from the corpus (stale codebook,
dropped vector, shifted cell id) still shifts the integers and fails
the hash compare.

The batch slice is a deterministic ~10% affine-hash of vec_id (fresh
constants — must not correlate with the codebook-sampling hash or any
doc-side slice), standing in for the daily arrival exactly as
dedup_incremental's slice does.

No analog in the reference (SURVEY §2.1); ANN extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigbugdata_spark.functions import hashing as H
from bigbugdata_spark.functions.fragments import (
    EMB_DIM as _DIM,
    IVF_ASSIGN,
    IVF_CODEBOOK_HASH_SQL,
    SUP_ASSIGN,
    sql_scaled_ivf_k,
    sql_sup_count,
)
from bigbugdata_spark.registry import register

# deterministic affine-hash "today's batch" predicate (~10% of vectors)
_VINC_A, _VINC_B, _VINC_P = 123_457, 77_713, 1_000_000_007
_VINC_MOD, _VINC_REM = 10, 4
_VINC_PRED_SQL = (
    f"((vec_id * {_VINC_A} + {_VINC_B}) % {_VINC_P}) % {_VINC_MOD} = {_VINC_REM}"
)


def incoming_vec_col():
    return (
        (F.col("vec_id") * _VINC_A + _VINC_B) % _VINC_P % _VINC_MOD
        == _VINC_REM
    )


# --- persisted IVF index generation (round 13, VERDICT r12 #2) -------------

_IVF_CB_PREFIX = "ivfgen_cb_"
_IVF_CNT_PREFIX = "ivfgen_cnt_"

#: build-algorithm version, suffixed to the generation fingerprint
#: exactly as similarity_graph_core._ALGO_V: the corpus fingerprint
#: alone would adopt a generation built by older assignment math (same
#: data, different cells).  The suffix keeps the first-8-chars PATH
#: component intact, which is what sweep_stale_generations scopes on.
#: Bump whenever codebook sampling or routed assignment changes.
_IVF_ALGO_V = "-a1"


def ivf_generation_fp(sf_dir: str) -> str:
    """Fingerprint of the persisted IVF generation for `sf_dir`'s
    embeddings: corpus content fingerprint + build-algorithm version —
    the ONE definition bench hooks and tests must share."""
    from bigbugdata_spark.operators.dedup_incr_core import _corpus_fingerprint

    return _corpus_fingerprint(sf_dir, "embeddings.parquet") + _IVF_ALGO_V


def _existing_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigbugdata_spark.catalog import table

    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", H.norm(F.col("embedding")).alias("nrm")
    )
    return e.filter(~incoming_vec_col())


def ivf_index_generation(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(codebook, cell_counts) — the persisted IVF index generation:

      ivfgen_cb_<fp>   (cell_id, c_emb, c_nrm, cpos)  the frozen
                       codebook, K ~ sqrt(n) rows — what a serving
                       deployment loads instead of re-deriving;
      ivfgen_cnt_<fp>  (cell_id, n_before)            per-cell sizes of
                       the stored inverted file (the existing slice's
                       routed assignments), K rows of metadata a real
                       index maintainer keeps next to the postings.

    Built ONCE per (corpus content, _IVF_ALGO_V) — the one O(corpus)
    pass — then adopted by every later session (dedup_incr.py's
    amortized-nightly-build shape).  The write is tmp-dir + rename per
    location, with adoption gated on BOTH _SUCCESS markers, so a reader
    never observes a half-written generation (a partial crash leaves at
    most one location renamed, which fails the gate and rebuilds).
    Same-corpus stale generations (regenerated data or older algorithm
    version) are swept at build time."""
    from pathlib import Path

    from bigbugdata_spark.operators.dedup_incr_core import (
        build_tmp_path,
        collect_abandoned_siblings,
        ensure_index_root,
        index_path,
        publish_generation,
        sweep_stale_generations,
    )

    fp = ivf_generation_fp(sf_dir)
    cb_loc = Path(index_path(f"{_IVF_CB_PREFIX}{fp}"))
    cnt_loc = Path(index_path(f"{_IVF_CNT_PREFIX}{fp}"))
    # reap dead sessions' build tmps / debris (age-gated; a live
    # concurrent build reads fresh and is spared)
    collect_abandoned_siblings(cb_loc)
    collect_abandoned_siblings(cnt_loc)
    if not (
        (cb_loc / "_SUCCESS").exists() and (cnt_loc / "_SUCCESS").exists()
    ):
        from bigbugdata_spark.functions.fragments import scaled_ivf_k
        from bigbugdata_spark.operators.similarity import ivf_assign, ivf_cents

        ensure_index_root()
        sweep_stale_generations(spark, (_IVF_CB_PREFIX, _IVF_CNT_PREFIX), fp)
        existing = _existing_corpus(spark, sf_dir)
        k = scaled_ivf_k(existing.count())
        cents = ivf_cents(existing, k=k)
        # unique per-builder tmps (r14 review): concurrent same-fp
        # builders must not clobber each other's in-progress writes
        cb_tmp = build_tmp_path(cb_loc)
        cents.write.mode("overwrite").parquet(str(cb_tmp))
        # counts derive from the WRITTEN codebook (the artifact is the
        # truth the warm path will read, not the plan that produced it)
        counts = (
            ivf_assign(existing, spark.read.parquet(str(cb_tmp)), k=k)
            .groupBy("cell_id")
            .agg(F.count(F.lit(1)).alias("n_before"))
        )
        cnt_tmp = build_tmp_path(cnt_loc)
        counts.write.mode("overwrite").parquet(str(cnt_tmp))
        # race-safe publish (ADVICE r13 #1): a concurrent same-
        # fingerprint winner's artifact is adopted, not collided with
        publish_generation(cnt_tmp, cnt_loc)
        publish_generation(cb_tmp, cb_loc)
    return (
        spark.read.parquet(str(cb_loc)),
        spark.read.parquet(str(cnt_loc)),
    )


def _assign_sql(src: str) -> str:
    """Two-level routed assignment of `src` against the frozen codebook
    (mirrors similarity._routed_cells / audits.ivf_stages_sql, r12):
    rank only the cells reachable through the vector's SUP_PROBE best
    supercells."""
    from bigbugdata_spark.operators.audits import _routed_pairs_sql

    return f"""
        SELECT vec_id, cell_id FROM (
            SELECT r.vec_id, r.cell_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY r.vec_id
                       ORDER BY {H.sql_dot('s.embedding', 'ct.c_emb', _DIM)}
                                / (s.nrm * ct.c_nrm) DESC,
                                r.cell_id ASC
                   ) AS arn
            FROM {_routed_pairs_sql(src, 'vec_id', 'embedding', 'nrm')} r
            JOIN {src} s ON s.vec_id = r.vec_id
            JOIN cents ct ON ct.cell_id = r.cell_id
        ) WHERE arn <= {IVF_ASSIGN}
"""


@register(
    "sim_ivf_incremental_assign",
    oracle=f"""
        WITH corpus AS (
            SELECT vec_id, embedding,
                   {H.sql_norm('embedding', _DIM)} AS nrm
            FROM embeddings
        ),
        existing AS (SELECT * FROM corpus WHERE NOT ({_VINC_PRED_SQL})),
        batch AS (SELECT * FROM corpus WHERE {_VINC_PRED_SQL}),
        cents AS MATERIALIZED (
            SELECT vec_id AS cell_id, embedding AS c_emb, nrm AS c_nrm,
                   ROW_NUMBER() OVER (
                       ORDER BY {IVF_CODEBOOK_HASH_SQL}, vec_id
                   ) AS cpos
            FROM existing ORDER BY {IVF_CODEBOOK_HASH_SQL}, vec_id
            LIMIT {sql_scaled_ivf_k('existing')}
        ),
        supers AS MATERIALIZED (
            SELECT cell_id AS sup_id, c_emb AS s_emb, c_nrm AS s_nrm
            FROM cents
            WHERE cpos <= {sql_sup_count(sql_scaled_ivf_k('existing'))}
        ),
        cell_sup AS MATERIALIZED (
            SELECT cell_id, sup_id FROM (
                SELECT c.cell_id, s.sup_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY c.cell_id
                           ORDER BY {H.sql_dot('c.c_emb', 's.s_emb', _DIM)}
                                    / (c.c_nrm * s.s_nrm) DESC,
                                    s.sup_id ASC
                       ) AS srn
                FROM cents c CROSS JOIN supers s
            ) WHERE srn <= {SUP_ASSIGN}
        ),
        a_old AS ({_assign_sql('existing')}),
        a_new AS ({_assign_sql('batch')}),
        unioned AS (
            SELECT cell_id, 0 AS is_new FROM a_old
            UNION ALL
            SELECT cell_id, 1 AS is_new FROM a_new
        )
        SELECT cell_id,
               CAST(SUM(1 - is_new) AS BIGINT) AS n_before,
               CAST(SUM(is_new) AS BIGINT) AS n_added,
               CAST(COUNT(*) AS BIGINT) AS n_after
        FROM unioned GROUP BY cell_id
    """,
    tags=("similarity", "vector", "agg"),
    index_writer=True,
)
def sim_ivf_incremental_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell assignment delta for one ingest cycle: n_before comes
    from the PERSISTED index generation (the stored inverted file's
    per-cell sizes — K rows, read not recomputed); the batch (~10%) is
    assigned against the persisted FROZEN codebook (n_added); n_after
    is the maintained inverted file's new size per cell.  The oracle
    re-derives codebook and BOTH assignment sets from scratch (portable
    affine codebook hash, two-level routed rank-over-cosine — the
    audit_ivf_recall machinery), so a persisted generation that
    silently drifted — stale codebook, dropped vector, shifted cell id
    — shifts the integers and fails the hash compare.

    Plan (warm cycle, the registered cost — VERDICT r12 #2): two K-row
    parquet reads (codebook + counts, both broadcastable) + ONE
    filter-pushed scan of the batch slice + the O(|batch| x sqrt(K))
    routed assignment + a full-outer join of two K-row frames.  No
    corpus scan: the one O(corpus) pass is the generation build,
    amortized across cycles/sessions exactly like dedup_incremental's
    gram index (its probe measures the same warm shape).  At 100 TB the
    generation is the index store a maintainer owns; the batch is the
    day's arrivals."""
    from bigbugdata_spark.caching import pin
    from bigbugdata_spark.catalog import table
    from bigbugdata_spark.operators.similarity import ivf_assign

    from bigbugdata_spark.functions.fragments import IVF_K

    cb, cnt = ivf_index_generation(spark, sf_dir)
    # K for routing (sup_count): the build used scaled_ivf_k(n) =
    # max(IVF_K, floor(sqrt(n))) but wrote min(K, n) codebook rows
    # (ivf_cents' LIMIT on a corpus smaller than the floor).  max with
    # the floor reconstructs the build's K EXACTLY for every n (n >=
    # 256: rows = K >= 16; 16 <= n < 256: rows = 16 = K; n < 16:
    # rows = n < 16, K = 16) — a bare cb.count() would shrink the
    # supercell prefix on a tiny corpus and diverge from the oracle's
    # routing (r13 review finding).
    k = max(IVF_K, cb.count())  # K-row parquet — a footer read
    # pinned: the routed assignment references the batch twice (router
    # + exact rescore) — one filtered scan, not two (caching contract)
    batch = pin(
        table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding", H.norm(F.col("embedding")).alias("nrm"))
        .filter(incoming_vec_col())
    )
    added = (
        ivf_assign(batch, cb, k=k)
        .groupBy("cell_id")
        .agg(F.count(F.lit(1)).alias("n_added"))
    )
    return cnt.join(added, "cell_id", "full_outer").select(
        "cell_id",
        F.coalesce("n_before", F.lit(0)).cast("long").alias("n_before"),
        F.coalesce("n_added", F.lit(0)).cast("long").alias("n_added"),
        (F.coalesce("n_before", F.lit(0)) + F.coalesce("n_added", F.lit(0)))
        .cast("long")
        .alias("n_after"),
    )
