"""Maximal Marginal Relevance selection (round 11) — the diversity
sampler a curation/eval pipeline runs where plain top-k returns k
near-duplicates: greedily pick MMR_K vectors maximizing
0.7 * relevance - 0.3 * max-similarity-to-already-selected, so each
pick is relevant to the probe query AND far from everything picked
before.  The standard Carbonell-Goldstein MMR, and the query-time
complement of sim_semantic_keep's corpus-side diversity rule — one
builds the dedup'd corpus, this builds a diverse WORKING SET (few-shot
pools, eval seeds, annotation batches).

No analog in the reference (SURVEY §2.1); similarity extension
surface, the fifth driver-controlled/executor-executed iterative
operator (kmeans, connected components, BPE, PageRank precedent).

Determinism (the repo's iterative discipline): every cosine is the
shared left-to-right fp64 dot (identical expression trees both
engines), the 0.7/0.3 blend is two fp64 literal multiplies of
identical inputs, MAX is order-free, and ties break (score DESC,
vec_id ASC) — so both engines pick the identical sequence and the
oracle unrolls the identical MMR_K rounds in SQL.  The reported score
is pinned to integer micro-units.

Scale posture: relevance is ONE corpus scan against the broadcast
query vector, checkpointed; each round joins the corpus-sized
candidate frame against the <= MMR_K selected vectors (a literal
broadcast rebuilt from driver-held rows) and takes a
TakeOrderedAndProject argmax — one small job per round, one-row
collects only (the kmeans/BPE pattern).  At 100 TB the candidate
frame would first be pruned to an ANN shortlist (sim_ivf_topk); the
greedy loop itself only ever holds MMR_K rows of driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigbugdata_spark.functions import hashing as H
from bigbugdata_spark.functions.fragments import EMB_DIM, N_QUERIES
from bigbugdata_spark.registry import register

MMR_K = 8
_LAM, _ONE_MINUS_LAM = "0.7", "0.3"  # fp64 literals, identical both engines

# Every CTE is AS MATERIALIZED: each round references the previous
# selection 2-3 times, and DuckDB's default CTE inlining re-expands
# the whole chain per reference — exponential in MMR_K (measured: the
# un-hinted oracle ran minutes-plus at sf0.001; materialized, 0.5 s).
_CORPUS_CTE = f"""
    corpus AS MATERIALIZED (
        SELECT vec_id, embedding,
               {H.sql_norm('embedding', EMB_DIM)} AS nrm
        FROM embeddings
    ),
    q AS MATERIALIZED (
        SELECT embedding AS q_emb, nrm AS q_nrm FROM corpus WHERE vec_id = 0
    ),
    cand AS MATERIALIZED (
        SELECT c.vec_id, c.embedding, c.nrm,
               {H.sql_dot('c.embedding', 'q.q_emb', EMB_DIM)}
                   / (c.nrm * q.q_nrm) AS rel
        FROM corpus c CROSS JOIN q
        WHERE c.vec_id >= {N_QUERIES}
    )"""


def _sql_round(r: int) -> str:
    """CTEs for round r >= 2: per-candidate max similarity to the
    selected set, the blended argmax, and the grown selection."""
    pen_dot = H.sql_dot("c.embedding", "s.embedding", EMB_DIM)
    return f"""
    p{r} AS MATERIALIZED (
        SELECT c.vec_id, MAX({pen_dot} / (c.nrm * s.nrm)) AS pen
        FROM cand c
        JOIN cand s ON s.vec_id IN (SELECT vec_id FROM sel{r - 1})
        WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{r - 1})
        GROUP BY c.vec_id
    ),
    b{r} AS MATERIALIZED (
        SELECT CAST({r} AS BIGINT) AS step, c.vec_id,
               {_LAM} * c.rel - {_ONE_MINUS_LAM} * p.pen AS score
        FROM cand c JOIN p{r} p ON c.vec_id = p.vec_id
        ORDER BY score DESC, c.vec_id ASC LIMIT 1
    ),
    sel{r} AS MATERIALIZED (
        SELECT vec_id FROM sel{r - 1} UNION ALL SELECT vec_id FROM b{r}
    )"""


_MMR_SQL = (
    f"""
    WITH {_CORPUS_CTE},
    b1 AS MATERIALIZED (
        SELECT CAST(1 AS BIGINT) AS step, vec_id, rel AS score
        FROM cand ORDER BY rel DESC, vec_id ASC LIMIT 1
    ),
    sel1 AS MATERIALIZED (SELECT vec_id FROM b1),"""
    + ",".join(_sql_round(r) for r in range(2, MMR_K + 1))
    + f"""
    SELECT step, vec_id,
           CAST(ROUND(score * 1000000) AS BIGINT) AS score_ppm
    FROM ({" UNION ALL ".join(f"SELECT * FROM b{r}" for r in range(1, MMR_K + 1))})
    """
)


@register(
    "sim_mmr_topk",
    oracle=_MMR_SQL,
    tags=("similarity", "vector", "iterative"),
)
def sim_mmr_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(step, vec_id, score_ppm): the MMR_K greedy diversity picks
    against query vector 0 — step 1 is pure relevance, later steps
    blend 0.7*rel - 0.3*max-cos-to-selected; ties to the smaller id."""
    from bigbugdata_spark.operators.similarity import _corpus

    corpus = _corpus(spark, sf_dir)
    q = corpus.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb"), F.col("nrm").alias("q_nrm")
    )
    cand = (
        corpus.filter(F.col("vec_id") >= N_QUERIES)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "embedding",
            "nrm",
            (
                H.dot(F.col("embedding"), F.col("q_emb"))
                / (F.col("nrm") * F.col("q_nrm"))
            ).alias("rel"),
        )
        .localCheckpoint()
    )
    picks: list[tuple[int, int, float]] = []  # (step, vec_id, score)
    sel_rows: list = []  # driver-held selected (vec_id, embedding, nrm)
    for step in range(1, MMR_K + 1):
        if not sel_rows:
            scored = cand.select("vec_id", F.col("rel").alias("score"))
        else:
            sel_df = spark.createDataFrame(
                sel_rows, "s_id long, s_emb array<float>, s_nrm double"
            )
            remaining = cand.filter(
                ~F.col("vec_id").isin([r[0] for r in sel_rows])
            )
            pen = (
                remaining.crossJoin(F.broadcast(sel_df))
                .select(
                    "vec_id",
                    "rel",
                    (
                        H.dot(F.col("embedding"), F.col("s_emb"))
                        / (F.col("nrm") * F.col("s_nrm"))
                    ).alias("sim"),
                )
                .groupBy("vec_id", "rel")
                .agg(F.max("sim").alias("pen"))
            )
            scored = pen.select(
                "vec_id",
                (
                    F.lit(float(_LAM)) * F.col("rel")
                    - F.lit(float(_ONE_MINUS_LAM)) * F.col("pen")
                ).alias("score"),
            )
        best = (
            scored.orderBy(F.desc("score"), F.asc("vec_id")).limit(1).collect()
        )
        if not best:
            break
        vid, score = best[0]["vec_id"], best[0]["score"]
        picks.append((step, vid, score))
        emb_row = cand.filter(F.col("vec_id") == vid).select(
            "vec_id", "embedding", "nrm"
        ).collect()[0]
        sel_rows.append((emb_row[0], emb_row[1], emb_row[2]))
    return spark.createDataFrame(
        [(s, v, sc) for s, v, sc in picks], "step long, vec_id long, score double"
    ).select(
        "step",
        "vec_id",
        F.round(F.col("score") * 1_000_000).cast("long").alias("score_ppm"),
    )
