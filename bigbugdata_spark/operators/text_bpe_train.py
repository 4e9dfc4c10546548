"""BPE merge TRAINING (round 9) — the iterative half the tokenizer
surface was missing: text_bpe_pair_stats reports the first round's
pair counts; this runs the actual trainer loop — BPE_STEPS rounds of
(count adjacent symbol pairs over the word vocabulary) -> (pick the
most frequent pair, deterministic tie-break) -> (apply the merge to
every word's symbol sequence) — and returns the learned merge list,
the artifact a tokenizer ships.

No analog in the reference (SURVEY §2.1); text/tokenizer extension
surface, the third driver-controlled/executor-executed iterative
operator next to emb_kmeans_assign and connected_components.

Merge-application semantics (defined, engine-portable): symbol
sequences live as \\x1f-delimited strings; applying merge (a, b) is
TWO passes of plain left-to-right non-overlapping string replace of
"\\x1fa\\x1fb\\x1f" with "\\x1fab\\x1f".  Pass 1 is greedy BPE except
that a replacement consumes the trailing delimiter, hiding an
occurrence that starts exactly there; those misses are always isolated
between replaced blocks, so pass 2 catches all of them — for a != b
the two passes provably equal the textbook greedy left-to-right merge
(the unit test pins equality against an independent Python greedy
implementation on the real corpus).  SELF-pairs (a == b) are excluded
from candidacy: on runs like "aaaa" replace-based application diverges
from greedy (stragglers separate), and character runs are repetition
pathology (text_repetition_stats' beat), not vocabulary.  Both engines
implement the identical procedure, so the oracle re-derives the whole
M-round loop unrolled in SQL and the hash compare gates every round's
choice AND application.

Scale posture: state per round is the word VOCABULARY (word, freq,
symbols) — Heaps'-law bounded, shrinking in symbol count as merges
apply; each round is one vocabulary-sized pair aggregate (map-side
combinable on a charset^2-bounded key space early, vocab-bounded
later) + one orderBy(...).limit(1) argmax (TakeOrderedAndProject — a
one-row driver collect per round, the kmeans pattern) + one map-only
merge application, localCheckpointed so plans stay flat.  The driver
holds M merge rows and nothing else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigbugdata_spark.registry import register

BPE_STEPS = 6
_SEP = "\x1f"
_SEP_SQL = "chr(31)"
_SEP_EXPR = "'\\u001f'"


def _sql_round(r: int) -> str:
    """CTEs for round r: pair counts p{r} from vocab v{r}, the argmax
    b{r}, and the merged vocabulary v{r+1}."""
    return f"""
    e{r} AS (
        SELECT freq,
               list_filter(string_split(s, {_SEP_SQL}), x -> x != '') AS syms
        FROM v{r}
    ),
    p{r} AS (
        SELECT pr['a'] AS a, pr['b'] AS b, CAST(SUM(freq) AS BIGINT) AS c
        FROM (
            SELECT freq, unnest(list_transform(range(1, len(syms)),
                   i -> {{'a': syms[i], 'b': syms[i + 1]}})) AS pr
            FROM e{r}
        )
        WHERE pr['a'] != pr['b']
        GROUP BY a, b
    ),
    b{r} AS (
        SELECT {r} AS step, a, b, c
        FROM p{r} ORDER BY c DESC, a, b LIMIT 1
    ),
    v{r + 1} AS (
        -- LEFT JOIN ON TRUE + COALESCE instead of a cross join: when
        -- pair candidates dry up before BPE_STEPS rounds, b{r} is
        -- empty and a cross join would EMPTY the vocabulary — the
        -- fallback keeps v{r} verbatim, matching the Spark trainer's
        -- loop break (advisory r9)
        SELECT word, freq,
               COALESCE(replace(replace(s,
                   {_SEP_SQL} || b{r}.a || {_SEP_SQL} || b{r}.b || {_SEP_SQL},
                   {_SEP_SQL} || b{r}.a || b{r}.b || {_SEP_SQL}),
                   {_SEP_SQL} || b{r}.a || {_SEP_SQL} || b{r}.b || {_SEP_SQL},
                   {_SEP_SQL} || b{r}.a || b{r}.b || {_SEP_SQL}), s) AS s
        FROM v{r} LEFT JOIN b{r} ON TRUE
    )"""


_TRAIN_ORACLE_SQL = (
    """
    WITH toks AS (
        SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w
        FROM documents
    ),
    v0 AS (
        SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS freq,
               """
    + _SEP_SQL
    + " || regexp_replace(w, '(.)', '\\1' || "
    + _SEP_SQL
    + """, 'g') AS s
        FROM toks WHERE regexp_matches(w, '^[a-z0-9]+$') GROUP BY w
    ),"""
    + ",".join(_sql_round(r) for r in range(BPE_STEPS))
    + f"""
    SELECT CAST(step AS BIGINT) AS step, a AS lhs, b AS rhs,
           c AS pair_count
    FROM ({" UNION ALL ".join(f"SELECT * FROM b{r}" for r in range(BPE_STEPS))})
    """
)


def _word_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigbugdata_spark.catalog import table

    toks = table(spark, sf_dir, "documents").select(
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w")
    )
    return (
        toks.filter(F.col("w").rlike("^[a-z0-9]+$"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            F.col("w").alias("word"),
            "freq",
            F.concat(
                F.lit(_SEP), F.regexp_replace("w", "(.)", "$1" + _SEP)
            ).alias("s"),
        )
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    with_syms = vocab.withColumn(
        "syms", F.expr(f"filter(split(s, {_SEP_EXPR}), x -> x != '')")
    )
    return (
        with_syms.where(F.size("syms") >= 2)
        .select(
            "freq",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(syms) - 1), i -> "
                    "struct(element_at(syms, i) AS a, "
                    "element_at(syms, i + 1) AS b))"
                )
            ).alias("pr"),
        )
        .where(F.col("pr.a") != F.col("pr.b"))
        .groupBy("pr.a", "pr.b")
        .agg(F.sum("freq").alias("c"))
    )


@register(
    "text_bpe_train",
    oracle=_TRAIN_ORACLE_SQL,
    tags=("text", "iterative", "agg"),
)
def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned merge list: (step, lhs, rhs, pair_count) for
    BPE_STEPS rounds of most-frequent-adjacent-pair merging over the
    alphanumeric word vocabulary (count DESC, lhs, rhs tie-break; self
    pairs excluded — module docstring)."""
    vocab = _word_vocab(spark, sf_dir).localCheckpoint()
    merges = []
    for step in range(BPE_STEPS):
        best = (
            _pair_counts(vocab)
            .orderBy(F.desc("c"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, c = best[0]["a"], best[0]["b"], best[0]["c"]
        merges.append((step, a, b, c))
        pat = F.concat(F.lit(_SEP + a + _SEP + b + _SEP))
        rep = F.concat(F.lit(_SEP + a + b + _SEP))
        merged = F.replace(F.replace(F.col("s"), pat, rep), pat, rep)
        vocab = vocab.withColumn("s", merged).localCheckpoint()
    return spark.createDataFrame(
        merges, "step long, lhs string, rhs string, pair_count long"
    )


_COMPRESSION_ORACLE_SQL = (
    _TRAIN_ORACLE_SQL[: _TRAIN_ORACLE_SQL.rindex("SELECT CAST(step")]
    + f"""SELECT
        CAST(COUNT(*) AS BIGINT) AS n_words,
        CAST(SUM(freq) AS BIGINT) AS n_tokens,
        CAST(SUM(freq * length(word)) AS BIGINT) AS base_symbols,
        CAST(SUM(freq * len(list_filter(string_split(s, {_SEP_SQL}),
                                        x -> x != ''))) AS BIGINT)
            AS merged_symbols,
        CAST(CAST((SUM(freq * length(word))
              - SUM(freq * len(list_filter(string_split(s, {_SEP_SQL}),
                                           x -> x != '')))) * 1000
             AS BIGINT) // SUM(freq * length(word)) AS BIGINT) AS saved_pm
    FROM v{BPE_STEPS}
    """
)


@register(
    "text_bpe_compression",
    oracle=_COMPRESSION_ORACLE_SQL,
    tags=("text", "iterative", "agg"),
)
def text_bpe_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What the learned merges BUY, measured on the training corpus:
    distinct words, corpus token occurrences, symbol count before any
    merge (= character count) and after BPE_STEPS merges, and the
    integer-permille symbol saving.  Runs the identical training loop
    and aggregates the FINAL vocabulary state — the oracle reuses the
    trainer's unrolled rounds and aggregates its last-round vocabulary
    CTE, so the applied merges (not just the chosen pairs) are
    hash-gated corpus-wide."""
    vocab = _word_vocab(spark, sf_dir).localCheckpoint()
    for _ in range(BPE_STEPS):
        best = (
            _pair_counts(vocab)
            .orderBy(F.desc("c"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b = best[0]["a"], best[0]["b"]
        pat = F.lit(_SEP + a + _SEP + b + _SEP)
        rep = F.lit(_SEP + a + b + _SEP)
        vocab = vocab.withColumn(
            "s", F.replace(F.replace(F.col("s"), pat, rep), pat, rep)
        ).localCheckpoint()
    n_syms = F.size(F.expr(f"filter(split(s, {_SEP_EXPR}), x -> x != '')"))
    return vocab.agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("freq").alias("n_tokens"),
        F.sum(F.col("freq") * F.length("word")).alias("base_symbols"),
        F.sum(F.col("freq") * n_syms).alias("merged_symbols"),
        (
            (
                F.sum(F.col("freq") * F.length("word"))
                - F.sum(F.col("freq") * n_syms)
            )
            * 1000
        )
        .cast("long")
        .alias("_num"),
    ).select(
        "n_words",
        "n_tokens",
        "base_symbols",
        "merged_symbols",
        F.expr("_num div base_symbols").alias("saved_pm"),
    )
