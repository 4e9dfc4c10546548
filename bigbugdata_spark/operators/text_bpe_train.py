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

Shared internals (CTE chain, vocab builders, the trainer loop) live in
the non-registering operators/text_bpe_core.py so sibling query modules
can import them without dragging this module's registrations into the
driver cap (ADVICE r11 + scd_core pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigbugdata_spark.operators.text_bpe_core import (
    BPE_STEPS,
    SEP_EXPR as _SEP_EXPR,
    SEP_SQL as _SEP_SQL,
    TRAIN_CTES as _TRAIN_CTES,
    TRAIN_ORACLE_SQL as _TRAIN_ORACLE_SQL,
    train as _train,
)
from bigbugdata_spark.registry import register

# Back-compat aliases: tests and older callers import these from here.
_SEP = "\x1f"


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
    _, merges = _train(spark, sf_dir)
    return spark.createDataFrame(
        merges, "step long, lhs string, rhs string, pair_count long"
    )


# text_bpe_compression moved to operators/text_bpe_compression.py
# (r18 rotation split: text_bpe_train sits in the driver cap; the
# compression roll-up — same trainer core — yields its slot to the
# other r17-restructured paths).
