"""Cross-engine deterministic text/vector hashing primitives.

Every primitive here exists twice, in lockstep: a Spark Column builder
(built-in higher-order functions — JVM-side, whole-stage codegen, no
Python UDFs) and a DuckDB SQL-string builder used by the oracle twins.
Both compute bit-identical BIGINT values, so MinHash / SimHash /
fingerprint operators get EXACT oracle parity instead of rows-only checks.

Core primitive: a base-31 rolling polynomial hash of a word's characters
mod P (Spark `aggregate` with 0 init == DuckDB `list_reduce`, verified:
first step (0*31+c)%P == c). Word-n-gram (shingle) hashes combine word
hashes positionally; MinHash permutations are (a*h+b) mod P with literal
seeded coefficients; SimHash-32 spreads the 30-bit rolling hash over 32
bits with a Knuth multiplicative step. All intermediates stay < 2^63.

These are the utilities the reference lacks entirely (its only hash use
is python dict/set membership, ref bigbugdata.py:239-245) — they exist
for the LLM-pipeline extension operators (SURVEY.md §7 phase 3).
"""

from __future__ import annotations

import random

from pyspark.sql import Column
from pyspark.sql import functions as F

P = 1_000_000_007  # rolling-hash modulus (30 bits)
KNUTH = 2_654_435_761  # multiplicative spreader for simhash bits
M32 = 1 << 32

# MinHash permutation coefficients: fixed literals from a seeded RNG so
# signatures are reproducible across sessions AND across engines.
_rng = random.Random(0x5EED)
N_HASHES = 64
MINHASH_A = tuple(_rng.randrange(1, P) for _ in range(N_HASHES))
MINHASH_B = tuple(_rng.randrange(0, P) for _ in range(N_HASHES))


# ---------------------------------------------------------------------------
# Spark column builders
# ---------------------------------------------------------------------------


def tokens(text: Column) -> Column:
    """Whitespace tokens of the lowercased text."""
    return F.split(F.lower(F.trim(text)), r"\s+")


def word_hash(word: Column) -> Column:
    """Base-31 rolling hash of the word's characters, mod P."""
    return F.aggregate(
        F.split(word, ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * F.lit(31) + F.ascii(c)) % F.lit(P),
    )


def word_hashes(toks: Column) -> Column:
    """Per-token rolling hashes (order + multiplicity preserved)."""
    return F.transform(toks, word_hash)


def let_bound(expr: Column, body) -> Column:
    """Let-binding for HOF pipelines: evaluate `expr` ONCE and pass the
    materialized value to `body`.

    Interpreted higher-order functions re-evaluate any non-trivial child
    expression every time a lambda body references it — e.g. three
    element_at(word_hashes(...), i) references inside a shingle lambda
    re-run the whole char-level hash per shingle per position (~100x
    blowup, measured). transform over a single-element array binds the
    evaluated value to the lambda variable instead."""
    return F.element_at(F.transform(F.array(expr), body), 1)


def shingle_hashes(whs: Column, n: int = 3, distinct: bool = True) -> Column:
    """Hashes of word n-grams, combining word hashes positionally:
    h(g_i) = (sum_j wh[i+j] * 31^(n-1-j)) mod P. Empty when < n tokens.
    distinct=True gives the set form (Jaccard/MinHash); False keeps
    positional multiplicity (occurrence counting). Horner evaluation
    (mod at every step — the same residue as the positional-coefficient
    sum, but intermediates stay < 32*P, overflow-safe for any n)."""

    def body(bound: Column) -> Column:
        def gram(i: Column) -> Column:
            acc = F.lit(0).cast("long")
            for j in range(n):
                acc = (acc * F.lit(31) + F.element_at(bound, i + F.lit(j))) % F.lit(P)
            return acc

        grams = F.transform(F.sequence(F.lit(1), F.size(bound) - (n - 1)), gram)
        if distinct:
            grams = F.array_distinct(grams)
        return F.when(F.size(bound) >= n, grams).otherwise(
            F.array().cast("array<bigint>")
        )

    return let_bound(whs, body)


def minhash_term(h: Column, j: int) -> Column:
    """The j-th MinHash permutation of one shingle hash: (a_j*h+b_j) mod P.

    Signatures are computed as explode(shingles) -> groupBy(doc) with 64
    MIN(minhash_term(h, j)) aggregates rather than one giant nested-HOF
    array expression: post-Aggregate columns are physically materialized,
    so Catalyst's CollapseProject cannot inline (and so re-evaluate) the
    signature into every downstream band-key expression — the naive array
    formulation re-ran all 64 permutations 16x per row."""
    return (F.lit(MINHASH_A[j]) * h + F.lit(MINHASH_B[j])) % F.lit(P)


def spread32(h: Column) -> Column:
    """Knuth-spread the 30-bit rolling hash over 32 bits (simhash input)."""
    return (h * F.lit(KNUTH)) % F.lit(M32)


def simhash_vote(h32: Column, j: int) -> Column:
    """+/-1 vote of bit j of a spread word hash — SUM over a doc's words
    then sign gives simhash bit j (same materialize-behind-an-Aggregate
    rationale as minhash_term)."""
    return F.lit(2) * ((h32 / F.lit(1 << j)).cast("long") % F.lit(2)) - F.lit(1)


def text_fingerprint(text: Column) -> Column:
    """Order-sensitive document fingerprint: rolling hash over the token
    hash sequence (multiplicity + order preserved), mod P."""
    return F.aggregate(
        word_hashes(tokens(text)),
        F.lit(0).cast("long"),
        lambda acc, h: (acc * F.lit(1_000_003) + h) % F.lit(P),
    )


def dot(a: Column, b: Column) -> Column:
    """Float-array dot product in double precision, summed left-to-right
    (matches the oracle's list_reduce order for bit-identical results).

    Measured r10, do not "optimize": unrolling this to a fixed 64-term
    element_at chain (bit-identical association) made the all-nodes kNN
    scoring 4x SLOWER (5.2 s -> 20 s warm at sf0.1) — the deep chained
    expression falls out of codegen while the HOF fold stays in the
    vectorized array path.  The aggregate/zip_with form IS the fast
    path."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def dot_slice(a: Column, b: Column, off: int, d: int) -> Column:
    """Sub-vector dot product over elements off+1..off+d (1-based),
    left-to-right fp64 reduction — the PQ subspace primitive, in
    lockstep with sql_dot_slice."""
    return F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.lit(d)),
            lambda i: F.element_at(a, F.lit(off) + i).cast("double")
            * F.element_at(b, F.lit(off) + i).cast("double"),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_slice(a: Column, b: Column, off: int, d: int) -> Column:
    """Sub-vector squared L2 distance over off+1..off+d (1-based),
    left-to-right fp64 reduction (sql_l2_slice twin)."""

    def term(i):
        diff = F.element_at(a, F.lit(off) + i).cast("double") - F.element_at(
            b, F.lit(off) + i
        ).cast("double")
        return diff * diff

    return F.aggregate(
        F.transform(F.sequence(F.lit(1), F.lit(d)), term),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


# ---------------------------------------------------------------------------
# DuckDB SQL-string builders (the oracle twins of the above)
# ---------------------------------------------------------------------------


def sql_tokens(text: str) -> str:
    return f"regexp_split_to_array(lower(trim({text})), '\\s+')"


def sql_word_hash(word: str) -> str:
    """Single-word twin of `word_hash` (list_reduce's first step acc=c1
    equals Spark's (0*31+c1)%P because c1 < P)."""
    return (
        f"list_reduce(list_transform(string_split({word}, ''), "
        f"c -> ascii(c)::BIGINT), (acc, x) -> (acc*31 + x) % {P})"
    )


def sql_word_hashes(toks: str) -> str:
    # list_reduce has no init; its first step (acc=c1) equals Spark's
    # (0*31+c1)%P because c1 < P.
    return (
        f"list_transform({toks}, w -> list_reduce("
        f"list_transform(string_split(w, ''), c -> ascii(c)::BIGINT), "
        f"(acc, x) -> (acc*31 + x) % {P}))"
    )


def sql_shingle_hashes(whs: str, n: int = 3, distinct: bool = True) -> str:
    expr = "0"
    for j in range(n):
        expr = f"(({expr})*31 + {whs}[i+{j}]) % {P}"
    inner = f"list_transform(range(1, len({whs}) - {n - 2}), i -> {expr})"
    return f"list_distinct({inner})" if distinct else inner


def sql_simhash32(whs: str) -> str:
    terms = " + ".join(
        f"(CASE WHEN list_sum(list_transform({whs}, "
        f"h -> 2*((((h*{KNUTH}) % {M32}) // {1 << j}) % 2) - 1)) > 0 "
        f"THEN {1 << j}::BIGINT ELSE 0::BIGINT END)"
        for j in range(32)
    )
    return f"({terms})"


def sql_text_fingerprint(text: str) -> str:
    return (
        f"list_reduce(list_prepend(0::BIGINT, {sql_word_hashes(sql_tokens(text))}), "
        f"(acc, h) -> (acc*1000003 + h) % {P})"
    )


def sql_dot(a: str, b: str, dim: int) -> str:
    return (
        f"list_reduce(list_prepend(0.0, list_transform(range(1, {dim + 1}), "
        f"i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE)), (acc, v) -> acc + v)"
    )


def sql_norm(a: str, dim: int) -> str:
    return f"sqrt({sql_dot(a, a, dim)})"


def sql_dot_slice(a: str, b: str, off: str, d: int) -> str:
    """DuckDB twin of dot_slice; `off` may be a SQL expression."""
    return (
        f"list_reduce(list_prepend(0.0, list_transform(range(1, {d + 1}), "
        f"i -> {a}[({off})+i]::DOUBLE * {b}[({off})+i]::DOUBLE)), "
        f"(acc, v) -> acc + v)"
    )


def sql_l2_slice(a: str, b: str, off: str, d: int) -> str:
    """DuckDB twin of l2_slice; `off` may be a SQL expression."""
    return (
        f"list_reduce(list_prepend(0.0, list_transform(range(1, {d + 1}), "
        f"i -> ({a}[({off})+i]::DOUBLE - {b}[({off})+i]::DOUBLE) "
        f"* ({a}[({off})+i]::DOUBLE - {b}[({off})+i]::DOUBLE))), "
        f"(acc, v) -> acc + v)"
    )
