"""Cross-engine hash fuzz: the oracle-parity of every hashing-based
operator rests on functions/hashing.py producing bit-identical values in
Spark and DuckDB. The corpus tests exercise one fixed vocabulary; this
fuzz sweeps randomized text (unicode letters, digits, punctuation, odd
whitespace runs, short/long docs) through BOTH engines and demands exact
equality of token hashes, shingle sets and fingerprints."""

from __future__ import annotations

import random
import string

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from bigbugdata_spark.functions import hashing as H

_ALPHABETS = [
    string.ascii_lowercase,
    string.ascii_letters + string.digits,
    "äöüßéèñçø",  # latin-extended
    "日本語中文한국",  # CJK
    string.punctuation.replace("'", ""),
]


def _rand_text(rng: random.Random) -> str:
    n_words = rng.randint(1, 60)
    words = []
    for _ in range(n_words):
        alpha = rng.choice(_ALPHABETS)
        words.append("".join(rng.choice(alpha) for _ in range(rng.randint(1, 12))))
    # odd whitespace: runs of spaces/tabs, leading/trailing
    sep = lambda: rng.choice([" ", "  ", "\t", " \t "])  # noqa: E731
    body = words[0] + "".join(sep() + w for w in words[1:])
    return rng.choice(["", " ", "\t"]) + body + rng.choice(["", " "])


@pytest.fixture(scope="module")
def corpus():
    rng = random.Random(0xF022)
    return pd.DataFrame(
        {"doc_id": range(200), "text": [_rand_text(rng) for _ in range(200)]}
    )


def test_hash_primitives_cross_engine(spark, corpus):
    sdf = spark.createDataFrame(corpus)
    got = (
        sdf.select(
            "doc_id",
            H.word_hashes(H.tokens(F.col("text"))).alias("whs"),
            H.shingle_hashes(H.word_hashes(H.tokens(F.col("text")))).alias("grams"),
            H.text_fingerprint(F.col("text")).alias("fp"),
        )
        .orderBy("doc_id")
        .collect()
    )

    con = duckdb.connect()
    con.register("docs", corpus)
    want = con.execute(
        f"""
        SELECT doc_id,
               {H.sql_word_hashes(H.sql_tokens('text'))} AS whs,
               {H.sql_shingle_hashes(H.sql_word_hashes(H.sql_tokens('text')))} AS grams,
               {H.sql_text_fingerprint('text')} AS fp
        FROM docs ORDER BY doc_id
        """
    ).fetchall()

    assert len(got) == len(want) == 200
    for g, w in zip(got, want):
        # word hashes are positional -> exact order; shingle sets are
        # consumed as sets everywhere (explode / intersect / minhash-min)
        # and DuckDB's list_distinct does not preserve encounter order
        assert list(g["whs"]) == list(w[1]), f"word hashes diverge at doc {g['doc_id']}"
        assert sorted(g["grams"]) == sorted(w[2]), f"shingles diverge at doc {g['doc_id']}"
        assert len(g["grams"]) == len(w[2])
        assert g["fp"] == w[3], f"fingerprint diverges at doc {g['doc_id']}"
