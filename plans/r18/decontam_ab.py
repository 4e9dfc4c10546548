#!/usr/bin/env python
"""text_decontaminate A/B (VERDICT r17 #6): the r17 bench-side
pre-aggregate (one row per gram + collect_set of bench ids, no Expand)
measured 12-20% SLOWER than the old two-COUNT(DISTINCT) form in both
driver runs at sf0.1.  Re-measure in one session, interleaved, at
sf0.1 AND x10; revert the registered shape if still >=10% worse at
both sizes.

    python plans/r18/decontam_ab.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from bigbugdata_spark.operators.corpus_decontam import (  # noqa: E402
    _BENCH_MOD,
    _decon_grams,
)
from bigbugdata_spark.catalog import table  # noqa: E402
from bigbugdata_spark.session import get_spark  # noqa: E402

ITERS = 6


def new_shape(spark, sf_dir):
    """The registered r17 form: per-gram pre-aggregate, no Expand."""
    grams = _decon_grams(table(spark, sf_dir, "documents"))
    bench_side = grams.filter(F.col("doc_id") % _BENCH_MOD == 0)
    corpus = grams.filter(F.col("doc_id") % _BENCH_MOD != 0)
    per_gram = bench_side.groupBy("gram_hash").agg(
        F.collect_set("doc_id").alias("bids")
    )
    return (
        corpus.join(F.broadcast(per_gram), "gram_hash")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shared_grams"),
            F.size(F.array_distinct(F.flatten(F.collect_list("bids"))))
            .cast("long")
            .alias("n_bench_docs"),
        )
    )


def old_shape(spark, sf_dir):
    """The pre-r17 form: broadcast (gram, bench_id) rows, join fans out
    per bench doc, two COUNT(DISTINCT) -> Expand x2 + second exchange."""
    grams = _decon_grams(table(spark, sf_dir, "documents"))
    bench_side = grams.filter(F.col("doc_id") % _BENCH_MOD == 0).select(
        F.col("doc_id").alias("bench_id"), "gram_hash"
    )
    corpus = grams.filter(F.col("doc_id") % _BENCH_MOD != 0)
    return (
        corpus.join(F.broadcast(bench_side), "gram_hash")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("gram_hash").cast("long").alias("n_shared_grams"),
            F.countDistinct("bench_id").cast("long").alias("n_bench_docs"),
        )
    )


def measure(spark, fn, sf_dir):
    spark.catalog.clearCache()
    runs = []
    for _ in range(ITERS):
        df = fn(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        runs.append(round(time.perf_counter() - t0, 4))
    return runs


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/decontam_ab.json"
    spark = get_spark(app_name="decontam-ab")
    sf = bench.SF_DIR
    x10 = bench._build_scale_dir(spark)

    # equivalence once (sf0.1): symdiff must be 0
    a = new_shape(spark, sf)
    b = old_shape(spark, sf)
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    print("symdiff:", diff)
    assert diff == 0

    res = {"iterations": ITERS, "symdiff": diff,
           "spark_canary_sec": bench._spark_canary(spark), "trials": []}
    # interleaved: new/old alternating, two trials per size
    for size_name, d in (("sf0.1", sf), ("x10", x10)):
        for trial in range(2):
            for label, fn in (("new", new_shape), ("old", old_shape)):
                runs = measure(spark, fn, d)
                res["trials"].append(
                    {"size": size_name, "trial": trial, "shape": label,
                     "runs": runs, "min": min(runs)}
                )
                print(size_name, trial, label, min(runs), runs)
    res["closing_spark_canary_sec"] = bench._spark_canary(spark)
    with open(out_path, "w") as fh:
        json.dump(res, fh, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
