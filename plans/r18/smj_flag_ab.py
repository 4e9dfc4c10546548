#!/usr/bin/env python
"""A/B for the SMJ order-flag fixes (VERDICT r17 #8, guide §3.1):

1. ivf_candidates: broadcast the bounded probe list vs the flagged
   sort-merge join on cell_id (timed at the candidate frame — the
   downstream of both variants is identical).
2. pipe_semantic_guard / sim_semantic_keep final corpus-side component
   join, and sim_semantic_clusters' majority x sizes join: SHUFFLE_HASH
   on the aggregate side vs the flagged SMJ (full query timed; the
   aggregate side is component-count-proportional so broadcast is NOT
   safe at scale — the hash join only avoids the sorts).

Interleaved ABAB x3, min-of-4 noop per run, canaries bracketed.
    python plans/r18/smj_flag_ab.py [out.json]
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
from pyspark.sql.window import Window  # noqa: E402
from bigbugdata_spark.catalog import table  # noqa: E402
from bigbugdata_spark.session import get_spark  # noqa: E402

SF = bench.SF_DIR
TRIALS = 3
ITERS = 4


def ivf_cand(spark, broadcast):
    from bigbugdata_spark.functions.fragments import scaled_ivf_k, scaled_n_probe
    from bigbugdata_spark.operators.similarity import (
        _corpus, ivf_assign, ivf_cents, ivf_probes, ivf_queries,
    )

    corpus = _corpus(spark, SF)
    k = scaled_ivf_k(corpus.count())
    cents = ivf_cents(corpus, k=k)
    assign = ivf_assign(corpus, cents, k=k)
    probes = ivf_probes(ivf_queries(corpus), cents, n_probe=scaled_n_probe(k))
    left = F.broadcast(probes) if broadcast else probes
    return (
        left.join(assign, "cell_id")
        .select("query_id", "vec_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .distinct()
    )


def guard(spark, shj):
    from bigbugdata_spark.operators.pipeline_guard import PURITY_T
    from bigbugdata_spark.operators.similarity_graph_core import components

    comp = components(spark, SF)
    emb = table(spark, SF, "embeddings").select("vec_id", "label")
    label_counts = (
        comp.join(emb, "vec_id").groupBy("component", "label")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    stats = label_counts.groupBy("component").agg(
        F.sum("n").alias("cluster_size"),
        (F.max("n").cast("double") / F.sum("n")).alias("purity"),
    )
    if shj:
        stats = stats.hint("shuffle_hash")
    applied = F.col("purity") >= F.lit(PURITY_T)
    return comp.join(stats, "component").select(
        "vec_id", "component", "cluster_size", "purity",
        applied.cast("int").alias("rule_applied"),
        F.when(applied, (F.col("vec_id") == F.col("component")).cast("int"))
        .otherwise(F.lit(1)).alias("kept"),
    )


def keep(spark, shj):
    from bigbugdata_spark.operators.similarity_graph_core import components

    comp = components(spark, SF)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    if shj:
        sizes = sizes.hint("shuffle_hash")
    return comp.join(sizes, "component").select(
        "vec_id", "component", "cluster_size",
        (F.col("vec_id") == F.col("component")).cast("int").alias("keep"),
    )


def clusters(spark, shj):
    from bigbugdata_spark.operators.similarity_graph_core import components

    comp = components(spark, SF)
    emb = table(spark, SF, "embeddings").select("vec_id", "label")
    label_counts = (
        comp.join(emb, "vec_id").select("component", "label")
        .groupBy("component", "label").agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("component").orderBy(F.desc("n"), F.asc("label"))
    majority = (
        label_counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("component", F.col("label").alias("majority_label"),
                F.col("n").alias("n_majority"))
    )
    sizes = label_counts.groupBy("component").agg(F.sum("n").alias("n_vecs"))
    if shj:
        sizes = sizes.hint("shuffle_hash")
    return majority.join(sizes, "component").select(
        "component", "n_vecs", "majority_label", "n_majority",
        (F.col("n_majority").cast("double") / F.col("n_vecs")).alias("purity"),
    )


TARGETS = {
    "ivf_candidates": ivf_cand,
    "pipe_semantic_guard": guard,
    "sim_semantic_keep": keep,
    "sim_semantic_clusters": clusters,
}


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/smj_flag_ab.json"
    spark = get_spark(app_name="smj-flag-ab")
    res = {"iterations": ITERS, "trials": TRIALS,
           "spark_canary_sec": bench._spark_canary(spark), "targets": {}}
    for name, fn in TARGETS.items():
        # equivalence: symdiff 0 between variants
        a, b = fn(spark, True), fn(spark, False)
        diff = a.exceptAll(b).count() + b.exceptAll(a).count()
        entry = {"symdiff": diff, "runs": []}
        assert diff == 0, name
        for trial in range(TRIALS):
            for label, flag in (("new", True), ("old", False)):
                spark.catalog.clearCache()
                runs = []
                for _ in range(ITERS):
                    df = fn(spark, flag)
                    t0 = time.perf_counter()
                    df.write.format("noop").mode("overwrite").save()
                    runs.append(round(time.perf_counter() - t0, 4))
                entry["runs"].append({"trial": trial, "shape": label,
                                      "min": min(runs), "all": runs})
                print(name, trial, label, min(runs), runs, flush=True)
        entry["min_new"] = min(r["min"] for r in entry["runs"] if r["shape"] == "new")
        entry["min_old"] = min(r["min"] for r in entry["runs"] if r["shape"] == "old")
        res["targets"][name] = entry
    res["closing_spark_canary_sec"] = bench._spark_canary(spark)
    with open(out_path, "w") as fh:
        json.dump(res, fh, indent=1)
    print("wrote", out_path)
    for n, e in res["targets"].items():
        print(n, "new", e["min_new"], "old", e["min_old"])


if __name__ == "__main__":
    main()
