#!/usr/bin/env python
"""dedup_cluster_keep fixpoint A/B (VERDICT r17 #4 "Done" condition):
old full-corpus min-label fixpoint (r16 shape) vs new edge-restricted
fixpoint + broadcast restore (r17 restructure + r18 broadcast hint),
measured END-TO-END (fn construction + exec — the CC loop's count
actions run during construction either way) at sf0.1 and x10,
ABAB-interleaved so a window drift hits both arms equally.

    python plans/r18/cc_x10_ab.py [out.json]
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
from bigbugdata_spark.operators.dedup import (  # noqa: E402
    cc_node_labels,
    dedup_minhash_lsh,
)
from bigbugdata_spark.catalog import table  # noqa: E402
from bigbugdata_spark.session import get_spark  # noqa: E402

TRIALS = 3


def old_shape(spark, sf_dir):
    """r16 shape: min-label fixpoint over ALL documents, corpus-size
    labels checkpointed per round, no restore join needed."""
    pairs = dedup_minhash_lsh(spark, sf_dir).select("d1", "d2")
    edges = (
        pairs.select(F.col("d1").alias("a"), F.col("d2").alias("b"))
        .unionByName(pairs.select(F.col("d2").alias("a"), F.col("d1").alias("b")))
        .localCheckpoint()
    )
    labels = (
        table(spark, sf_dir, "documents")
        .select("doc_id")
        .select("doc_id", F.col("doc_id").alias("cluster_rep"))
        .localCheckpoint()
    )
    rounds = 0
    while True:
        rounds += 1
        neighbor_min = (
            labels.join(edges, labels.doc_id == edges.a)
            .select(F.col("b").alias("doc_id"), F.col("cluster_rep").alias("_nl"))
            .groupBy("doc_id")
            .agg(F.min("_nl").alias("_nl"))
        )
        new_rep = F.least(
            F.col("cluster_rep"), F.coalesce(F.col("_nl"), F.col("cluster_rep"))
        )
        new_labels = (
            labels.join(neighbor_min, "doc_id", "left")
            .select(
                "doc_id",
                new_rep.alias("cluster_rep"),
                (new_rep < F.col("cluster_rep")).alias("_chg"),
            )
            .localCheckpoint()
        )
        changed = new_labels.filter(F.col("_chg")).count()
        labels = new_labels.drop("_chg")
        if changed == 0:
            break
    out = labels.select(
        "doc_id",
        "cluster_rep",
        (F.col("doc_id") == F.col("cluster_rep")).cast("int").alias("keep"),
    )
    return out, rounds


def new_shape(spark, sf_dir):
    """Registered shape: edge-restricted fixpoint + broadcast restore."""
    pairs = dedup_minhash_lsh(spark, sf_dir)
    labels = cc_node_labels(pairs)
    out = (
        table(spark, sf_dir, "documents")
        .select("doc_id")
        .join(F.broadcast(labels), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("cluster_rep"), F.col("doc_id")).alias("cluster_rep"),
        )
        .select(
            "doc_id",
            "cluster_rep",
            (F.col("doc_id") == F.col("cluster_rep")).cast("int").alias("keep"),
        )
    )
    return out, None


def run_once(spark, fn, sf_dir):
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    df, rounds = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 4), rounds


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/cc_x10_ab.json"
    spark = get_spark(app_name="cc-x10-ab")
    sf = bench.SF_DIR
    x10 = bench._build_scale_dir(spark)

    # equivalence once per size: symdiff must be 0
    checks = {}
    for nm, d in (("sf0.1", sf), ("x10", x10)):
        a, _ = new_shape(spark, d)
        b, _ = old_shape(spark, d)
        checks[nm] = a.exceptAll(b).count() + b.exceptAll(a).count()
        print("symdiff", nm, checks[nm], flush=True)
        assert checks[nm] == 0

    res = {
        "trials": TRIALS,
        "symdiff": checks,
        "spark_canary_sec": bench._spark_canary(spark),
        "runs": [],
    }
    # ABAB interleave, warm codegen already paid by the symdiff pass
    for size_name, d in (("sf0.1", sf), ("x10", x10)):
        for trial in range(TRIALS):
            for label, fn in (("new", new_shape), ("old", old_shape)):
                sec, rounds = run_once(spark, fn, d)
                res["runs"].append(
                    {"size": size_name, "trial": trial, "shape": label,
                     "sec": sec, "rounds": rounds}
                )
                print(size_name, trial, label, sec, "rounds", rounds, flush=True)
    res["closing_spark_canary_sec"] = bench._spark_canary(spark)
    for size_name in ("sf0.1", "x10"):
        for label in ("new", "old"):
            secs = [r["sec"] for r in res["runs"]
                    if r["size"] == size_name and r["shape"] == label]
            res[f"min_{size_name}_{label}"] = min(secs)
    with open(out_path, "w") as fh:
        json.dump(res, fh, indent=1)
    print("wrote", out_path)
    print({k: v for k, v in res.items() if k.startswith("min_")})


if __name__ == "__main__":
    main()
