#!/usr/bin/env python
"""Parallel scale-out demonstration (VERDICT r17 #7).

At sf0.1 the bench is stage-scheduling-bound — 25/37 queries ran FASTER
on 8 cores than 32 in r17, so no artifact demonstrated parallel
speedup.  This probe times the five heaviest paths at x10 replication
(where work should dominate the scheduling floor) at the CURRENT
$SPARK_GRAFT_CPUS and writes one JSON blob; run it once with
SPARK_GRAFT_CPUS=32 and once with =8 (fresh processes), then merge:

    SPARK_GRAFT_CPUS=32 python plans/r18/scaleout_probe.py c32.json
    SPARK_GRAFT_CPUS=8  python plans/r18/scaleout_probe.py c8.json

A c8/c32 wall ratio >= 2 demonstrates the path actually scales with
cores; a ratio near 1 names a serial bottleneck.  kraken e2e runs on
its own fixture (48x20k — the BASELINE.md comparison point), not x10.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from bigbugdata_spark.registry import load_all  # noqa: E402
from bigbugdata_spark.session import get_spark  # noqa: E402

QUERIES = (
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "text_dup_span_coverage",
)
ITERS = 3


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "scaleout.json"
    specs = load_all()
    spark = get_spark(app_name="scaleout-probe")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    res: dict = {
        "cpus": cpus,
        "sf_dir": bench.SF_DIR,
        "replication": bench.SCALE_REPLICATION,
        "iterations": ITERS,
        "spark_canary_sec": bench._spark_canary(spark),
        "queries": {},
    }
    sdir = bench._build_scale_dir(spark)

    # warm codegen once (the q1 pattern bench.main uses)
    specs["op07_hash_agg"].fn(spark, bench.SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    for name in QUERIES:
        spark.catalog.clearCache()
        runs = []
        try:
            for _ in range(ITERS):
                df = specs[name].fn(spark, sdir)
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                runs.append(round(time.perf_counter() - t0, 4))
        except Exception as exc:  # noqa: BLE001
            res["queries"][name] = {"error": str(exc)[:200]}
            continue
        res["queries"][name] = {"runs": runs, "min": min(runs)}

    # spine build at x10: reset memo + persisted generation per
    # iteration, time fn()+exec (the build is inside fn)
    runs = []
    try:
        for _ in range(2):
            bench._reset_graph_spine(sdir)
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            specs["sim_knn_graph"].fn(spark, sdir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.perf_counter() - t0, 4))
        res["queries"]["spine_build_x10"] = {"runs": runs, "min": min(runs)}
    except Exception as exc:  # noqa: BLE001
        res["queries"]["spine_build_x10"] = {"error": str(exc)[:200]}

    # kraken e2e (48x20k fixture; fresh session like bench.main)
    try:
        spark.stop()
        spark = get_spark(app_name="scaleout-probe-kraken")
        k = bench.bench_kraken_e2e(spark)
        res["queries"]["kraken_e2e"] = {
            "first": k["first"], "min": k["min"],
            "canary": k.get("canary_at_calibration_point"),
        }
    except Exception as exc:  # noqa: BLE001
        res["queries"]["kraken_e2e"] = {"error": str(exc)[:200]}

    res["closing_spark_canary_sec"] = bench._spark_canary(spark)
    with open(out_path, "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps({k: v for k, v in res.items() if k != "queries"}))
    for n, e in res["queries"].items():
        print(" ", n, e)


if __name__ == "__main__":
    main()
