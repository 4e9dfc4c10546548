#!/usr/bin/env python
"""Anti-pattern sweep over EVERY registered query's physical plan.

For each non-side-effect query: build the DataFrame, capture
explain("formatted"), and count the optimization-guide markers
(CartesianProduct/BroadcastNestedLoopJoin, SortMergeJoin, Expand,
Python-eval nodes, Exchange count, repeated scans of the same input,
scans whose Filter parent pushed nothing). Output: one JSON line per
query to plans/r17/registry_audit.jsonl plus a flagged summary, so the
round's "examined every operator" checklist is mechanical, not vibes.

Side-effect queries (streaming sinks, lake accounting) are listed but
skipped: their fn() executes a pipeline whose plan is a memory-sink
scan, so a static plan audit says nothing — they are covered by the
streaming kernel review in OPTIMIZATION_r17.md instead.
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from bigbugdata_spark.plans.inspect import plan_string  # noqa: E402
from bigbugdata_spark.registry import load_all  # noqa: E402
from bigbugdata_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "registry_audit.jsonl")

SCAN_RE = re.compile(r"Scan parquet\b[^\n]*")
LOCATION_RE = re.compile(r"Location: \S+\[([^\]]*)\]")


def analyze(text: str) -> dict:
    res = {
        "exchanges": len(re.findall(r"\bExchange\b", text)),
        "smj": len(re.findall(r"\bSortMergeJoin\b", text)),
        "bnlj": len(re.findall(r"\bBroadcastNestedLoopJoin\b", text)),
        "cartesian": len(re.findall(r"\bCartesianProduct\b", text)),
        "expand": len(re.findall(r"\bExpand\b", text)),
        "sort_agg": len(re.findall(r"\bSortAggregate\b", text)),
        "py_eval": len(
            re.findall(r"\b(BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow)\b", text)
        ),
    }
    # repeated scans of the same input location
    locs: dict[str, int] = {}
    for m in LOCATION_RE.finditer(text):
        key = m.group(1).rsplit("/", 1)[-1]
        locs[key] = locs.get(key, 0) + 1
    res["scans"] = sum(locs.values())
    res["repeat_scans"] = {k: v for k, v in locs.items() if v > 1}
    return res


def main() -> None:
    names = sys.argv[1:] or None
    specs = load_all()
    spark = get_spark(app_name="registry-audit")
    rows = []
    with open(OUT, "w") as fh:
        for name in sorted(specs):
            if names and name not in names:
                continue
            spec = specs[name]
            row = {"name": name, "tags": list(spec.tags)}
            if spec.side_effects:
                row["skipped"] = "side_effects"
            else:
                spark.catalog.clearCache()
                try:
                    df = spec.fn(spark, SF_DIR)
                    row.update(analyze(plan_string(df, "formatted")))
                except Exception as exc:  # noqa: BLE001 — record and continue
                    row["error"] = f"{type(exc).__name__}: {exc}"[:200]
            fh.write(json.dumps(row) + "\n")
            fh.flush()
            rows.append(row)

    flagged = [
        r
        for r in rows
        if r.get("cartesian")
        or r.get("bnlj")
        or r.get("py_eval")
        or r.get("smj")
        or r.get("repeat_scans")
        or r.get("expand")
        or r.get("error")
    ]
    print(f"{len(rows)} audited, {len(flagged)} flagged")
    for r in flagged:
        marks = {
            k: r[k]
            for k in ("cartesian", "bnlj", "py_eval", "smj", "expand", "repeat_scans", "error")
            if r.get(k)
        }
        print(f"  {r['name']}: {marks}")


if __name__ == "__main__":
    main()
