"""The report-completion preprocessor — Spark port of the reference's
`create_complete_reports` (ref scripts/modify_reports.py:8-146): merge
DNA/RNA total-read tables (RNA overrides, op 20), compute per-sample
classified sums (op 21), synthesize `unclassified`/`root` rows (op 22),
and write completed per-sample TSV reports with the kraken preamble
(op 23 sink).

Spark does the data work — ordered multi-file scan, last-wins merge,
classified/kmers aggregation — distributed; the driver only formats the
TWO synthesized rows per sample and writes the per-sample files
(O(samples) scalars, never data-sized). Echoed species rows are the raw
input line bytes, which is exactly what the reference's DictWriter
re-emits for tab-free fields.

Divergences from the reference (each deliberate):
* input reports must carry the canonical 9-column header — we fail fast
  on a reordered header where the reference silently adapts (its own
  fallback list, ref :59-73, is this same canonical order);
* the preamble timestamp is injectable for determinism (the reference
  stamps datetime.now(), ref :101); None keeps wall-clock behavior;
* a sample missing from the totals tables is skipped with a warning,
  matching the reference (ref :47-49) — the skipped list is returned.
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigbugdata_spark.sources.kraken_reports import (
    read_lines_ordered,
    write_tsv_with_preamble,
)

CANONICAL_HEADER = "%\treads\ttaxReads\tkmers\tdup\tcov\ttaxID\trank\ttaxName"
FIELDNAMES = CANONICAL_HEADER.split("\t")


def read_totalreads(spark: SparkSession, path: str, priority: int) -> DataFrame:
    """One totals TSV (sample, _, total_reads — ref :24-37): rows keyed by
    sample.rpartition('_')[0] with a merge priority."""
    lines = read_lines_ordered(spark, path)
    f = F.split(F.col("line"), "\t")
    return lines.select(
        F.regexp_extract(f.getItem(0), r"^(.*)_", 1).alias("sample_name"),
        f.getItem(2).cast("long").alias("total_reads"),
        F.lit(priority).alias("pri"),
        F.col("row_order"),
    )


def merged_totals(
    spark: SparkSession, dna_path: str, rna_path: str
) -> DataFrame:
    """DNA then RNA totals, RNA overriding on collision (op 20 last-wins;
    within one file, later rows override earlier — dict semantics)."""
    both = read_totalreads(spark, dna_path, 1).unionByName(
        read_totalreads(spark, rna_path, 2)
    )
    w = Window.partitionBy("sample_name").orderBy(
        F.desc("pri"), F.desc("row_order")
    )
    return (
        both.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("sample_name", "total_reads")
    )


def complete_reports(
    spark: SparkSession,
    species_reports: list[str],
    dna_totalreads: str,
    rna_totalreads: str,
    output_dir: str,
    timestamp: str | None = None,
) -> tuple[list[str], list[str]]:
    """Run the completion pipeline; returns (written paths, skipped
    samples). See module docstring for the division of labor."""
    from datetime import datetime

    out_dir = Path(output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    if timestamp is None:
        timestamp = datetime.now().strftime("%a %b %d %H:%M:%S %Y")

    lines = read_lines_ordered(spark, species_reports)
    w = Window.partitionBy("path").orderBy("row_order")
    body = lines.withColumn("_rn", F.row_number().over(w))
    headers = body.filter(F.col("_rn") == 1).select("path", "line").collect()
    bad = [r["path"] for r in headers if r["line"] != CANONICAL_HEADER]
    if bad:
        raise ValueError(f"non-canonical report header in: {bad}")

    f = F.split(F.col("line"), "\t")
    rows = body.filter(F.col("_rn") > 1).select(
        F.regexp_extract(
            F.element_at(F.split(F.col("path"), "/"), -1), r"^(.*)_", 1
        ).alias("sample_name"),
        "row_order",
        "line",
        f.getItem(1).cast("long").alias("reads"),
        f.getItem(3).cast("long").alias("kmers"),
        f.getItem(7).alias("rank"),
    )
    species = rows.filter(F.col("rank") == "species")
    # per-sample aggregates (op 21) + the ordered raw lines to echo
    agg = species.groupBy("sample_name").agg(
        F.sum("reads").alias("classified"),
        F.sum("kmers").alias("sum_kmers"),
        F.array_sort(F.collect_list(F.struct("row_order", "line"))).alias("pw"),
    )
    totals = {
        r["sample_name"]: r["total_reads"]
        for r in merged_totals(spark, dna_totalreads, rna_totalreads).collect()
    }

    # driver side: O(samples) formatting of the two synthesized rows
    sample_order = [
        os.path.basename(p).rpartition("_")[0] for p in species_reports
    ]
    by_name = {r["sample_name"]: r for r in agg.collect()}
    written: list[str] = []
    skipped: list[str] = []
    for sample in sample_order:
        if sample not in totals:
            print(f"Warning: No total reads data found for sample {sample}")
            skipped.append(sample)
            continue
        r = by_name.get(sample)  # None -> report had no species rows
        total = totals[sample]
        classified = r["classified"] if r is not None else 0
        sum_kmers = r["sum_kmers"] if r is not None else 0
        echo = r["pw"] if r is not None else []
        unclassified = total - classified
        if unclassified < 0:
            print(
                f"Warning: Sample {sample} has more classified reads than total reads!"
            )
            unclassified = 0
        path = out_dir / f"{sample}_species-level-report.tsv"
        body: list[str] = []
        if unclassified > 0:
            pct = (unclassified / total) * 100
            body.append(
                f"{pct:.4f}\t{unclassified}\t{unclassified}\t0\t0\t0\t0"
                f"\tunclassified\tunclassified"
            )
        pct = (classified / total) * 100
        body.append(
            f"{pct:.4f}\t{classified}\t{classified}\t{sum_kmers}\t0\t0"
            f"\t1\troot\troot"
        )
        body.extend(s["line"] for s in echo)
        write_tsv_with_preamble(
            path,
            preamble=[
                f"# kraken2 --db /path/to/krakendb --threads 8 --paired "
                f"--output {sample}_kraken.out --report "
                f"{sample}_species-level-report.tsv",
                f"# {timestamp}",
            ],
            header=CANONICAL_HEADER,
            body_lines=body,
        )
        written.append(str(path))
    return written, skipped
