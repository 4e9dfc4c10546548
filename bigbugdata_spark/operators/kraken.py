"""The kraken-report analytics pipeline — quirk-faithful Spark reimplementation
of the reference's `run()` (ref bigbugdata.py:225-366).

The engine's truth is ONE long/tidy fact DataFrame (sample_id, taxID, reads,
...); pivoting to the taxon x sample presentation matrix happens only at the
sink. Every documented numeric quirk of the reference is reproduced:

* duplicate taxID rows within a report ACCUMULATE into the fact table
  (+=, ref :301-302) but OVERWRITE the per-(sample,taxon) side stats
  (last row wins, ref :278-284);
* rRPM truncates BOTH sides to int (ref :154-159) with the 0->1 control
  guard and control=1 for ungrouped samples (ref :148-156);
* top-k ranks are assigned before the presence filter, so rank sequences
  keep gaps (ref :183-188);
* z-scores are population (ddof=0) over the DENSE per-taxon RPM vector,
  NaN when all-equal (ref :322-331).

Divergences (each fail-fast or documented):
* a sample with no taxID-0/1 rows makes the reference silently drop it
  from RPM and later KeyError (ref :121); we raise ValueError at once;
* reads == 0 makes the reference crash with ZeroDivisionError (ref :275);
  we emit NULL e_val (via try_divide — ANSI mode would otherwise throw);
* two report files resolving to one sample_id make the reference silently
  keep only the last file (dict overwrite, ref :35-42); we raise ValueError;
* taxName for a taxID is the first-seen name in the reference (ref :295);
  we take MIN(trim(taxName)) — identical whenever names are consistent.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigbugdata_spark.operators.relational import (
    control_lookup,
    negative_control_groups,
    ordered_sample_ids,
)
from bigbugdata_spark.sources.kraken_reports import (
    output_paths,
    read_reports,
    write_csv_fidelity,
)


# ---------------------------------------------------------------------------
# stage functions: pure DataFrame -> DataFrame
# ---------------------------------------------------------------------------


def sample_totals(reports: DataFrame) -> DataFrame:
    """Per-sample total reads = SUM(reads) over taxID in {0,1} rows (op 3,
    ref bigbugdata.py:258-261)."""
    return (
        reports.filter(F.col("taxID").isin(0, 1))
        .groupBy("sample_id")
        .agg(F.sum("reads").alias("n_reads"))
    )


def species_rows(reports: DataFrame, rank: str) -> DataFrame:
    """Rank filter after the taxID-0/1 exclusion (ops 3-4, ref :259-265)."""
    return reports.filter(~F.col("taxID").isin(0, 1)).filter(F.col("rank") == rank)


def fact_table(rows: DataFrame) -> DataFrame:
    """(sample_id, taxID) -> accumulated reads (op 7, ref :286-302 '+=')."""
    return rows.groupBy("sample_id", "taxID").agg(F.sum("reads").alias("reads"))


def taxa(rows: DataFrame) -> DataFrame:
    """Distinct taxa with trimmed names (op 6, ref :293-298) and the
    cross-sample 'Total # of Reads' (ref :302)."""
    return rows.groupBy("taxID").agg(
        F.min(F.trim(F.col("taxName"))).alias("taxName"),
        F.sum("reads").alias("total_reads"),
    )


def side_stats(rows: DataFrame) -> DataFrame:
    """Per-(sample, taxID) stats, LAST row wins on duplicates (ref :278-284).

    Raw string copies of dup/cov (and str-equivalent reads/kmers) are kept
    so the tophits sink echoes input text exactly as the reference does
    (it stores the csv strings, ref :279-282).
    """
    w = Window.partitionBy("sample_id", "taxID").orderBy(F.desc("row_order"))
    return (
        rows.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "sample_id",
            "taxID",
            F.col("kmers"),
            F.col("dup").alias("dup_raw"),
            F.col("reads").alias("sample_reads"),
            F.col("cov").alias("cov_raw"),
            # try_divide: Spark 4 runs ANSI mode, where `/` throws
            # DIVIDE_BY_ZERO on reads == 0; the reference crashes there too
            # (ZeroDivisionError, ref :275) — our documented divergence is
            # NULL, which try_divide yields (ADVICE r1).
            (
                F.try_divide(F.col("kmers"), F.col("reads"))
                * F.col("cov").cast("double")
            ).alias("e_val"),
        )
    )


def dense_matrix(fact: DataFrame, taxa_df: DataFrame, samples: list[str]) -> DataFrame:
    """Densify to the full taxon x sample grid with 0-filled cells (op 8,
    ref :289-291). The sample list is tiny (one entry per input file), so
    the cross join is |taxa| x |samples| — exactly the reference's matrix,
    kept in long form."""
    spark = fact.sparkSession
    samples_df = spark.createDataFrame([(s,) for s in samples], "sample_id string")
    grid = taxa_df.crossJoin(F.broadcast(samples_df))
    return grid.join(fact, ["taxID", "sample_id"], "left").na.fill({"reads": 0})


def rpm(dense: DataFrame, totals: DataFrame, samples: list[str]) -> DataFrame:
    """RPM normalization (op 11, ref :104-127) with fail-fast validation for
    samples missing taxID-0/1 rows (the reference silently drops them and
    later KeyErrors, ref :121 — SURVEY §2 op 11)."""
    have = {r[0] for r in totals.select("sample_id").collect()}
    missing = sorted(set(samples) - have)
    if missing:
        raise ValueError(
            f"samples with no taxID 0/1 rows (cannot compute RPM): {missing}"
        )
    # try_divide: n_reads == 0 (taxID-0/1 rows present but all zero reads)
    # would throw under ANSI; the reference yields ZeroDivisionError — we
    # emit NULL rpm for that degenerate sample (documented divergence).
    return dense.join(F.broadcast(totals), "sample_id").withColumn(
        "rpm", F.try_divide(F.col("reads"), F.col("n_reads") / F.lit(1_000_000.0))
    )


def zscores(rpm_df: DataFrame) -> DataFrame:
    """Population z-score of each taxon's dense RPM vector (op 15, ref
    :322-331, scipy ddof=0). Explicit-moments formula (fp64-deterministic).

    All-equal guard uses a RELATIVE epsilon (ADVICE r1): the explicit
    moments of an all-equal non-integer vector can come out as a tiny
    positive/negative residual (~1e-32 * mean^2) instead of exactly 0; any
    real cross-sample variance is >= ~1e-6 * mean^2, so var <= 1e-18*mean^2
    classifies exactly and emits the reference's NaN.
    """
    w = Window.partitionBy("taxID")
    s = F.sum("rpm").over(w)
    ss = F.sum(F.col("rpm") * F.col("rpm")).over(w)
    n = F.count(F.lit(1)).over(w)
    mean = s / n
    var = ss / n - mean * mean
    z = F.when(var <= F.lit(1e-18) * mean * mean, F.lit(float("nan"))).otherwise(
        (F.col("rpm") - mean) / F.sqrt(var)
    )
    return rpm_df.withColumn("z_score", z)


def rrpm(
    rpm_df: DataFrame, mapping: list[tuple[str, str]]
) -> DataFrame:
    """rRPM = int(rpm) / max(int(control_rpm), 1) (op 13, ref :130-163).

    Both sides int-truncated; rpm >= 0 so floor == int(). A sample in no
    group gets control rpm 1 exactly (ref :154 row.get('', 1)). The control
    mapping is tiny -> broadcast; the control-side rpm comes from a self
    join on (taxID, control sample), dense so always present.
    """
    spark = rpm_df.sparkSession
    map_df = spark.createDataFrame(mapping, "sample_id string, control_id string")
    ctrl = rpm_df.select(
        F.col("taxID").alias("c_taxID"),
        F.col("sample_id").alias("c_sample_id"),
        F.col("rpm").alias("ctrl_rpm"),
    )
    joined = (
        rpm_df.join(F.broadcast(map_df), "sample_id")
        .join(
            ctrl,
            (F.col("taxID") == F.col("c_taxID"))
            & (F.col("control_id") == F.col("c_sample_id")),
            "left",
        )
    )
    den = F.when(F.col("control_id") == "", F.lit(1).cast("long")).otherwise(
        F.greatest(F.floor(F.coalesce(F.col("ctrl_rpm"), F.lit(0.0))), F.lit(1).cast("long"))
    )
    return joined.withColumn(
        "rrpm", F.floor("rpm").cast("double") / den
    ).select(rpm_df["*"], F.col("rrpm"))


def tophits(
    rrpm_df: DataFrame, side: DataFrame, k: int
) -> DataFrame:
    """Top-k per sample by rRPM with stable tie-break and rank gaps (op 14,
    ref :166-205): rank over the full dense candidate list (ties -> taxID
    ascending, the reference's stable-sort order), THEN the presence inner
    join — absent (sample, taxon) pairs drop out leaving rank gaps."""
    w = Window.partitionBy("sample_id").orderBy(F.desc("rrpm"), F.asc("taxID"))
    ranked = (
        rrpm_df.select("sample_id", "taxID", "taxName", "rrpm")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
    return (
        ranked.join(side, ["sample_id", "taxID"])
        .select(
            F.col("sample_id").alias("sampleName"),
            "taxID",
            "taxName",
            "rank",
            F.col("rrpm").alias("rRPM"),
            "kmers",
            F.col("dup_raw").alias("dup"),
            F.col("sample_reads").alias("reads"),
            F.col("cov_raw").alias("cov"),
            "e_val",
            "z_score",
        )
    )


# ---------------------------------------------------------------------------
# end-to-end pipeline + sinks
# ---------------------------------------------------------------------------


@dataclass
class KrakenResult:
    samples: list[str]
    combined: DataFrame  # long: taxID, taxName, total_reads, sample_id, reads
    rrpm: DataFrame  # long: + rpm, z_score, rrpm
    tophits: DataFrame


def run_pipeline(
    spark: SparkSession,
    report_paths: list[str],
    rank: str = "species",
    n_tophits: int = 15,
    group_patterns: list[tuple[str, str]] | None = None,
) -> KrakenResult:
    """The reference's run() (ref bigbugdata.py:225-366) as a lazy plan-set."""
    reports = read_reports(spark, report_paths, with_row_order=True)
    # Fail fast when two input files resolve to one sample_id: the reference
    # dict silently keeps only the last file (ref bigbugdata.py:35-42) while
    # a multi-file scan would union their rows — an undocumented divergence
    # unless rejected here (ADVICE r1). The distinct list is one row per
    # input file — never data-sized.
    pairs = reports.select("sample_id", "path").distinct().collect()
    by_sample: dict[str, list[str]] = {}
    for r in pairs:
        by_sample.setdefault(r["sample_id"], []).append(r["path"])
    collisions = {s: ps for s, ps in by_sample.items() if len(ps) > 1}
    if collisions:
        raise ValueError(
            f"multiple report files resolve to the same sample_id: {collisions}"
        )
    samples = ordered_sample_ids(sorted(by_sample))

    totals = sample_totals(reports)
    rows = species_rows(reports, rank)
    fact = fact_table(rows)
    taxa_df = taxa(rows)
    side = side_stats(rows)

    dense = dense_matrix(fact, taxa_df, samples)
    # persist: rpm_df feeds three consumers (the rrpm self-join's two sides
    # and the tophits side-stats join); without it Spark recomputes the
    # scan->agg->densify->window subtree per consumer (VERDICT r1 fix #3).
    rpm_df = zscores(rpm(dense, totals, samples)).persist()

    groups = negative_control_groups(samples, group_patterns)
    mapping = control_lookup(samples, groups)
    rrpm_df = rrpm(rpm_df, mapping)

    side_z = side.join(
        rpm_df.select("sample_id", "taxID", "z_score"), ["sample_id", "taxID"]
    )
    top = tophits(rrpm_df, side_z, n_tophits)

    combined_long = dense.select("taxID", "taxName", "total_reads", "sample_id", "reads")
    return KrakenResult(samples=samples, combined=combined_long, rrpm=rrpm_df, tophits=top)


def _pivot_rows(
    long_df: DataFrame, value_col: str, samples: list[str]
) -> list[dict]:
    """Collect the presentation pivot (sink-only; O(taxa x samples))."""
    wide = (
        long_df.groupBy("taxID", "taxName", "total_reads")
        .pivot("sample_id", samples)
        .agg(F.first(value_col))
        .orderBy("taxID")
    )
    out = []
    for row in wide.collect():
        d = row.asDict()
        rec = {
            "taxID": d["taxID"],
            "taxName": d["taxName"],
            "Total # of Reads": d["total_reads"],
        }
        for s in samples:
            rec[s] = d[s]
        out.append(rec)
    return out


def write_outputs(
    result: KrakenResult, results_dir: str, rank: str, n_tophits_fields: bool = True
) -> tuple[str, str, str]:
    """CSV sinks with the reference's exact headers and column order
    (ops 16-17, ref bigbugdata.py:312-366)."""
    combined_path, rrpm_path, tophits_path = output_paths(results_dir, rank)
    samples = result.samples
    base = ["taxID", "taxName", "Total # of Reads"]

    write_csv_fidelity(combined_path, _pivot_rows(result.combined, "reads", samples), base + samples)
    write_csv_fidelity(rrpm_path, _pivot_rows(result.rrpm, "rrpm", samples), base + samples)

    top_fields = [
        "sampleName", "taxID", "taxName", "rank", "rRPM",
        "kmers", "dup", "reads", "cov", "e_val", "z_score",
    ]
    top_rows = [r.asDict() for r in result.tophits.collect()]
    # reference emits tophits grouped by sample (ordered), rank ascending
    order = {s: i for i, s in enumerate(samples)}
    top_rows.sort(key=lambda r: (order[r["sampleName"]], r["rank"]))
    write_csv_fidelity(tophits_path, top_rows, top_fields)
    return str(combined_path), str(rrpm_path), str(tophits_path)
