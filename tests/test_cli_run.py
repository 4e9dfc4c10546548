"""End-to-end through the CLI `run` subcommand: same flags as the
reference CLI, outputs must match the reference's own run."""

from __future__ import annotations

from bigbugdata_spark.cli import main as cli_main
from tests.kraken_fixtures import generate_reports, load_reference
from tests.test_kraken_golden import (
    FLOAT_COLS,
    GROUP_PATTERNS,
    _assert_rows_match,
    _read_csv,
)


def test_cli_run_matches_reference(tmp_path, spark):
    report_paths = generate_reports(tmp_path / "reports", n_samples=6, n_taxa=80)

    ref = load_reference()
    ref.run(
        report_paths=report_paths,
        results_path=str(tmp_path / "ref"),
        rank="species",
        n_tophits=10,
        group_patterns=GROUP_PATTERNS,
    )

    argv = ["run", "-r", *report_paths, "-o", str(tmp_path / "ours"), "-t", "10"]
    for control, group in GROUP_PATTERNS:
        argv += ["-n", control, group]
    cli_main(argv)

    for name in ("combined_species", "rrpm_species", "tophits_species"):
        ref_rows = _read_csv(tmp_path / "ref" / f"{name}.csv")
        our_rows = _read_csv(tmp_path / "ours" / f"{name}.csv")
        float_cols = (
            FLOAT_COLS
            if name.startswith("tophits")
            else {k for k in ref_rows[0] if k not in ("taxID", "taxName")}
        )
        _assert_rows_match(ref_rows, our_rows, float_cols=float_cols, where=name)


def test_cli_query_list_run_explain(tmp_path, spark, capsys):
    """The `query` subcommand's three modes: listing every registered
    query, executing one to CSV, and --explain printing the plan audit
    without executing."""
    cli_main(["query"])
    listed = capsys.readouterr().out
    assert "prof_key_skew" in listed and "tpch_q1_pricing_summary" in listed

    out = tmp_path / "skew_csv"
    cli_main([
        "query", "prof_key_skew",
        "--sf-dir", "/root/testdata/sf0.001",
        "-o", str(out),
    ])
    capsys.readouterr()
    got = spark.read.option("header", True).csv(str(out))
    n_users = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert got.count() == min(25, n_users) and "cum_share" in got.columns

    cli_main([
        "query", "prof_key_skew",
        "--sf-dir", "/root/testdata/sf0.001",
        "--explain",
    ])
    audit = capsys.readouterr().out
    assert "raw scans:" in audit and "unbounded windows: none" in audit
    assert "AdaptiveSparkPlan" in audit or "Physical Plan" in audit


def test_cli_query_explain_refuses_streaming(capsys):
    """--explain on a streaming query must refuse instead of silently
    executing the stream and auditing only the post-sink table scan.
    The guard is the spec-level side_effects flag (VERDICT r11 #8), not
    a name/tag list."""
    import pytest

    with pytest.raises(SystemExit) as exc:
        cli_main(["query", "evt_stream_dedup", "--explain"])
    assert "side_effects" in str(exc.value)


def test_cli_query_explain_refuses_storage_lifecycle(capsys):
    """--explain on a storage-lifecycle query (write/vacuum inside
    fn(), advisory r10) must refuse the same way the streaming guard
    does: executing it would run the side effects destructively and
    audit only the trivial post-write scan."""
    import pytest

    for name in ("store_gc_plan", "evt_zorder3_lake_accounting"):
        with pytest.raises(SystemExit) as exc:
            cli_main(["query", name, "--explain"])
        assert "side_effects" in str(exc.value)


def test_side_effects_flag_consistent_with_tags():
    """The lint that keeps the spec flag honest: every streaming- or
    storage-tagged registration must DECLARE side_effects explicitly
    (True for lifecycle queries, False for pure analyses) — forgetting
    the question is a failure, not a silent default — every
    streaming-tagged query is a stream drive (always True), and a True
    declaration only appears on streaming/storage-tagged queries."""
    from bigbugdata_spark.registry import load_all

    specs = load_all()
    undeclared = {
        n
        for n, s in specs.items()
        if ("streaming" in s.tags or "storage" in s.tags)
        and s.side_effects is None
    }
    assert not undeclared, f"declare side_effects explicitly: {undeclared}"
    non_stream_drives = {
        n
        for n, s in specs.items()
        if "streaming" in s.tags and s.side_effects is not True
    }
    assert not non_stream_drives, non_stream_drives
    stray = {
        n
        for n, s in specs.items()
        if s.side_effects is True
        and "streaming" not in s.tags
        and "storage" not in s.tags
    }
    assert not stray, f"side_effects=True without a lifecycle tag: {stray}"
