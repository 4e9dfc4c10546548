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
