"""Deterministic synthetic KrakenUniq report generator (FIXTURES.md §2,
seed 42) + a loader that runs the actual reference implementation
(/root/reference/bigbugdata.py, read-only) with a pure-python scipy.stats
shim, to produce golden outputs the Spark pipeline must match."""

from __future__ import annotations

import importlib.util
import random
import sys
import types
from pathlib import Path

HEADER = "%\treads\ttaxReads\tkmers\tdup\tcov\ttaxID\trank\ttaxName"


def generate_reports(
    out_dir: Path,
    n_samples: int = 8,
    n_taxa: int = 200,
    seed: int = 42,
    p_present: float = 0.95,
    p_duplicate: float = 0.02,
) -> list[str]:
    """One TSV per sample: 2 '#' comment lines, header row, taxID-0/1 rows,
    species rows (with leading-space taxNames — 'damn you kraken'), genus
    distractors, and occasional duplicate-taxID rows (exercises the +=
    accumulate / last-row-wins overwrite split)."""
    out_dir.mkdir(parents=True, exist_ok=True)
    rng = random.Random(seed)
    per_group = n_samples // 2
    samples = []
    for group in ("CF_DNA", "CF_RNA"):
        samples.append(f"{group}_Negative")
        samples.extend(f"{group}_S{i:03d}" for i in range(1, per_group))
    taxa = [(1000 + i, f"  Organism sp. {1000 + i}") for i in range(n_taxa)]

    paths = []
    for sample in samples:
        # one very sparse sample per group (fewer than k taxa present) so
        # tophits exhibits the reference's rank-gap quirk (bigbugdata.py:183-188)
        p_here = 0.03 if sample.endswith("_S001") else p_present
        path = out_dir / f"{sample}_report.txt"
        total = rng.randint(5_000_000, 20_000_000)
        classified = rng.randint(total // 4, total // 2)
        unclassified = total - classified
        lines = [
            f"# kraken2 --db /path/to/krakendb --report {sample}_report.txt",
            "# Fri Aug 13 00:00:00 2026",
            HEADER,
            f"50.0\t{unclassified}\t{unclassified}\t0\t0\t0\t0\tunclassified\tunclassified",
            f"50.0\t{classified}\t0\t{rng.randint(1000, 9999)}\t1.0\t0.5\t1\troot\t  root",
        ]
        n_species = 0
        for tax_id, tax_name in taxa:
            if rng.random() > p_here:
                continue
            copies = 2 if rng.random() < p_duplicate else 1
            for _ in range(copies):
                # sparse samples get some sub-RPM read counts (floor(rpm)=0)
                # so present taxa tie with absent ones at rRPM 0 -> the
                # presence filter leaves mid-sequence rank gaps
                if p_here < 0.5 and rng.random() < 0.5:
                    reads = rng.randint(1, 3)
                else:
                    reads = rng.randint(1, 100_000)
                kmers = rng.randint(1, 5 * reads)
                dup = f"{rng.uniform(1, 20):.4f}"
                cov = f"{rng.uniform(0, 1):.6f}"
                lines.append(
                    f"0.01\t{reads}\t{reads}\t{kmers}\t{dup}\t{cov}\t{tax_id}\tspecies\t{tax_name}"
                )
                n_species += 1
            if n_species % 10 == 0:
                g_reads = rng.randint(1, 100_000)
                lines.append(
                    f"0.01\t{g_reads}\t{g_reads}\t{rng.randint(1, 5 * g_reads)}\t1.0\t0.1\t{500 + n_species}\tgenus\t  Genus g. {500 + n_species}"
                )
        path.write_text("\n".join(lines) + "\n")
        paths.append(str(path))
    return paths


def load_reference():
    """Import /root/reference/bigbugdata.py with scipy.stats.zscore shimmed
    (scipy is not installed here; shim = population ddof=0 z-score, the
    scipy default — verified identical for BASELINE.md)."""
    if "scipy" not in sys.modules:
        import numpy as np

        scipy_mod = types.ModuleType("scipy")
        stats_mod = types.ModuleType("scipy.stats")

        def zscore(a):
            arr = np.asarray(a, dtype=float)
            with np.errstate(invalid="ignore", divide="ignore"):
                return (arr - arr.mean()) / arr.std()

        stats_mod.zscore = zscore
        scipy_mod.stats = stats_mod
        sys.modules["scipy"] = scipy_mod
        sys.modules["scipy.stats"] = stats_mod

    spec = importlib.util.spec_from_file_location(
        "reference_bigbugdata", "/root/reference/bigbugdata.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod
