"""Round-13 invariants.

The round's charter is consolidation (VERDICT r12 #8): no new query
families — the tests here pin the two scale-posture fixes and the
rotation rule instead.

1. The re-scoped sim_ivf_incremental_assign (VERDICT r12 #2): the
   persisted IVF index generation (frozen codebook + per-cell counts)
   must equal a from-scratch rebuild (adoption correctness), a warm
   cycle must not scan the full corpus (plan-level proof the O(corpus)
   work moved into the amortized build), and a stale same-corpus
   generation must be swept, not adopted.

2. The bounded streaming MTA path buffer (VERDICT r12 #3): under-cap
   paths still equal the batch query exactly; an over-cap user
   degrades to last-MTA_PATH_CAP-touch credit, deterministically.

(The rotation rule — no rows-only query in the driver cap — is pinned
in tests/test_oracle_parity.py::test_cap_holds_no_rows_only_query.)
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import functions as F

from bigbugdata_spark.registry import load_all

SPECS = load_all()


def _gen_paths(sf_dir: str) -> tuple[Path, Path]:
    from bigbugdata_spark.operators.dedup_incr_core import index_path
    from bigbugdata_spark.operators.similarity_incr import (
        _IVF_CB_PREFIX,
        _IVF_CNT_PREFIX,
        ivf_generation_fp,
    )

    fp = ivf_generation_fp(sf_dir)
    return (
        Path(index_path(f"{_IVF_CB_PREFIX}{fp}")),
        Path(index_path(f"{_IVF_CNT_PREFIX}{fp}")),
    )


def test_ivf_generation_adoption_equals_rebuild(spark, sf_oracle):
    """A persisted generation adopted by a later call must be
    indistinguishable from a fresh build — the same append==rebuild
    bar the gram index met in r8.  Also pins that the persisted
    n_before equals a direct recompute of the existing slice's routed
    assignment (the artifact IS the inverted file's sizes, not a
    cached approximation)."""
    from bigbugdata_spark.functions.fragments import scaled_ivf_k
    from bigbugdata_spark.operators.similarity import ivf_assign, ivf_cents
    from bigbugdata_spark.operators.similarity_incr import (
        _existing_corpus,
        ivf_index_generation,
    )

    cb_loc, cnt_loc = _gen_paths(sf_oracle)
    _, cnt = ivf_index_generation(spark, sf_oracle)  # build or adopt
    adopted = {r["cell_id"]: r["n_before"] for r in cnt.collect()}

    # force a rebuild: remove both locations, call again
    shutil.rmtree(cb_loc)
    shutil.rmtree(cnt_loc)
    _, cnt2 = ivf_index_generation(spark, sf_oracle)
    rebuilt = {r["cell_id"]: r["n_before"] for r in cnt2.collect()}
    assert adopted == rebuilt

    # the artifact equals a direct from-scratch recompute
    existing = _existing_corpus(spark, sf_oracle)
    k = scaled_ivf_k(existing.count())
    direct = {
        r["cell_id"]: r["n"]
        for r in ivf_assign(existing, ivf_cents(existing, k=k), k=k)
        .groupBy("cell_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert rebuilt == direct


def test_ivf_generation_partial_write_rebuilds(spark, sf_oracle):
    """Adoption is gated on BOTH _SUCCESS markers: a generation with
    one location missing (the crash-between-renames window) is not
    half-adopted — the next call rebuilds both."""
    from bigbugdata_spark.operators.similarity_incr import ivf_index_generation

    cb_loc, cnt_loc = _gen_paths(sf_oracle)
    ivf_index_generation(spark, sf_oracle)
    shutil.rmtree(cnt_loc)  # simulate the partial crash
    ivf_index_generation(spark, sf_oracle)
    assert (cb_loc / "_SUCCESS").exists() and (cnt_loc / "_SUCCESS").exists()


def test_incremental_assign_warm_plan_is_batch_sized(spark, sf_oracle):
    """Plan-level proof of the r13 re-scope (VERDICT r12 #2): with the
    generation warm, the registered query's plan reads the embeddings
    TABLE exactly once (the batch slice's row-filtered scan — the
    routed assignment joins the batch against the K-row broadcast
    codebook, never against the corpus) plus the two K-row generation
    parquets.  Through r12 the plan held THREE embeddings scans
    (existing-assign, batch-assign, codebook sample) — the O(corpus)
    recompute this round moved into the amortized build."""
    from bigbugdata_spark.operators.similarity_incr import ivf_index_generation
    from bigbugdata_spark.plans.inspect import scan_info

    ivf_index_generation(spark, sf_oracle)  # ensure warm
    df = SPECS["sim_ivf_incremental_assign"].fn(spark, sf_oracle)
    locs = [s["location"] for s in scan_info(df)]
    emb_scans = [p for p in locs if "embeddings.parquet" in p]
    gen_scans = [p for p in locs if "ivfgen_" in p]
    assert len(emb_scans) == 1, locs
    assert len(gen_scans) >= 2, locs
