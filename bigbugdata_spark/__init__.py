"""bigbugdata_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ``tombch/bigbugdata`` (reference studied at
/root/reference, MIT-licensed), re-architected Spark-first.

The reference is a single-threaded CSV batch tool (706 LoC of pure Python);
this engine re-expresses every behavior it has (SURVEY.md §2 ops 1-23) as
declarative DataFrame/SQL plans that Catalyst optimizes, plus the
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal columns, streaming) the reference lacks.

Layout:
    session.py    — tuned SparkSession factory
    catalog.py    — testdata table loaders / temp-view registration
    registry.py   — named query registry (drives __spark_entry__.py)
    operators/    — relational, kraken-domain, dedup, similarity, text, multimodal
    sources/      — KrakenUniq report scan + CSV/TSV sinks
    functions/    — vector / text-hash column expression helpers
    streaming/    — Structured Streaming ops over the events table
    plans/        — plan-inspection helpers (pushdown/broadcast assertions)
"""

__version__ = "0.1.0"
