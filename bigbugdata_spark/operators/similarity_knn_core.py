"""Shared, NON-REGISTERING core of the k-NN graph build — the K/probe
constants and the full IVF-kNN oracle SQL, shared by the registered
graph query (operators/similarity_knn.py) and the semantic-dedup keep
policy built on the graph (operators/similarity_keep.py).  Split out in
round 10 so similarity_keep can hold an in-cap registry slot without
dragging similarity_knn's freshly-green registration forward (the
scd_core.py treatment; see registry.py's rotation comment).

No analog in the reference (SURVEY §2.1); similarity extension surface.
"""

from __future__ import annotations

from bigbugdata_spark.functions import hashing as H
from bigbugdata_spark.functions.fragments import EMB_DIM, sql_graph_ivf_k
from bigbugdata_spark.operators.audits import SIM_CORPUS_SQL, ivf_stages_sql

KNN_K = 5
KNN_PROBE = 4  # index-build probe width (< query-time N_PROBE)

# The graph build sizes cells to a CONSTANT row target (sql_graph_ivf_k
# — r12, VERDICT r11 #1b) and routes both assignment and probes through
# the two-level supercell structure: every corpus vector is a query
# here, so per-query work must be bounded, not sqrt(n)-sized.
KNN_SQL = f"""
    WITH {SIM_CORPUS_SQL},
    allq AS (
        SELECT vec_id AS query_id, embedding AS q_emb, nrm AS q_nrm
        FROM corpus
    ),
    {ivf_stages_sql("allq", KNN_PROBE, k_sql=sql_graph_ivf_k("corpus"), routed_probes=True)}
    SELECT src, dst, rnk, cos_sim FROM (
        SELECT cd.query_id AS src, co.vec_id AS dst,
               ROW_NUMBER() OVER (
                   PARTITION BY cd.query_id
                   ORDER BY {H.sql_dot('q.q_emb', 'co.embedding', EMB_DIM)}
                            / (q.q_nrm * co.nrm) DESC,
                            co.vec_id ASC
               ) AS rnk,
               {H.sql_dot('q.q_emb', 'co.embedding', EMB_DIM)}
                   / (q.q_nrm * co.nrm) AS cos_sim
        FROM cand cd
        JOIN corpus co ON co.vec_id = cd.vec_id
        JOIN allq q ON q.query_id = cd.query_id
    ) WHERE rnk <= {KNN_K}
"""
