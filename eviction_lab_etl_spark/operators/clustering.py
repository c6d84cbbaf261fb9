"""Duplicate-cluster resolution: connected components over near-dup pairs.

Pairwise near-dup detection (Jaccard / SimHash / cosine) emits EDGES; a real
dedup stage needs the transitive closure — every document labeled with its
duplicate GROUP so one canonical member per group survives. That closure is
graph connected components, computed here as distributed min-label
propagation:

    label(v) := min(label(v), min over neighbors' labels), iterate to fixpoint

Each iteration is one shuffle join + one aggregation — no driver-side graph,
no recursion in the engine. Convergence takes <= diameter iterations, and
near-dup clusters are short-diameter by construction (members are mutually
similar). For adversarially long chains at 100 TB the same loop hosts
large-star/small-star contraction (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14) which forces O(log n) rounds; the plumbing
(iterate, localCheckpoint to truncate lineage, early-exit on a converged
count) is identical. This is the canonical Spark-first shape for iterative
algorithms: a driver LOOP over distributed steps, never a driver graph.

The oracle expresses the same fixpoint as a DuckDB recursive CTE — one of
the few genuinely iterative computations ANSI SQL can state — so the hash
check covers label propagation end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eviction_lab_etl_spark.registry import query


def connected_components(edges: DataFrame, max_iter: int = 25) -> DataFrame:
    """Label every vertex of an (a, b) edge list with the minimum vertex id
    reachable from it. Returns (v, lbl). Pure operator — any near-dup pair
    set (token Jaccard, SimHash, embedding cosine) can feed it."""
    sym = edges.select("a", "b").unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    # Symmetrized edges are reused every iteration: materialize once.
    sym = sym.localCheckpoint()
    labels = (
        sym.select(F.col("a").alias("v")).distinct().withColumn("lbl", F.col("v"))
    )
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["b"] == labels["v"])
            .groupBy(sym["a"].alias("v"))
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        updated = (
            labels.alias("l")
            .join(nbr_min.alias("n"), F.col("l.v") == F.col("n.v"), "left")
            .select(
                F.col("l.v").alias("v"),
                F.least(
                    F.col("l.lbl"), F.coalesce(F.col("n.nbr_lbl"), F.col("l.lbl"))
                ).alias("lbl"),
                (
                    F.coalesce(F.col("n.nbr_lbl"), F.col("l.lbl")) < F.col("l.lbl")
                ).alias("chg"),
            )
        )
        # Truncate lineage: without this the plan doubles every iteration and
        # the final job replays every join since iteration 0.
        updated = updated.localCheckpoint()
        n_changed = updated.filter("chg").count()
        labels = updated.drop("chg")
        if n_changed == 0:
            break
    return labels


@query(
    "dedup_cluster_cc",
    oracle="""
    WITH RECURSIVE tok AS (
        SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w
        FROM documents WHERE doc_id < 200
    ),
    sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
    pr AS (
        SELECT t1.doc_id AS a, t2.doc_id AS b, count(*) AS inter
        FROM tok t1 JOIN tok t2 ON t1.w = t2.w AND t1.doc_id < t2.doc_id
        GROUP BY 1, 2
    ),
    edges0 AS (
        SELECT a, b FROM pr
        JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b
        WHERE 10 * inter >= 9 * (sa.n + sb.n - inter)
    ),
    edges AS (SELECT a, b FROM edges0 UNION ALL SELECT b AS a, a AS b FROM edges0),
    walk(v, lbl) AS (
        SELECT DISTINCT a AS v, a AS lbl FROM edges
        UNION
        SELECT e.b AS v, w.lbl FROM walk w JOIN edges e ON e.a = w.v
    )
    SELECT v AS doc_id, min(lbl) AS component FROM walk GROUP BY v
    """,
)
def dedup_cluster_cc(spark, sf_dir):
    """Duplicate groups from near-dup pairs: edges are token-set Jaccard
    >= 0.9 over doc_id < 200 (the sim_jaccard_pairs inverted-index plan,
    tightened from its 0.6 report threshold to near-dup strength — at
    sf0.01 that graph has 81 vertices in 5 components, so the closure
    decides real structure), then ``connected_components`` labels each
    participating doc with its group id (= min doc_id in the group — the
    keep-first canonical member)."""
    from eviction_lab_etl_spark.operators.dedup_text import sim_jaccard_pairs

    pairs = sim_jaccard_pairs(spark, sf_dir)
    edges = pairs.filter(10 * F.col("inter") >= 9 * F.col("uni")).select("a", "b")
    return connected_components(edges).select(
        F.col("v").alias("doc_id"), F.col("lbl").alias("component")
    )
