"""Embedding-column analytics (LLM-pipeline extension).

Beyond similarity search (dedup_text.py / extensions.py), an embedding
pipeline needs corpus hygiene statistics: per-class centroids (drift
monitoring, classifier priors) and norm distributions (catching un-normalized
or degenerate vectors before they poison an ANN index). Both are exact here
despite float inputs, via the quantize-then-integer-aggregate discipline:
each float element is promoted losslessly to double, scaled by 1000, floored
to a bigint, and only INTEGERS are ever aggregated — associative, engine- and
partition-order-independent (§2.0 rule 1 for floats, solved by not summing
floats at all).

Scale design: both operators are single-pass map + one small aggregate — the
per-element transform is a JVM higher-order function (no Python boundary), the
shuffle carries one row per group (10 labels / ~8 buckets), and at 100 TB the
cost is exactly one scan of the embedding column (other columns pruned)."""

from __future__ import annotations

from pyspark.sql import functions as F

from eviction_lab_etl_spark.functions.determinism import big
from eviction_lab_etl_spark.registry import query
from eviction_lab_etl_spark.sources.loader import load

# Quantized view of element i (1-based): lossless float->double promotion,
# exact *1000 (IEEE double), floor, bigint. Identical in both engines.
_Q = "CAST(floor(CAST(embedding[{i}] AS DOUBLE) * 1000) AS BIGINT)"


def _q_elem(i: int) -> F.Column:
    return F.floor(F.element_at("embedding", i).cast("double") * 1000).cast("long")


@query(
    "embed_centroid_stats",
    oracle=f"""
    SELECT CAST(label AS BIGINT) AS label,
           count(*) AS n_vecs,
           CAST(sum({_Q.format(i=1)}) AS BIGINT) AS s1,
           CAST(sum({_Q.format(i=2)}) AS BIGINT) AS s2,
           CAST(sum({_Q.format(i=3)}) AS BIGINT) AS s3,
           CAST(sum({_Q.format(i=4)}) AS BIGINT) AS s4
    FROM embeddings
    GROUP BY label
    """,
)
def embed_centroid_stats(spark, sf_dir):
    """Per-label centroid evidence: vector count plus the exact quantized
    component sums of the first four dimensions (centroid[i] = s_i / (1000 ×
    n_vecs) to millivolt precision — the consumer divides; we only ship
    integers, so the hash is stable). The real-pipeline role is class-drift
    monitoring: a centroid shift between snapshots shows up directly in
    these sums. One scan, one 10-row aggregate."""
    emb = load(spark, sf_dir, "embeddings")
    return emb.groupBy(big("label").alias("label")).agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum(_q_elem(1)).alias("s1"),
        F.sum(_q_elem(2)).alias("s2"),
        F.sum(_q_elem(3)).alias("s3"),
        F.sum(_q_elem(4)).alias("s4"),
    )


@query(
    "embed_norm_hist",
    oracle="""
    WITH q AS (
        SELECT vec_id,
               CAST(list_sum(list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)
                      * CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)))
                    AS BIGINT) AS norm_sq_q
        FROM embeddings
    )
    SELECT norm_sq_q // 1000 AS bucket,
           count(*) AS n_vecs,
           min(norm_sq_q) AS min_q,
           max(norm_sq_q) AS max_q
    FROM q
    GROUP BY bucket
    """,
)
def embed_norm_hist(spark, sf_dir):
    """Norm-distribution histogram over the quantized squared L2 norm
    (sum of squared milli-components — ~10^6 for a unit vector, so the
    1000-wide buckets resolve ±0.1% norm drift). The un-normalized-vector
    check every ANN ingest needs: a healthy corpus is one tight bucket
    cluster; stragglers are bad rows. The squared sum is a per-row
    sequential fold over INTEGERS (exact, order-free), computed by a JVM
    higher-order aggregate — no Python, no shuffle until the ~8-row
    histogram."""
    emb = load(spark, sf_dir, "embeddings")
    q = F.aggregate(
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * 1000).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v * v,
    ).alias("norm_sq_q")
    return (
        emb.select(q)
        .groupBy((F.col("norm_sq_q") / 1000).cast("long").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.min("norm_sq_q").alias("min_q"),
            F.max("norm_sq_q").alias("max_q"),
        )
    )
