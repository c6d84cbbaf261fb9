"""SparkSession factory applying the engine-wide configuration contract.

Config rationale (SURVEY.md §1.2/§4):
- ``spark.sql.legacy.parquet.nanosAsLong=true``: the ``events`` fixture stores
  ``ts`` as parquet TIMESTAMP(NANOS); PySpark 4.x refuses it otherwise
  ([PARQUET_TYPE_ILLEGAL]). The loader then rebuilds a µs timestamp with exact
  integer division (see sources/loader.py).
- ``spark.sql.session.timeZone=UTC``: timestamps must render identically to the
  DuckDB oracle's naive (UTC) timestamps.
- AQE on: runtime partition coalescing, dynamic broadcast switch, and skew-join
  splitting — the scale path for 100 TB (skewed keys split without manual salting).
- Arrow on: every Pandas UDF / applyInPandas / mapInPandas crosses the
  JVM↔Python boundary in columnar Arrow batches instead of pickled rows.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# Confs that are runtime-settable (SQL confs): applied defensively even to
# driver-provided sessions we did not build ourselves.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Partition-overwrite only touches partitions present in the written frame —
    # this is the engine's incremental-rebuild primitive (the Make-mtime analog,
    # SURVEY §4.1) used by streaming foreachBatch upserts.
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
}


def configure(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine confs to an existing session (idempotent)."""
    for key, value in RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            # Non-settable in this session (e.g. static conf already fixed) —
            # the build_session path sets it at construction time instead.
            pass
    return spark


def build_session(
    app_name: str = "eviction-lab-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine configuration contract.

    ``shuffle_partitions`` defaults to Spark's own default; tests and the local
    bench pass an explicit value sized to the core count (on a real cluster AQE
    coalesces the post-shuffle partitioning at runtime, so a generous static
    value is safe).
    """
    builder = SparkSession.builder.appName(app_name)
    if master is not None:
        builder = builder.master(master)
    for key, value in RUNTIME_CONFS.items():
        builder = builder.config(key, value)
    if shuffle_partitions is not None:
        builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    spark = builder.getOrCreate()
    return configure(spark)
