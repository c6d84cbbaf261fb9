"""Group A — scans / sources / sinks (SURVEY §2.A).

Models the reference's file-based source/sink layer (per-level CSV build targets
and per-state export partitioning, ref tags R4–R7 ⚠unverified) as parquet/CSV/JSON
DataFrame IO. Predicate and column pushdown reach the parquet scan via Catalyst —
``scan_filter_prune`` exists specifically to exercise that (its physical plan shows
PushedFilters + a 3-column ReadSchema).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from eviction_lab_etl_spark.functions.determinism import big
from eviction_lab_etl_spark.registry import query
from eviction_lab_etl_spark.sources.loader import load

# Sink scratch space: per-process unique root so repeated runs never collide.
_IO_ROOT = os.path.join(tempfile.gettempdir(), f"elspark_io_{os.getpid()}")


def _sink_path(name: str) -> str:
    return os.path.join(_IO_ROOT, name)


@query(
    "scan_project",
    oracle="""
    SELECT l_orderkey AS okey, l_linenumber AS line,
           l_quantity AS qty, l_extendedprice AS price
    FROM lineitem
    """,
)
def scan_project(spark, sf_dir):
    """Projection + rename at scan (ref: tile-CSV column abbreviation, R4/R6).

    Column pruning pushes the 4-column ReadSchema into the parquet scan.
    """
    return load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey"),
        F.col("l_linenumber").alias("line"),
        F.col("l_quantity").alias("qty"),
        F.col("l_extendedprice").alias("price"),
    )


@query(
    "scan_filter_prune",
    oracle="""
    SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS o_orderdate
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1998-01-01'
    """,
)
def scan_filter_prune(spark, sf_dir):
    """Predicate + column pushdown to the parquet scan (R4).

    The filter compares the raw timestamp column (pushable); only the output
    projects it to a date.
    """
    orders = load(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        .select(
            "o_orderkey",
            "o_custkey",
            F.to_date("o_orderdate").alias("o_orderdate"),
        )
    )


@query(
    "io_csv_roundtrip",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def io_csv_roundtrip(spark, sf_dir):
    """CSV sink → schema-explicit CSV source round-trip (the reference's IR is
    CSV-on-disk between every Make stage, R4–R7). Hash-checked against the
    SOURCE table: text serialization must preserve every int and name
    byte-for-byte, which pins quoting, header handling, and the declared
    read schema — not just that "some rows came back". The write carries
    EXACTLY the three checked columns (not all four of nation), so the
    read-back schema maps one-to-one instead of leaning on enforceSchema's
    positional trailing-column drop."""
    path = _sink_path("nation_csv")
    load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    ).write.mode("overwrite").option("header", True).csv(path)
    schema = StructType(
        [
            StructField("n_nationkey", IntegerType()),
            StructField("n_name", StringType()),
            StructField("n_regionkey", IntegerType()),
        ]
    )
    return spark.read.schema(schema).option("header", True).csv(path)


@query(
    "io_bucketed_join",
    oracle="""
    SELECT o_orderstatus, count(*) AS n_lines
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus
    """,
)
def io_bucketed_join(spark, sf_dir):
    """Bucketed-table co-located join (the 100 TB ingest contract): orders and
    lineitem both hash-bucketed on orderkey at write time, so the later join
    needs NO exchange on either side — the shuffle is paid once at ingest, not
    per query. The plan property (0 Exchanges) is asserted in
    tests/test_layout.py; this entry makes the layout lever driver-visible.
    Returns per-orderstatus lineitem counts from the bucket-joined tables;
    the oracle runs the identical join+aggregate on the source tables, so
    the driver hash proves the bucketed write/read/join path is lossless
    (not merely that it ran)."""
    from eviction_lab_etl_spark.plans.layout import bucketed_write

    n = 8
    bucketed_write(
        load(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus"),
        "elspark_orders_b", "o_orderkey", n, _sink_path("orders_bucketed"),
    )
    bucketed_write(
        load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity"),
        "elspark_lineitem_b", "l_orderkey", n, _sink_path("lineitem_bucketed"),
    )
    orders_b = spark.table("elspark_orders_b")
    li_b = spark.table("elspark_lineitem_b")
    return (
        li_b.join(orders_b, li_b.l_orderkey == orders_b.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_lines"))
    )


@query(
    "io_orc_roundtrip",
    oracle="SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders",
)
def io_orc_roundtrip(spark, sf_dir):
    """ORC sink/source round-trip — the second columnar format a lakehouse
    deployment encounters (Hive-era tables); schema and values must survive
    unchanged, including decimals-as-doubles. The oracle selects the same
    three columns from the parquet source (io_text_roundtrip's pattern), so
    the driver hash proves the ORC write/read preserved every value bit-
    for-bit (IEEE doubles round-trip exactly through ORC's DOUBLE)."""
    path = _sink_path("orders_orc")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    orders.write.mode("overwrite").orc(path)
    return spark.read.orc(path)


@query(
    "io_json_lines",
    oracle="""
    SELECT CAST(event_id AS BIGINT) AS event_id, event_type FROM events
    """,
)
def io_json_lines(spark, sf_dir):
    """JSON-lines sink/source round-trip (search-index JSON export analog,
    R9). Hash-checked against the source table: schema-INFERRED read-back
    (JSON numbers come back bigint — the oracle casts to match) must
    reproduce every id and string, pinning JSON escaping both ways."""
    path = _sink_path("events_json")
    events = load(spark, sf_dir, "events").select("event_id", "event_type")
    events.write.mode("overwrite").json(path)
    return spark.read.json(path).select("event_id", "event_type")


@query(
    "io_partitioned_write",
    oracle="""
    SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS yr
    FROM orders WHERE year(o_orderdate) = 1997
    """,
)
def io_partitioned_write(spark, sf_dir):
    """Partitioned parquet sink + partition-pruned read (per-state export
    analog, R7). Hash-checked against the source table filtered the same
    way: the pruned read of one yr= directory must return exactly the 1997
    keys — verifying partition ROUTING (every row landed in the directory
    its year says), not just that pruning returned something.

    At 100 TB this is the layout contract: facts land partitioned by a
    date-derived key so every downstream year-filter prunes at the source.
    """
    from eviction_lab_etl_spark.functions.determinism import big

    path = _sink_path("orders_by_yr")
    orders = load(spark, sf_dir, "orders").withColumn("yr", F.year("o_orderdate"))
    orders.write.mode("overwrite").partitionBy("yr").parquet(path)
    # Partition pruning: yr=1997 resolves to one directory, not a full scan.
    return (
        spark.read.parquet(path)
        .filter(F.col("yr") == 1997)
        .select(big("o_orderkey").alias("o_orderkey"), big("yr").alias("yr"))
    )


@query(
    "io_python_datasource",
    oracle="""
    SELECT i AS event_id,
           CAST(i // 500 AS INTEGER) AS shard,
           (i * i) % 97 AS value
    FROM range(0, 4000) t(i)
    """,
)
def io_python_datasource(spark, sf_dir):
    """Custom connector via the Python Data Source API (Spark 4) — the
    engine's seam for ingesting systems no built-in format reads (the
    reference's census-endpoint fetches, R2). The synthetic-telemetry source
    declares 8 input partitions x 500 rows; Spark runs one task per
    partition and the rows cross into the JVM as Arrow batches. The content
    rule is pure arithmetic on the global row index, so the oracle states
    the full expected table and the driver value-hashes a CUSTOM connector
    exactly like a parquet scan. sf_dir is unused: the source IS the data."""
    from eviction_lab_etl_spark.sources import pyds

    pyds.register(spark)
    return (
        spark.read.format("synthetic_telemetry")
        .option("shards", 8)
        .option("rows", 500)
        .load()
    )


@query("io_binary_files")  # rows-only: filesystem listing isn't view-expressible
def io_binary_files(spark, sf_dir):
    """``binaryFile`` format scan (A/X): Spark's native multimodal ingest —
    each file arrives as one row of (path, length, content bytes) with the
    content column PRUNED unless projected, so a metadata-only listing never
    reads payloads. This is how image/audio corpora enter the engine before
    the mapInPandas decode stage (operators/multimodal.py). Emitted as
    (file_name, n_bytes, content md5) — tests/test_rows_only.py cross-checks
    every digest against DuckDB's read_blob over the same directory."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(sf_dir)
    )
    return files.select(
        F.element_at(F.split("path", "/"), -1).alias("file_name"),
        F.col("length").alias("n_bytes"),
        F.md5("content").alias("content_md5"),
    )


@query(
    "io_xml_roundtrip",
    oracle="""
    SELECT CAST(n_nationkey AS BIGINT) AS nkey, n_name,
           CAST(n_regionkey AS BIGINT) AS rkey
    FROM nation
    """,
)
def io_xml_roundtrip(spark, sf_dir):
    """XML sink + source round-trip (Spark 4's built-in XML data source):
    write nation as nested <row> elements, read it back with an EXPLICIT
    schema (XML inference would widen the int keys), and hash-check the
    result against the source table itself — a hash match PROVES the
    round-trip lossless, which is strictly stronger than the rows-only
    count the CSV/JSON round-trips settle for (their SURVEY rows-only
    status predates this pattern). Scale: XML is a line-splittable source
    only with care; the write is one task per partition and the read
    distributes per file — fine for config/dimension-sized data, wrong for
    facts (use parquet), which is the real guidance the operator encodes."""
    from pyspark.sql.types import LongType

    out = _sink_path("nation_xml")
    nation = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("nkey"),
        "n_name",
        F.col("n_regionkey").cast("long").alias("rkey"),
    )
    nation.write.mode("overwrite").format("xml").option("rootTag", "nations").option(
        "rowTag", "nation"
    ).save(out)
    schema = StructType(
        [
            StructField("nkey", LongType()),
            StructField("n_name", StringType()),
            StructField("rkey", LongType()),
        ]
    )
    return (
        spark.read.format("xml")
        .option("rowTag", "nation")
        .schema(schema)
        .load(out)
    )


@query(
    "io_text_roundtrip",
    oracle="SELECT text FROM documents",
)
def io_text_roundtrip(spark, sf_dir):
    """Plain-text sink + source round-trip: write the documents corpus as
    newline-delimited text (the interchange format every tokenizer/dedup
    CLI in an LLM data pipeline reads), read it back line-per-row, and
    hash-check against the source column — lossless because the fixture
    corpus is single-line (the operator would be WRONG for multi-line
    documents; that corpus needs JSON-lines with escaping, io_json_lines).
    Text files split by line at any scale; the value-hash is order-
    insensitive, so the nondeterministic file/line order under parallel
    write does not matter."""
    out = _sink_path("docs_text")
    docs = load(spark, sf_dir, "documents").select("text")
    docs.write.mode("overwrite").text(out)
    return spark.read.text(out).withColumnRenamed("value", "text")


# --- Physical-layout library, driver-checked (plans/layout.py) ---------------

_Z_BITS = 16
_Z_MAX = (1 << _Z_BITS) - 1
# Morton interleave of the two 16-bit ranks, as DuckDB bit arithmetic — the
# same shift-or lattice plans/layout._interleave generates as Spark Columns.
_Z_INTERLEAVE_DUCK = "\n               | ".join(
    f"(((r{j} >> {i}) & 1) << {i * 2 + j})"
    for i in range(_Z_BITS)
    for j in range(2)
)


@query(
    "layout_zorder_key",
    oracle=f"""
    WITH r AS (
        SELECT o_orderkey,
               CAST(floor(percent_rank() OVER (ORDER BY o_custkey)
                          * {_Z_MAX}) AS BIGINT) AS r0,
               CAST(floor(percent_rank() OVER (ORDER BY o_totalprice)
                          * {_Z_MAX}) AS BIGINT) AS r1
        FROM orders
    )
    SELECT o_orderkey,
           {_Z_INTERLEAVE_DUCK} AS zkey
    FROM r
    """,
)
def layout_zorder_key(spark, sf_dir):
    """EXACT Z-order (Morton) clustering key per order over (o_custkey,
    o_totalprice) — the correctness reference behind `zorder_write`'s
    clustered layout (plans/layout.py): percent_rank normalizes each
    dimension to a 16-bit integer rank, then the bit-planes interleave so
    rows close on EVERY dimension land close on the 1-D curve. The oracle
    rebuilds the identical key in SQL bit arithmetic (floor before the
    BIGINT cast — DuckDB rounds double→bigint where Spark truncates), so
    the driver hash pins the full rank+interleave lattice value-for-value.
    Rank floors are tie-stable (percent_rank depends only on rank), making
    the float→int boundary cross-engine exact. This exact form carries the
    documented single-task-sort warning; the production map-only path
    (`zorder_key_sampled`, approx-quantile cut points inlined as literals)
    is plan-pinned in tests/test_layout.py and used by zorder_write."""
    from eviction_lab_etl_spark.plans.layout import zorder_key

    orders = load(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        zorder_key(["o_custkey", "o_totalprice"], bits=_Z_BITS).alias("zkey"),
    )


@query(
    "io_range_partitioned",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n,
           CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
                AS BIGINT) AS spend_cents
    FROM orders
    WHERE o_orderdate >= DATE '1995-01-01'
    GROUP BY o_orderpriority
    """,
)
def io_range_partitioned(spark, sf_dir):
    """Range-clustered parquet sink + pruned read-back
    (plans/layout.write_range_partitioned): orders land in 4 files each
    covering a contiguous o_orderdate range, then the scan applies a date
    predicate — parquet footer min/max stats skip the files wholly before
    the cutoff — and aggregates exact cents per priority. The oracle runs
    the same filter+aggregate on the source table, so the driver hash
    proves the clustered write/read path is lossless end to end (exact
    cents via the shared cents() contract — o_totalprice is a 2-dp-valued
    DOUBLE in the fixture, so the +0.5-truncate / DECIMAL-cast pair is the
    cross-engine-exact recovery, §2.0). At
    100 TB this layout is the write-side dual of partition pruning: one
    repartitionByRange exchange at ingest buys file skipping on every
    later time-bounded scan."""
    from eviction_lab_etl_spark.functions.determinism import cents
    from eviction_lab_etl_spark.plans.layout import write_range_partitioned

    out = _sink_path("orders_range")
    orders = load(spark, sf_dir, "orders")
    write_range_partitioned(orders, out, "o_orderdate", n_files=4)
    back = spark.read.parquet(out).filter(
        F.col("o_orderdate") >= F.lit("1995-01-01").cast("date")
    )
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents("o_totalprice")).alias("spend_cents"),
    )


@query(
    "io_schema_evolution",
    oracle="""
    SELECT year(o_orderdate) AS od_year,
           count(*) AS n,
           count(CASE WHEN year(o_orderdate) = 1997
                      AND o_orderpriority = '1-URGENT' THEN 1 END)
               AS n_urgent_flagged
    FROM orders
    WHERE year(o_orderdate) IN (1996, 1997)
    GROUP BY od_year
    """,
)
def io_schema_evolution(spark, sf_dir):
    """ADDITIVE SCHEMA EVOLUTION on read: the 1996 vintage lands WITHOUT the
    later `urgent_flag` column, the 1997 vintage adds it, and ONE
    `mergeSchema` read reconciles both file generations — old files surface
    the new column as NULL (so `count(col)` skips them), exactly the
    Delta/Iceberg add-column contract rebuilt on raw parquet. The oracle
    recomputes from the source table: 1996 rows can contribute no flags,
    1997 rows flag exactly the urgent ones — so the hash pins that NULL
    back-fill semantics, not just row counts.

    At 100 TB schema evolution is a WRITE-side property: rewriting history
    to add a column is a full-table pass, while merge-on-read costs one
    footer per file generation (schemas merge per-file at planning, data
    unread). The engine's own snapshot table reads with mergeSchema for the
    same reason (sources/snapshot.py); this query pins the raw-parquet
    behavior the table format builds on. Production note: mergeSchema is
    OFF by default in Spark because footer-merging across thousands of
    files costs planning time — turn it on per-read as here, or centralize
    the schema in a table format."""
    out = _sink_path("orders_evolving")
    orders = load(spark, sf_dir, "orders")
    y96 = orders.filter(F.year("o_orderdate") == 1996).select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    y97 = orders.filter(F.year("o_orderdate") == 1997).select(
        "o_orderkey",
        "o_orderdate",
        "o_orderpriority",
        (F.col("o_orderpriority") == "1-URGENT").alias("urgent_flag"),
    )
    y96.write.mode("overwrite").parquet(out)
    y97.write.mode("append").parquet(out)
    back = spark.read.option("mergeSchema", "true").parquet(out)
    return back.groupBy(
        F.year("o_orderdate").cast("long").alias("od_year")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("urgent_flag"), 1)).alias("n_urgent_flagged"),
    )


@query(
    "io_stats_manifest",
    oracle="""
    SELECT year(o_orderdate) AS od_year,
           CAST(1 AS BIGINT) AS n_files,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(o_orderkey) AS BIGINT) AS min_key,
           CAST(max(o_orderkey) AS BIGINT) AS max_key
    FROM orders
    GROUP BY od_year
    """,
)
def io_stats_manifest(spark, sf_dir):
    """FILE-STATISTICS MANIFEST (zone map): write orders hive-partitioned by
    order year — pre-shuffled on the partition column so every year lands in
    exactly ONE task and therefore exactly one file per directory (the
    small-files discipline; without the repartition, every input task writes
    a sliver into every year) — then rebuild the per-partition manifest from
    the files themselves: file count via `input_file_name()`, row count, and
    min/max of the sort key. This is the metadata layer every table format
    (Iceberg/Delta manifests, parquet footer zone maps) maintains so that
    `WHERE o_orderkey BETWEEN ...` can prune whole files without reading
    them; `io_range_partitioned` demonstrates the pruned READ, this operator
    pins the manifest BUILD. The oracle recomputes the same stats from the
    source table with n_files pinned at the literal 1 the layout guarantees
    — so the hash verifies the one-file-per-partition contract AND that the
    round-trip preserved every key.

    Scale shape (100 TB): one narrow-projection shuffle on the partition key
    (same cost class as the write itself); the manifest scan aggregates
    min/max/count per file — at production scale this comes from parquet
    footers (O(files) metadata reads, zero data), and the aggregation shape
    here is identical to a footer-driven rebuild."""
    from eviction_lab_etl_spark.functions.determinism import big

    out = _sink_path("orders_manifest")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("od_year")
    )
    orders.repartition("od_year").write.mode("overwrite").partitionBy(
        "od_year"
    ).parquet(out)
    back = spark.read.parquet(out).withColumn("fname", F.input_file_name())
    return back.groupBy(F.col("od_year").cast("bigint").alias("od_year")).agg(
        F.count_distinct("fname").alias("n_files"),
        F.count(F.lit(1)).alias("n"),
        big(F.min("o_orderkey")).alias("min_key"),
        big(F.max("o_orderkey")).alias("max_key"),
    )


@query(
    "io_parquet_bloom_roundtrip",
    oracle="""
    SELECT CAST(event_id AS BIGINT) AS event_id,
           CAST(user_id AS BIGINT) AS user_id, event_type
    FROM events WHERE user_id = 7
    """,
)
def io_parquet_bloom_roundtrip(spark, sf_dir):
    """Parquet write with BLOOM FILTERS on the point-lookup key + predicate
    read-back — the data-skipping lever for needle-in-haystack queries that
    min/max row-group stats cannot serve (user_id is uniformly spread, so
    every row group's [min, max] contains every probe value and zone maps
    prune NOTHING; the per-row-group bloom answers 'definitely absent' and
    skips the page reads instead). At 100 TB this is the difference between
    scanning every row group of a 10^6-file table and touching only the
    groups that can contain the key. The write pays one bitset per row
    group per column — space-bounded by ndv, set explicitly.

    The driver hash checks the full round-trip: bloom-annotated write,
    predicate read (the filter reaches the reader — PushedFilters pinned in
    tests/test_layout.py), values byte-identical to the source-table
    oracle. False positives cost only wasted reads, never wrong rows — the
    parquet reader re-applies the predicate exactly. Encoding nuance,
    pinned in the same test: parquet-mr emits the bitset only when the
    chunk's dictionary overflows (a fully dictionary-encoded low-ndv chunk
    — the fixture at small SF — already carries an exact membership
    filter, so the bloom would be redundant bytes); the test proves the
    option produces bitsets on a high-ndv column and the predicate
    pushdown on this operator's own read."""
    path = _sink_path("events_bloom")
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    (
        ev.write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#user_id", "true")
        .option("parquet.bloom.filter.expected.ndv#user_id", "2000")
        .parquet(path)
    )
    return spark.read.parquet(path).filter(F.col("user_id") == 7).select(
        big("event_id").alias("event_id"),
        big("user_id").alias("user_id"),
        "event_type",
    )


@query(
    "io_parquet_zstd_roundtrip",
    oracle="""
    SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
           CAST(l_linenumber AS BIGINT) AS l_linenumber,
           l_extendedprice, l_returnflag
    FROM lineitem
    """,
)
def io_parquet_zstd_roundtrip(spark, sf_dir):
    """Parquet round-trip under the ZSTD codec — the storage-efficiency
    lever of the IO contract (at 100 TB the snappy→zstd switch trades
    ~15-30% more scan CPU for ~2× smaller files; on cold-storage-bound or
    network-bound clusters zstd wins, and this operator pins that the
    whole read path — decompressor, dictionary pages, doubles, strings —
    is value-lossless under it). The driver hash checks the read-back
    against the SOURCE table, so a codec that silently corrupted a page
    would fail the value check, not just a size expectation; the layout
    test additionally pins that the written files really carry ZSTD in
    the footer (a silently ignored option would leave this timing
    snappy)."""
    path = _sink_path("lineitem_zstd")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_returnflag"
    )
    li.write.mode("overwrite").option("compression", "zstd").parquet(path)
    return spark.read.parquet(path).select(
        big("l_orderkey").alias("l_orderkey"),
        big("l_linenumber").alias("l_linenumber"),
        "l_extendedprice",
        "l_returnflag",
    )
