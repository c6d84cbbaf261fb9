"""Geometry-lite operators: WKT centroids/bboxes and point→region assignment.

The reference's geo stage (R2/R9) fetches census polygons, simplifies them,
and derives centroid "label points" that the search index and map labels
consume; its core spatial computation is "which geography does this entity
belong to". SURVEY §7.4 rule 7 keeps real geometry libraries out of scope and
models shapes as WKT string columns — these operators implement exactly that
slice, Spark-first:

- **`geo_centroid_bbox`**: parse a WKT polygon ring and compute the shoelace
  area and area-centroid plus the bounding box — entirely with JVM
  higher-order array functions over integer coordinates, so the result is
  exact and hash-checkable (§2.0 rule 1: no float geometry). The centroid is
  emitted as exact integer numerators + denominator (cx = cx_num/den); a
  float consumer divides at the edge.
- **`geo_point_in_region`**: assign points to regions via the grid-cell
  index pattern — regions are bucketed by the cell their bbox center falls
  in, the |regions|-row cell index broadcasts, and each point probes with
  integer-div arithmetic. This is how a spatial join actually scales: the
  point side never shuffles, the region index is the small side. (With
  multi-cell regions the index gets one row per overlapped cell plus an
  exact post-filter — same plan shape.)

Both read the fixture-layer WKT corpus (fixtures.nation_polygons — the test
tables carry no geometry); the parsing/shoelace/bucketing logic takes any
(key, wkt) frame. Map-only except the final tiny aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from eviction_lab_etl_spark import fixtures
from eviction_lab_etl_spark.functions.determinism import big
from eviction_lab_etl_spark.registry import query
from eviction_lab_etl_spark.sources.loader import load

# Grid-cell size for the point→region index (fixture polygons are planted on
# a 5×5 grid of 20×20 cells, one nation per cell).
_CELL = 20


def _gcell(col: Column) -> Column:
    """Grid-cell id for a bigint coordinate: integer division, NOT
    ``(col / _CELL).cast('long')`` (r13 ADVICE). The float intermediate was
    exact only because fixture coordinates are small and non-negative; JVM
    ``div`` truncates toward zero exactly like DuckDB's integer ``//``
    (verified: -5//2 = -2 in BOTH engines), so negative coordinates bucket
    identically with no float precision cliff past 2^53."""
    return F.call_function("div", col, F.lit(_CELL))


def _ring_coords(df: DataFrame, wkt_col: str = "wkt") -> DataFrame:
    """Parse 'POLYGON ((x y, ..., x y))' into bigint coordinate arrays
    ``xs``/``ys`` (closing vertex included). Pure map stage."""
    body = F.regexp_replace(F.col(wkt_col), r"POLYGON \(\(|\)\)", "")
    pts = F.split(body, ", ")
    return df.withColumn(
        "xs",
        F.transform(pts, lambda p: F.element_at(F.split(p, " "), 1).cast("long")),
    ).withColumn(
        "ys",
        F.transform(pts, lambda p: F.element_at(F.split(p, " "), 2).cast("long")),
    )


def _shoelace_sum(term) -> Column:
    """Sum term(i) over ring edges i = 1..len-1, as a bigint fold."""
    return F.aggregate(
        F.sequence(F.lit(1), F.size("xs") - 1),
        F.lit(0).cast("long"),
        lambda acc, i: acc + term(i),
    )


def centroid_bbox(polys: DataFrame, key: str = "n_nationkey") -> DataFrame:
    """Exact shoelace area (×2), area-centroid numerators (denominator
    3×area2), and bbox for each WKT polygon. Integer in, integer out."""
    x = lambda i: F.element_at("xs", i)  # noqa: E731
    y = lambda i: F.element_at("ys", i)  # noqa: E731
    cross = lambda i: x(i) * y(i + 1) - x(i + 1) * y(i)  # noqa: E731
    ring = _ring_coords(polys)
    return ring.select(
        key,
        _shoelace_sum(cross).alias("a2"),
        _shoelace_sum(lambda i: (x(i) + x(i + 1)) * cross(i)).alias("cx_num"),
        _shoelace_sum(lambda i: (y(i) + y(i + 1)) * cross(i)).alias("cy_num"),
        (_shoelace_sum(cross) * 3).alias("den"),
        big(F.array_min(F.slice("xs", 1, F.size("xs") - 1))).alias("minx"),
        big(F.array_min(F.slice("ys", 1, F.size("ys") - 1))).alias("miny"),
        big(F.array_max(F.slice("xs", 1, F.size("xs") - 1))).alias("maxx"),
        big(F.array_max(F.slice("ys", 1, F.size("ys") - 1))).alias("maxy"),
    )


_ORACLE_RING = f"""
    poly AS ({fixtures.NATION_POLYGONS_SQL}),
    ring AS (
        SELECT n_nationkey,
               list_transform(
                   string_split(replace(replace(wkt, 'POLYGON ((', ''), '))', ''), ', '),
                   p -> CAST(string_split(p, ' ')[1] AS BIGINT)) AS xs,
               list_transform(
                   string_split(replace(replace(wkt, 'POLYGON ((', ''), '))', ''), ', '),
                   p -> CAST(string_split(p, ' ')[2] AS BIGINT)) AS ys
        FROM poly
    )
"""


@query(
    "geo_centroid_bbox",
    oracle=f"""
    WITH {_ORACLE_RING},
    edges AS (
        SELECT n_nationkey, xs, ys, unnest(range(1, len(xs))) AS i FROM ring
    )
    SELECT n_nationkey,
           CAST(sum(xs[i]*ys[i+1] - xs[i+1]*ys[i]) AS BIGINT) AS a2,
           CAST(sum((xs[i]+xs[i+1]) * (xs[i]*ys[i+1] - xs[i+1]*ys[i])) AS BIGINT)
               AS cx_num,
           CAST(sum((ys[i]+ys[i+1]) * (xs[i]*ys[i+1] - xs[i+1]*ys[i])) AS BIGINT)
               AS cy_num,
           CAST(sum(xs[i]*ys[i+1] - xs[i+1]*ys[i]) * 3 AS BIGINT) AS den,
           list_aggregate(xs[1:8], 'min') AS minx,
           list_aggregate(ys[1:8], 'min') AS miny,
           list_aggregate(xs[1:8], 'max') AS maxx,
           list_aggregate(ys[1:8], 'max') AS maxy
    FROM edges
    GROUP BY n_nationkey, xs, ys
    """,
)
def geo_centroid_bbox(spark, sf_dir):
    """Label-point derivation over the fixture WKT polygons: shoelace area,
    exact rational centroid, bbox — the reference's centers/label-point build
    re-expressed as JVM array folds (no UDF, no geometry lib, map-only)."""
    return centroid_bbox(fixtures.nation_polygons(spark, sf_dir))


@query(
    "geo_point_in_region",
    oracle=f"""
    WITH {_ORACLE_RING},
    cells AS (
        SELECT n_nationkey,
               ((list_aggregate(xs[1:8], 'min') + list_aggregate(xs[1:8], 'max')) // 2)
                   // {_CELL} AS gx,
               ((list_aggregate(ys[1:8], 'min') + list_aggregate(ys[1:8], 'max')) // 2)
                   // {_CELL} AS gy
        FROM ring
    ),
    pts AS (
        SELECT c_custkey,
               (c_custkey * 7919) % 100 AS px,
               (c_custkey * 104729) % 100 AS py
        FROM customer
    )
    SELECT n_nationkey,
           count(*) AS n_points,
           min(c_custkey) AS min_cust,
           max(c_custkey) AS max_cust
    FROM pts JOIN cells ON px // {_CELL} = gx AND py // {_CELL} = gy
    GROUP BY n_nationkey
    """,
)
def geo_point_in_region(spark, sf_dir):
    """Point→geography assignment via the grid-cell index: region bboxes
    (from the parsed WKT) are bucketed to their center cell, the 25-row cell
    index broadcasts, and customer points (deterministic integer coords
    derived from c_custkey) probe map-side — the point side never shuffles
    except for the final per-region count."""
    polys = centroid_bbox(fixtures.nation_polygons(spark, sf_dir))
    cells = polys.select(
        "n_nationkey",
        F.expr(f"((minx + maxx) div 2) div {_CELL}").alias("gx"),
        F.expr(f"((miny + maxy) div 2) div {_CELL}").alias("gy"),
    )
    pts = load(spark, sf_dir, "customer").select(
        "c_custkey",
        ((F.col("c_custkey") * 7919) % 100).alias("px"),
        ((F.col("c_custkey") * 104729) % 100).alias("py"),
    )
    return (
        pts.join(
            F.broadcast(cells),
            (F.expr(f"px div {_CELL}") == F.col("gx"))
            & (F.expr(f"py div {_CELL}") == F.col("gy")),
        )
        .groupBy("n_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.min("c_custkey").alias("min_cust"),
            F.max("c_custkey").alias("max_cust"),
        )
    )


@query(
    "geo_knn_grid",
    oracle=f"""
    WITH {_ORACLE_RING},
    centers AS (
        SELECT n_nationkey,
               (list_aggregate(xs[1:8], 'min') + list_aggregate(xs[1:8], 'max')) // 2
                   AS cx,
               (list_aggregate(ys[1:8], 'min') + list_aggregate(ys[1:8], 'max')) // 2
                   AS cy
        FROM ring
    ),
    cells AS (
        SELECT n_nationkey, cx, cy,
               cx // {_CELL} + dx.d AS gx, cy // {_CELL} + dy.d AS gy
        FROM centers,
             (SELECT unnest([-1, 0, 1]) AS d) dx,
             (SELECT unnest([-1, 0, 1]) AS d) dy
    ),
    pts AS (
        SELECT c_custkey,
               (c_custkey * 7919) % 100 AS px,
               (c_custkey * 104729) % 100 AS py
        FROM customer
    ),
    cand AS (
        SELECT c_custkey,
               (px - cx) * (px - cx) + (py - cy) * (py - cy) AS d2,
               n_nationkey
        FROM pts JOIN cells
          ON px // {_CELL} = gx AND py // {_CELL} = gy
    )
    SELECT c_custkey,
           CAST(min(d2 * 32 + n_nationkey) % 32 AS BIGINT) AS n_nationkey,
           CAST(min(d2 * 32 + n_nationkey) // 32 AS BIGINT) AS d2
    FROM cand GROUP BY c_custkey
    """,
)
def geo_knn_grid(spark, sf_dir):
    """Nearest-region assignment via the grid index — the spatial-KNN
    companion to geo_point_in_region's containment: each point probes the
    3×3 cell neighborhood of its own grid cell and takes the closest
    region center (squared integer distance; ties broken on the lower
    nationkey via a closed-form ``min(d2·32 + key)`` encode — one
    aggregate, no rank window). On this tiling (one center per 20×20
    cell) the 3×3 probe is EXACT: the own-cell center is within √2·10 of
    any point, closer than any center two cells away, so truncating the
    search to the neighborhood can never change the argmin — the standard
    grid-KNN argument, and the reason this plan needs no global
    all-centers pass.

    Scale shape: the 9-offset cell replication happens on the REGION side
    (|regions|·9 rows, broadcast); the point side computes its cell in the
    scan projection, hash-probes the broadcast, and collapses per point
    map-side — points never shuffle except for the final per-point min,
    which AQE coalesces. Everything integer, both engines fold
    identically."""
    centers = centroid_bbox(fixtures.nation_polygons(spark, sf_dir)).select(
        "n_nationkey",
        F.expr("(minx + maxx) div 2").alias("cx"),
        F.expr("(miny + maxy) div 2").alias("cy"),
    )
    offs = F.sequence(F.lit(-1), F.lit(1))
    cells = (
        centers.withColumn("dx", F.explode(offs))
        .withColumn("dy", F.explode(offs))
        .select(
            "n_nationkey",
            "cx",
            "cy",
            (F.expr(f"cx div {_CELL}") + F.col("dx")).alias("gx"),
            (F.expr(f"cy div {_CELL}") + F.col("dy")).alias("gy"),
        )
    )
    pts = load(spark, sf_dir, "customer").select(
        "c_custkey",
        ((F.col("c_custkey") * 7919) % 100).alias("px"),
        ((F.col("c_custkey") * 104729) % 100).alias("py"),
    )
    cand = pts.join(
        F.broadcast(cells),
        (F.expr(f"px div {_CELL}") == F.col("gx"))
        & (F.expr(f"py div {_CELL}") == F.col("gy")),
    ).select(
        "c_custkey",
        (
            (F.col("px") - F.col("cx")) * (F.col("px") - F.col("cx"))
            + (F.col("py") - F.col("cy")) * (F.col("py") - F.col("cy"))
        ).alias("d2"),
        "n_nationkey",
    )
    enc = cand.groupBy("c_custkey").agg(
        F.min(F.col("d2") * 32 + F.col("n_nationkey")).alias("k")
    )
    return enc.select(
        "c_custkey",
        (F.col("k") % 32).cast("long").alias("n_nationkey"),
        F.expr("k div 32").cast("long").alias("d2"),
    )


# --- exact point-in-polygon: WKT ray casting over the irregular fixture ------

# The reference's R2 containment question ("which census polygon holds this
# point") answered EXACTLY, not by bbox proxy: parse the WKT ring, prune
# candidates with the grid-cell index, then run the even-odd ray-cast crossing
# test per (point, candidate) — all integer arithmetic, identical in both
# engines. The crossing test avoids the textbook division (px < x_i +
# (x_{i+1}-x_i)·(py-y_i)/dy) by multiplying through by dy and flipping the
# inequality with dy's sign:
#     straddle_i  =  (y_i > py) != (y_{i+1} > py)          -- half-open rule
#     left_i      =  ((px-x_i)·dy - (x_{i+1}-x_i)·(py-y_i)) · sign(dy) < 0
# so vertices-on-ray count once, horizontal edges never straddle, and the
# whole predicate is exact 64-bit integer math (coords < 2^7, products
# < 2^16 — no overflow analysis needed).
#
# Scale shape, graded for 100 TB: the polygon side is |regions| rows exploded
# to one row per bbox-covered grid cell (the irregular fixture polygons spill
# across cell borders by construction — max radius 12 > the 10-unit cell
# half-width) and BROADCASTS with its coordinate arrays; the point side
# computes its cell in the scan projection, hash-probes the broadcast, and
# evaluates the ray-cast as a JVM array fold inside the same projection.
# ZERO shuffles: the output is per-point map-side rows (tests/test_plans.py
# pins no-exchange). Containment correctness of the pruning: a contained
# point lies inside the polygon's bbox, so its cell is one of the polygon's
# covered cells — the index can never miss.


def _ray_cast_hits(px, py) -> Column:
    """Even-odd crossing count of ring (xs, ys) from point (px, py), as an
    integer fold over edges 1..len-1 (closing vertex included in the ring)."""
    x = lambda i: F.element_at("xs", i)  # noqa: E731
    y = lambda i: F.element_at("ys", i)  # noqa: E731

    def edge(acc, i):
        dy = y(i + 1) - y(i)
        straddle = (y(i) > py) != (y(i + 1) > py)
        lhs = (px - x(i)) * dy - (x(i + 1) - x(i)) * (py - y(i))
        sgn = F.when(dy > 0, F.lit(1)).otherwise(F.lit(-1))
        return acc + F.when(straddle & (lhs * sgn < 0), 1).otherwise(0)

    return F.aggregate(
        F.sequence(F.lit(1), F.size("xs") - 1), F.lit(0).cast("long"), edge
    )


_ORACLE_RING_IRREGULAR = f"""
    poly AS ({fixtures.NATION_POLYGONS_IRREGULAR_SQL}),
    ring AS (
        SELECT n_nationkey,
               list_transform(
                   string_split(replace(replace(wkt, 'POLYGON ((', ''), '))', ''), ', '),
                   p -> CAST(string_split(p, ' ')[1] AS BIGINT)) AS xs,
               list_transform(
                   string_split(replace(replace(wkt, 'POLYGON ((', ''), '))', ''), ', '),
                   p -> CAST(string_split(p, ' ')[2] AS BIGINT)) AS ys
        FROM poly
    )
"""

# Shared point fixture: deterministic integer coords on the shifted lattice.
_PIP_PTS_SQL = """
    pts AS (
        SELECT c_custkey,
               20 + (c_custkey * 7919) % 100 AS px,
               20 + (c_custkey * 104729) % 100 AS py
        FROM customer
    )
"""

_RAY_CAST_SQL = """
    list_sum(list_transform(range(1, len(xs)), i ->
        CASE WHEN ((ys[i] > py) != (ys[i+1] > py))
              AND ((px - xs[i]) * (ys[i+1] - ys[i])
                   - (xs[i+1] - xs[i]) * (py - ys[i]))
                  * (CASE WHEN ys[i+1] > ys[i] THEN 1 ELSE -1 END) < 0
             THEN 1 ELSE 0 END))
"""


@query(
    "geo_point_in_polygon",
    oracle=f"""
    WITH {_ORACLE_RING_IRREGULAR},
    bbox AS (
        SELECT n_nationkey, xs, ys,
               list_aggregate(xs[:len(xs)-1], 'min') // {_CELL} AS gx0,
               list_aggregate(xs[:len(xs)-1], 'max') // {_CELL} AS gx1,
               list_aggregate(ys[:len(ys)-1], 'min') // {_CELL} AS gy0,
               list_aggregate(ys[:len(ys)-1], 'max') // {_CELL} AS gy1
        FROM ring
    ),
    cellsx AS (SELECT *, unnest(range(gx0, gx1 + 1)) AS gx FROM bbox),
    cells AS (SELECT *, unnest(range(gy0, gy1 + 1)) AS gy FROM cellsx),
    {_PIP_PTS_SQL},
    cand AS (
        SELECT p.c_custkey, p.px, p.py, c.n_nationkey, c.xs, c.ys
        FROM pts p JOIN cells c
          ON p.px // {_CELL} = c.gx AND p.py // {_CELL} = c.gy
    )
    SELECT c_custkey, px, py, n_nationkey
    FROM (SELECT c_custkey, px, py, n_nationkey,
                 {_RAY_CAST_SQL} AS hits
          FROM cand)
    WHERE hits % 2 = 1
    """,
)
def geo_point_in_polygon(spark, sf_dir):
    """Exact point→polygon containment over the IRREGULAR (concave) WKT
    fixture: grid-index pruning + even-odd ray cast, per the module-level
    plan note. Returns one row per (point, containing polygon) — adjacent
    stars can overlap (radii up to 12 vs 20-unit center spacing), and a
    concave ring means points inside the bbox and inside the grid cell are
    routinely OUTSIDE the polygon, so the driver hash pins the crossing
    test itself, not the pruning."""
    pts = load(spark, sf_dir, "customer").select(
        "c_custkey",
        (20 + (F.col("c_custkey") * 7919) % 100).alias("px"),
        (20 + (F.col("c_custkey") * 104729) % 100).alias("py"),
    )
    return _pip_pairs(spark, sf_dir, pts).select(
        "c_custkey", "px", "py", "n_nationkey"
    )


def _pip_pairs(spark, sf_dir, pts: DataFrame) -> DataFrame:
    """geo_point_in_polygon's construction over an arbitrary point frame
    (must carry ``px``/``py`` bigint columns; extra columns pass through):
    broadcast grid-cell index from the irregular rings, map-side even-odd
    ray cast, one output row per (point row, containing polygon). Shared by
    the registered containment query and the geo_search_index capstone —
    one construction, one plan shape (zero shuffles on the point side)."""
    ring = _ring_coords(fixtures.nation_polygons_irregular(spark, sf_dir))
    n_open = F.size("xs") - 1  # drop the closing vertex for the bbox
    bbox = ring.select(
        "n_nationkey",
        "xs",
        "ys",
        _gcell(F.array_min(F.slice("xs", 1, n_open))).alias("gx0"),
        _gcell(F.array_max(F.slice("xs", 1, n_open))).alias("gx1"),
        _gcell(F.array_min(F.slice("ys", 1, n_open))).alias("gy0"),
        _gcell(F.array_max(F.slice("ys", 1, n_open))).alias("gy1"),
    )
    cells = bbox.select(
        "n_nationkey",
        "xs",
        "ys",
        F.explode(F.sequence("gx0", "gx1")).alias("gx"),
        "gy0",
        "gy1",
    ).select(
        "n_nationkey", "xs", "ys", "gx",
        F.explode(F.sequence("gy0", "gy1")).alias("gy"),
    )
    cand = pts.join(
        F.broadcast(cells),
        (F.expr(f"px div {_CELL}") == F.col("gx"))
        & (F.expr(f"py div {_CELL}") == F.col("gy")),
    )
    return (
        cand.withColumn("hits", _ray_cast_hits(F.col("px"), F.col("py")))
        .filter(F.col("hits") % 2 == 1)
        .drop("xs", "ys", "gx", "gy", "gy0", "gy1", "hits")
    )


# --- polygon simplification: the area-sweep (Visvalingam first pass) ---------

# The reference's geo stage SIMPLIFIES fetched census polygons before
# deriving label points and tiles. Full Visvalingam-Whyatt removes vertices
# one at a time (recomputing neighbours after each removal) — inherently
# sequential per ring, the wrong shape for a column engine. The standard
# distributed compromise, implemented here, is the SINGLE-SWEEP area filter
# (exactly VW's first iteration, batched): drop every vertex whose effective
# triangle area (×2, integer) with its ring neighbours falls below the
# tolerance, in one pass over the ring. Per-ring work is O(n) inside the
# scan projection — at 100 TB of shapes the operator is map-only: no
# shuffle, no Python, no per-vertex explosion on the Spark side (the oracle
# explodes because SQL must; the operator stays an array pipeline).
# Tolerance 20 on the irregular fixture keeps 4–9 of 16 vertices per ring
# (always >= 3, still a valid ring — tests pin both bounds).

_SIMPLIFY_T = 20


@query(
    "geo_simplify_sweep",
    oracle=f"""
    WITH {_ORACLE_RING_IRREGULAR},
    openr AS (
        SELECT n_nationkey,
               xs[:len(xs)-1] AS xs, ys[:len(ys)-1] AS ys,
               len(xs) - 1 AS n
        FROM ring
    ),
    pos AS (
        SELECT n_nationkey, xs, ys, n, unnest(range(1, n + 1)) AS i
        FROM openr
    ),
    scored AS (
        SELECT n_nationkey, i, xs[i] AS x, ys[i] AS y,
               abs( (xs[(i % n) + 1] - xs[i]) * (ys[((i - 2 + n) % n) + 1] - ys[i])
                  - (xs[((i - 2 + n) % n) + 1] - xs[i]) * (ys[(i % n) + 1] - ys[i]) )
                   AS a2
        FROM pos
    ),
    kept AS (SELECT * FROM scored WHERE a2 >= {_SIMPLIFY_T})
    SELECT n_nationkey,
           CAST(count(*) AS BIGINT) AS n_kept,
           'POLYGON ((' || string_agg(CAST(x AS VARCHAR) || ' ' || CAST(y AS VARCHAR),
                                      ', ' ORDER BY i)
                        || ', ' || arg_min(CAST(x AS VARCHAR) || ' ' || CAST(y AS VARCHAR), i)
                        || '))' AS wkt
    FROM kept GROUP BY n_nationkey
    """,
)
def geo_simplify_sweep(spark, sf_dir):
    """Area-sweep polygon simplification over the irregular WKT fixture:
    one map-only pass computes each vertex's neighbour-triangle area (×2,
    exact integer, ring-wraparound neighbours), filters vertices below the
    tolerance, and re-emits the simplified ring as closed WKT plus the kept
    count. The Spark side never explodes vertices — the score/filter/
    reassemble chain runs as JVM higher-order array functions inside the
    scan projection. Rings that keep ZERO vertices are dropped (r13 ADVICE:
    the oracle's GROUP BY over kept vertices omits such nations implicitly,
    so the Spark side must agree by construction — not by fixture luck —
    should `_SIMPLIFY_T` or the fixture ever change)."""
    ring = _ring_coords(fixtures.nation_polygons_irregular(spark, sf_dir))
    n = F.size("xs") - 1
    openr = ring.select(
        "n_nationkey",
        F.slice("xs", 1, n).alias("xs"),
        F.slice("ys", 1, n).alias("ys"),
        n.alias("n"),
    )
    x = lambda i: F.element_at("xs", i)  # noqa: E731
    y = lambda i: F.element_at("ys", i)  # noqa: E731
    nn = F.col("n")
    nxt = lambda i: (i % nn) + 1  # noqa: E731
    prv = lambda i: ((i - 2 + nn) % nn) + 1  # noqa: E731
    a2 = lambda i: F.abs(  # noqa: E731
        (x(nxt(i)) - x(i)) * (y(prv(i)) - y(i))
        - (x(prv(i)) - x(i)) * (y(nxt(i)) - y(i))
    )
    kept = openr.select(
        "n_nationkey",
        F.filter(
            F.transform(
                F.sequence(F.lit(1), nn),
                lambda i: F.struct(
                    i.alias("i"),
                    F.concat(x(i).cast("string"), F.lit(" "), y(i).cast("string"))
                    .alias("v"),
                    (a2(i) >= _SIMPLIFY_T).alias("keep"),
                ),
            ),
            lambda s: s["keep"],
        ).alias("ks"),
    )
    return kept.where(F.size("ks") > 0).select(
        "n_nationkey",
        big(F.size("ks")).alias("n_kept"),
        F.concat(
            F.lit("POLYGON (("),
            F.array_join(F.transform("ks", lambda s: s["v"]), ", "),
            F.lit(", "),
            F.element_at("ks", 1)["v"],
            F.lit("))"),
        ).alias("wkt"),
    )


# --- GeoJSON parsing: the reference's actual input format ---------------------

_GEOJSON_SCHEMA = (
    "type string, properties struct<key: bigint, name: string>, "
    "geometry struct<type: string, coordinates: array<array<array<bigint>>>>"
)


@query(
    "geo_geojson_parse",
    oracle=f"""
    WITH gj AS ({fixtures.NATION_GEOJSON_SQL}),
    parsed AS (
        SELECT CAST(json_extract_string(geojson, '$.properties.key') AS BIGINT)
                   AS key,
               json_extract_string(geojson, '$.properties.name') AS name,
               json_extract_string(geojson, '$.geometry.type') AS gtype,
               CAST(json_extract(geojson, '$.geometry.coordinates[0]')
                    AS BIGINT[][]) AS ring
        FROM gj
    )
    SELECT key, name, gtype,
           CAST(len(ring) AS BIGINT) AS n_ring,
           list_aggregate(list_transform(ring[:len(ring)-1], p -> p[1]), 'min')
               AS minx,
           list_aggregate(list_transform(ring[:len(ring)-1], p -> p[2]), 'min')
               AS miny,
           list_aggregate(list_transform(ring[:len(ring)-1], p -> p[1]), 'max')
               AS maxx,
           list_aggregate(list_transform(ring[:len(ring)-1], p -> p[2]), 'max')
               AS maxy,
           'POLYGON ((' || array_to_string(
               list_transform(ring, p -> CAST(p[1] AS VARCHAR) || ' '
                                         || CAST(p[2] AS VARCHAR)), ', ')
                        || '))' AS wkt
    FROM parsed
    """,
)
def geo_geojson_parse(spark, sf_dir):
    """GeoJSON Feature ingestion — the format the reference's geo stage
    actually fetches: parse the Feature string with a typed ``from_json``
    (schema'd struct, not string surgery), surface the properties, ring
    length, exact bbox, and the ring converted to canonical WKT — the
    handoff into this module's WKT operators (centroid/containment/
    simplify). Map-only: the parse and every derivation ride the scan
    projection; at 100 TB this is the ingest projection of a shapes table,
    shuffled by nothing."""
    gj = fixtures.nation_geojson(spark, sf_dir)
    p = F.from_json("geojson", _GEOJSON_SCHEMA)
    ring = p["geometry"]["coordinates"][0]
    n_open = F.size(ring) - 1
    xs = F.transform(ring, lambda c: c[0])
    ys = F.transform(ring, lambda c: c[1])
    return gj.select(
        p["properties"]["key"].alias("key"),
        p["properties"]["name"].alias("name"),
        p["geometry"]["type"].alias("gtype"),
        big(F.size(ring)).alias("n_ring"),
        big(F.array_min(F.slice(xs, 1, n_open))).alias("minx"),
        big(F.array_min(F.slice(ys, 1, n_open))).alias("miny"),
        big(F.array_max(F.slice(xs, 1, n_open))).alias("maxx"),
        big(F.array_max(F.slice(ys, 1, n_open))).alias("maxy"),
        F.concat(
            F.lit("POLYGON (("),
            F.array_join(
                F.transform(
                    ring,
                    lambda c: F.concat(
                        c[0].cast("string"), F.lit(" "), c[1].cast("string")
                    ),
                ),
                ", ",
            ),
            F.lit("))"),
        ).alias("wkt"),
    )


# --- multi-ring containment: polygons with holes ------------------------------

# Census shapes carry interior rings (lakes, enclaves). The even-odd rule
# needs NO new machinery for them — the crossing count just folds over the
# edges of EVERY ring, and a point inside the outer ring but also inside a
# hole accumulates an even total (2 boundaries crossed) and is correctly
# outside. The plan is geo_point_in_polygon's unchanged: the polygon side
# carries its rings as a nested array<struct<xs,ys>> on the broadcast cell
# index (bbox from the OUTER ring — holes are interior by definition), the
# point side probes and folds map-side, zero shuffles.


def _rings_coords(df: DataFrame, wkt_col: str = "wkt") -> DataFrame:
    """Parse 'POLYGON ((outer), (hole), ...)' into
    ``rings: array<struct<xs: array<bigint>, ys: array<bigint>>>``."""
    body = F.regexp_replace(F.col(wkt_col), r"^POLYGON \(\(|\)\)$", "")
    ring_strs = F.split(body, r"\), \(")

    def ring(r):
        pts = F.split(r, ", ")
        return F.struct(
            F.transform(
                pts, lambda p: F.element_at(F.split(p, " "), 1).cast("long")
            ).alias("xs"),
            F.transform(
                pts, lambda p: F.element_at(F.split(p, " "), 2).cast("long")
            ).alias("ys"),
        )

    return df.withColumn("rings", F.transform(ring_strs, ring))


def _ray_cast_hits_rings(px, py) -> Column:
    """Total even-odd crossing count over ALL rings of the ``rings``
    column — the multi-ring generalization of ``_ray_cast_hits``."""

    def ring_hits(r):
        xs, ys = r["xs"], r["ys"]
        x = lambda i: F.element_at(xs, i)  # noqa: E731
        y = lambda i: F.element_at(ys, i)  # noqa: E731

        def edge(acc, i):
            dy = y(i + 1) - y(i)
            straddle = (y(i) > py) != (y(i + 1) > py)
            lhs = (px - x(i)) * dy - (x(i + 1) - x(i)) * (py - y(i))
            sgn = F.when(dy > 0, F.lit(1)).otherwise(F.lit(-1))
            return acc + F.when(straddle & (lhs * sgn < 0), 1).otherwise(0)

        return F.aggregate(
            F.sequence(F.lit(1), F.size(xs) - 1), F.lit(0).cast("long"), edge
        )

    return F.aggregate(
        F.col("rings"), F.lit(0).cast("long"), lambda acc, r: acc + ring_hits(r)
    )


_ORACLE_RINGS_HOLED = f"""
    poly AS ({fixtures.NATION_POLYGONS_HOLED_SQL}),
    rings AS (
        SELECT n_nationkey,
               list_transform(
                   string_split(regexp_replace(wkt, '^POLYGON \\(\\(|\\)\\)$', '', 'g'),
                                '), ('),
                   r -> struct_pack(
                       xs := list_transform(string_split(r, ', '),
                                            p -> CAST(string_split(p, ' ')[1] AS BIGINT)),
                       ys := list_transform(string_split(r, ', '),
                                            p -> CAST(string_split(p, ' ')[2] AS BIGINT))))
                   AS rs
        FROM poly
    )
"""

_RAY_CAST_RINGS_SQL = """
    list_sum(list_transform(rs, s ->
        list_sum(list_transform(range(1, len(s.xs)), i ->
            CASE WHEN ((s.ys[i] > py) != (s.ys[i+1] > py))
                  AND ((px - s.xs[i]) * (s.ys[i+1] - s.ys[i])
                       - (s.xs[i+1] - s.xs[i]) * (py - s.ys[i]))
                      * (CASE WHEN s.ys[i+1] > s.ys[i] THEN 1 ELSE -1 END) < 0
                 THEN 1 ELSE 0 END))))
"""


@query(
    "geo_point_in_polygon_holes",
    oracle=f"""
    WITH {_ORACLE_RINGS_HOLED},
    bbox AS (
        SELECT n_nationkey, rs,
               list_aggregate(rs[1].xs[:len(rs[1].xs)-1], 'min') // {_CELL} AS gx0,
               list_aggregate(rs[1].xs[:len(rs[1].xs)-1], 'max') // {_CELL} AS gx1,
               list_aggregate(rs[1].ys[:len(rs[1].ys)-1], 'min') // {_CELL} AS gy0,
               list_aggregate(rs[1].ys[:len(rs[1].ys)-1], 'max') // {_CELL} AS gy1
        FROM rings
    ),
    cellsx AS (SELECT *, unnest(range(gx0, gx1 + 1)) AS gx FROM bbox),
    cells AS (SELECT *, unnest(range(gy0, gy1 + 1)) AS gy FROM cellsx),
    {_PIP_PTS_SQL},
    cand AS (
        SELECT p.c_custkey, p.px, p.py, c.n_nationkey, c.rs
        FROM pts p JOIN cells c
          ON p.px // {_CELL} = c.gx AND p.py // {_CELL} = c.gy
    )
    SELECT c_custkey, px, py, n_nationkey
    FROM (SELECT c_custkey, px, py, n_nationkey,
                 {_RAY_CAST_RINGS_SQL} AS hits
          FROM cand)
    WHERE hits % 2 = 1
    """,
)
def geo_point_in_polygon_holes(spark, sf_dir):
    """Exact containment for polygons WITH INTERIOR RINGS (the holed
    fixture: star outer ring + a center hole): the even-odd crossing fold
    runs over every ring, so hole-interior points come out even and are
    excluded — no special-casing, no new plan shape (broadcast cell index
    from the outer-ring bbox, map-side nested fold, zero shuffles). The
    hole is load-bearing: tests pin that candidate points landing inside
    the hole exist and are rejected."""
    rings = _rings_coords(fixtures.nation_polygons_holed(spark, sf_dir))
    outer = F.element_at("rings", 1)
    n_open = F.size(outer["xs"]) - 1
    oxs = F.slice(outer["xs"], 1, n_open)
    oys = F.slice(outer["ys"], 1, n_open)
    bbox = rings.select(
        "n_nationkey",
        "rings",
        _gcell(F.array_min(oxs)).alias("gx0"),
        _gcell(F.array_max(oxs)).alias("gx1"),
        _gcell(F.array_min(oys)).alias("gy0"),
        _gcell(F.array_max(oys)).alias("gy1"),
    )
    cells = bbox.select(
        "n_nationkey",
        "rings",
        F.explode(F.sequence("gx0", "gx1")).alias("gx"),
        "gy0",
        "gy1",
    ).select(
        "n_nationkey", "rings", "gx",
        F.explode(F.sequence("gy0", "gy1")).alias("gy"),
    )
    pts = load(spark, sf_dir, "customer").select(
        "c_custkey",
        (20 + (F.col("c_custkey") * 7919) % 100).alias("px"),
        (20 + (F.col("c_custkey") * 104729) % 100).alias("py"),
    )
    cand = pts.join(
        F.broadcast(cells),
        (F.expr(f"px div {_CELL}") == F.col("gx"))
        & (F.expr(f"py div {_CELL}") == F.col("gy")),
    )
    return (
        cand.withColumn(
            "hits", _ray_cast_hits_rings(F.col("px"), F.col("py"))
        )
        .filter(F.col("hits") % 2 == 1)
        .select("c_custkey", "px", "py", "n_nationkey")
    )


# --- exact area of multi-ring polygons ----------------------------------------

# The area counterpart of the holes containment: a polygon's area is the
# outer ring's shoelace area minus its holes' (GeoJSON/OGC ring semantics:
# first ring outer, rest interior). Everything stays exact-integer (area×2),
# so the driver hash pins the arithmetic; orientation is normalized with
# abs() per ring, hole areas subtract. Map-only.


@query(
    "geo_area_holed",
    oracle=f"""
    WITH {_ORACLE_RINGS_HOLED},
    per_ring AS (
        SELECT n_nationkey,
               unnest(list_transform(range(1, len(rs) + 1), j -> struct_pack(
                   j := j,
                   a2 := abs(list_sum(list_transform(range(1, len(rs[j].xs)), i ->
                       rs[j].xs[i] * rs[j].ys[i+1] - rs[j].xs[i+1] * rs[j].ys[i])))
               ))) AS e
        FROM rings
    )
    SELECT n_nationkey,
           CAST(count(*) AS BIGINT) AS n_rings,
           CAST(max(CASE WHEN e.j = 1 THEN e.a2 ELSE 0 END) AS BIGINT) AS outer_a2,
           CAST(sum(CASE WHEN e.j > 1 THEN e.a2 ELSE 0 END) AS BIGINT) AS holes_a2,
           CAST(max(CASE WHEN e.j = 1 THEN e.a2 ELSE 0 END)
                - sum(CASE WHEN e.j > 1 THEN e.a2 ELSE 0 END) AS BIGINT) AS net_a2
    FROM per_ring GROUP BY n_nationkey
    """,
)
def geo_area_holed(spark, sf_dir):
    """Exact net area (×2) of multi-ring polygons: outer shoelace minus the
    interior rings' — ring count, outer, holes, and net emitted per key so
    the subtraction itself is auditable. Pure JVM array folds on the parsed
    ring arrays; at 100 TB this is a scan-projection column on a shapes
    table (no shuffle — the fixture's 25-row aggregate exists only because
    the oracle must unnest; the Spark side never explodes)."""
    rings = _rings_coords(fixtures.nation_polygons_holed(spark, sf_dir))

    def ring_a2(r):
        xs, ys = r["xs"], r["ys"]
        x = lambda i: F.element_at(xs, i)  # noqa: E731
        y = lambda i: F.element_at(ys, i)  # noqa: E731
        return F.abs(
            F.aggregate(
                F.sequence(F.lit(1), F.size(xs) - 1),
                F.lit(0).cast("long"),
                lambda acc, i: acc + x(i) * y(i + 1) - x(i + 1) * y(i),
            )
        )

    outer_a2 = ring_a2(F.element_at("rings", 1))
    holes_a2 = F.aggregate(
        F.slice("rings", 2, F.greatest(F.size("rings") - 1, F.lit(0))),
        F.lit(0).cast("long"),
        lambda acc, r: acc + ring_a2(r),
    )
    return rings.select(
        "n_nationkey",
        big(F.size("rings")).alias("n_rings"),
        big(outer_a2).alias("outer_a2"),
        big(holes_a2).alias("holes_a2"),
        big(outer_a2 - holes_a2).alias("net_a2"),
    )


# --- exact centroid of multi-ring polygons -------------------------------------

# Completes the holed family: the area centroid of (outer minus holes) in
# exact integer rationals. Each ring's shoelace pair (a2, cx_num, cy_num) is
# orientation-normalized by the sign of its own a2 (numerators and area flip
# sign together, so multiplying both by sign(a2) canonicalizes the ring to
# positive orientation); the region's numerators are then outer minus the
# holes' and the denominator is 3·(|a2_outer| − Σ|a2_hole|) — the standard
# signed decomposition, all in int64. A float consumer divides at the edge
# (cx = cx_num/den), per the geo_centroid_bbox contract.


@query(
    "geo_centroid_holed",
    oracle=f"""
    WITH {_ORACLE_RINGS_HOLED},
    per_ring AS (
        SELECT n_nationkey,
               unnest(list_transform(range(1, len(rs) + 1), j -> struct_pack(
                   j := j,
                   a2 := list_sum(list_transform(range(1, len(rs[j].xs)), i ->
                       rs[j].xs[i] * rs[j].ys[i+1] - rs[j].xs[i+1] * rs[j].ys[i])),
                   cx := list_sum(list_transform(range(1, len(rs[j].xs)), i ->
                       (rs[j].xs[i] + rs[j].xs[i+1]) *
                       (rs[j].xs[i] * rs[j].ys[i+1] - rs[j].xs[i+1] * rs[j].ys[i]))),
                   cy := list_sum(list_transform(range(1, len(rs[j].xs)), i ->
                       (rs[j].ys[i] + rs[j].ys[i+1]) *
                       (rs[j].xs[i] * rs[j].ys[i+1] - rs[j].xs[i+1] * rs[j].ys[i])))
               ))) AS e
        FROM rings
    ),
    norm AS (
        SELECT n_nationkey, e.j AS j,
               abs(e.a2) AS a2,
               CASE WHEN e.a2 < 0 THEN -e.cx ELSE e.cx END AS cx,
               CASE WHEN e.a2 < 0 THEN -e.cy ELSE e.cy END AS cy
        FROM per_ring
    )
    SELECT n_nationkey,
           CAST(sum(CASE WHEN j = 1 THEN cx ELSE -cx END) AS BIGINT) AS cx_num,
           CAST(sum(CASE WHEN j = 1 THEN cy ELSE -cy END) AS BIGINT) AS cy_num,
           CAST(3 * sum(CASE WHEN j = 1 THEN a2 ELSE -a2 END) AS BIGINT) AS den
    FROM norm GROUP BY n_nationkey
    """,
)
def geo_centroid_holed(spark, sf_dir):
    """Exact rational centroid of the holed polygons: per-ring shoelace
    numerators orientation-normalized, outer minus holes, denominator
    3·net_a2 — integers end to end, map-only (the Spark side folds the
    nested ring arrays in the scan projection; no explosion, no shuffle)."""
    rings = _rings_coords(fixtures.nation_polygons_holed(spark, sf_dir))

    def ring_terms(r):
        xs, ys = r["xs"], r["ys"]
        x = lambda i: F.element_at(xs, i)  # noqa: E731
        y = lambda i: F.element_at(ys, i)  # noqa: E731
        cross = lambda i: x(i) * y(i + 1) - x(i + 1) * y(i)  # noqa: E731

        def fold(term):
            return F.aggregate(
                F.sequence(F.lit(1), F.size(xs) - 1),
                F.lit(0).cast("long"),
                lambda acc, i: acc + term(i),
            )

        a2 = fold(cross)
        cx = fold(lambda i: (x(i) + x(i + 1)) * cross(i))
        cy = fold(lambda i: (y(i) + y(i + 1)) * cross(i))
        sgn = F.when(a2 < 0, F.lit(-1)).otherwise(F.lit(1))
        return F.struct(
            (a2 * sgn).alias("a2"), (cx * sgn).alias("cx"), (cy * sgn).alias("cy")
        )

    outer = ring_terms(F.element_at("rings", 1))
    holes = F.aggregate(
        F.slice("rings", 2, F.greatest(F.size("rings") - 1, F.lit(0))),
        F.struct(
            F.lit(0).cast("long").alias("a2"),
            F.lit(0).cast("long").alias("cx"),
            F.lit(0).cast("long").alias("cy"),
        ),
        lambda acc, r: F.struct(
            (acc["a2"] + ring_terms(r)["a2"]).alias("a2"),
            (acc["cx"] + ring_terms(r)["cx"]).alias("cx"),
            (acc["cy"] + ring_terms(r)["cy"]).alias("cy"),
        ),
    )
    return rings.select(
        "n_nationkey",
        big(outer["cx"] - holes["cx"]).alias("cx_num"),
        big(outer["cy"] - holes["cy"]).alias("cy_num"),
        big(3 * (outer["a2"] - holes["a2"])).alias("den"),
    )


# --- MULTIPOLYGON parsing: the island case -------------------------------------

# Census geographies are MULTIPOLYGONs (mainland + islands) — the last WKT
# grammar level this module needed. Parse 'MULTIPOLYGON (((p1)), ((p2)))'
# into per-part coordinate arrays and derive the summary a shapes catalog
# stores: part count, exact total and largest-part areas (×2), and the
# union bbox. Map-only JVM folds, the standing geometry contract.


def _parts_coords(df: DataFrame, wkt_col: str = "wkt") -> DataFrame:
    """Parse single-ring MULTIPOLYGON WKT into
    ``parts: array<struct<xs: array<bigint>, ys: array<bigint>>>``."""
    body = F.regexp_replace(
        F.col(wkt_col), r"^MULTIPOLYGON \(\(\(|\)\)\)$", ""
    )
    part_strs = F.split(body, r"\)\), \(\(")

    def part(r):
        pts = F.split(r, ", ")
        return F.struct(
            F.transform(
                pts, lambda p: F.element_at(F.split(p, " "), 1).cast("long")
            ).alias("xs"),
            F.transform(
                pts, lambda p: F.element_at(F.split(p, " "), 2).cast("long")
            ).alias("ys"),
        )

    return df.withColumn("parts", F.transform(part_strs, part))


@query(
    "geo_multipolygon_parts",
    oracle=f"""
    WITH poly AS ({fixtures.NATION_MULTIPOLYGONS_SQL}),
    parts AS (
        SELECT n_nationkey,
               list_transform(
                   string_split(
                       regexp_replace(wkt, '^MULTIPOLYGON \\(\\(\\(|\\)\\)\\)$',
                                      '', 'g'),
                       ')), (('),
                   r -> struct_pack(
                       xs := list_transform(string_split(r, ', '),
                                            p -> CAST(string_split(p, ' ')[1] AS BIGINT)),
                       ys := list_transform(string_split(r, ', '),
                                            p -> CAST(string_split(p, ' ')[2] AS BIGINT))))
                   AS ps
        FROM poly
    ),
    per_part AS (
        SELECT n_nationkey,
               unnest(list_transform(ps, s -> struct_pack(
                   a2 := abs(list_sum(list_transform(range(1, len(s.xs)), i ->
                       s.xs[i] * s.ys[i+1] - s.xs[i+1] * s.ys[i]))),
                   minx := list_aggregate(s.xs, 'min'),
                   miny := list_aggregate(s.ys, 'min'),
                   maxx := list_aggregate(s.xs, 'max'),
                   maxy := list_aggregate(s.ys, 'max')))) AS e
        FROM parts
    )
    SELECT n_nationkey,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(e.a2) AS BIGINT) AS total_a2,
           CAST(max(e.a2) AS BIGINT) AS main_a2,
           CAST(min(e.minx) AS BIGINT) AS minx,
           CAST(min(e.miny) AS BIGINT) AS miny,
           CAST(max(e.maxx) AS BIGINT) AS maxx,
           CAST(max(e.maxy) AS BIGINT) AS maxy
    FROM per_part GROUP BY n_nationkey
    """,
)
def geo_multipolygon_parts(spark, sf_dir):
    """MULTIPOLYGON catalog summary: part count, exact total/largest part
    areas (×2), union bbox — per key, from one WKT parse. The Spark side
    never explodes parts (nested array folds in the scan projection; the
    oracle unnests because SQL must). Even-keyed fixture nations carry an
    island part, odd-keyed are single-part, so both parser branches decide
    real rows."""
    parts = _parts_coords(fixtures.nation_multipolygons(spark, sf_dir))

    def part_a2(s):
        xs, ys = s["xs"], s["ys"]
        x = lambda i: F.element_at(xs, i)  # noqa: E731
        y = lambda i: F.element_at(ys, i)  # noqa: E731
        return F.abs(
            F.aggregate(
                F.sequence(F.lit(1), F.size(xs) - 1),
                F.lit(0).cast("long"),
                lambda acc, i: acc + x(i) * y(i + 1) - x(i + 1) * y(i),
            )
        )

    a2s = F.transform("parts", part_a2)
    return parts.select(
        "n_nationkey",
        big(F.size("parts")).alias("n_parts"),
        big(
            F.aggregate(a2s, F.lit(0).cast("long"), lambda a, x: a + x)
        ).alias("total_a2"),
        big(F.array_max(a2s)).alias("main_a2"),
        big(
            F.array_min(F.flatten(F.transform("parts", lambda s: s["xs"])))
        ).alias("minx"),
        big(
            F.array_min(F.flatten(F.transform("parts", lambda s: s["ys"])))
        ).alias("miny"),
        big(
            F.array_max(F.flatten(F.transform("parts", lambda s: s["xs"])))
        ).alias("maxx"),
        big(
            F.array_max(F.flatten(F.transform("parts", lambda s: s["ys"])))
        ).alias("maxy"),
    )


# --- containment in a MULTIPOLYGON ---------------------------------------------

# Completes the containment matrix (single ring, holes, multi-part): a point
# is inside a multipolygon of disjoint parts iff the even-odd crossing total
# over ALL part rings is odd — the same nested fold as the holes case (there
# the second ring subtracts, here it adds; parity handles both without
# caring which). Plan identical to the other containment ops: cell index
# from the UNION bbox (covers every part), broadcast with the nested part
# arrays, map-side fold, zero shuffles.


@query(
    "geo_point_in_multipolygon",
    oracle=f"""
    WITH poly AS ({fixtures.NATION_MULTIPOLYGONS_SQL}),
    rings AS (
        SELECT n_nationkey,
               list_transform(
                   string_split(
                       regexp_replace(wkt, '^MULTIPOLYGON \\(\\(\\(|\\)\\)\\)$',
                                      '', 'g'),
                       ')), (('),
                   r -> struct_pack(
                       xs := list_transform(string_split(r, ', '),
                                            p -> CAST(string_split(p, ' ')[1] AS BIGINT)),
                       ys := list_transform(string_split(r, ', '),
                                            p -> CAST(string_split(p, ' ')[2] AS BIGINT))))
                   AS rs
        FROM poly
    ),
    bbox AS (
        SELECT n_nationkey, rs,
               list_aggregate(flatten(list_transform(rs, s -> s.xs)), 'min')
                   // {_CELL} AS gx0,
               list_aggregate(flatten(list_transform(rs, s -> s.xs)), 'max')
                   // {_CELL} AS gx1,
               list_aggregate(flatten(list_transform(rs, s -> s.ys)), 'min')
                   // {_CELL} AS gy0,
               list_aggregate(flatten(list_transform(rs, s -> s.ys)), 'max')
                   // {_CELL} AS gy1
        FROM rings
    ),
    cellsx AS (SELECT *, unnest(range(gx0, gx1 + 1)) AS gx FROM bbox),
    cells AS (SELECT *, unnest(range(gy0, gy1 + 1)) AS gy FROM cellsx),
    {_PIP_PTS_SQL},
    cand AS (
        SELECT p.c_custkey, p.px, p.py, c.n_nationkey, c.rs
        FROM pts p JOIN cells c
          ON p.px // {_CELL} = c.gx AND p.py // {_CELL} = c.gy
    )
    SELECT c_custkey, px, py, n_nationkey
    FROM (SELECT c_custkey, px, py, n_nationkey,
                 {_RAY_CAST_RINGS_SQL} AS hits
          FROM cand)
    WHERE hits % 2 = 1
    """,
)
def geo_point_in_multipolygon(spark, sf_dir):
    """Exact containment in a multi-part geography (mainland OR island):
    the even-odd fold over every part's ring — the holes machinery verbatim
    (parity is indifferent to whether extra rings subtract or add). Island
    hits are load-bearing: the fixture's planted 3×3 islands catch points
    the star never could (tests pin island-interior emissions exist)."""
    parts = _parts_coords(fixtures.nation_multipolygons(spark, sf_dir))
    rings = parts.withColumnRenamed("parts", "rings")
    all_xs = F.flatten(F.transform("rings", lambda s: s["xs"]))
    all_ys = F.flatten(F.transform("rings", lambda s: s["ys"]))
    bbox = rings.select(
        "n_nationkey",
        "rings",
        _gcell(F.array_min(all_xs)).alias("gx0"),
        _gcell(F.array_max(all_xs)).alias("gx1"),
        _gcell(F.array_min(all_ys)).alias("gy0"),
        _gcell(F.array_max(all_ys)).alias("gy1"),
    )
    cells = bbox.select(
        "n_nationkey",
        "rings",
        F.explode(F.sequence("gx0", "gx1")).alias("gx"),
        "gy0",
        "gy1",
    ).select(
        "n_nationkey", "rings", "gx",
        F.explode(F.sequence("gy0", "gy1")).alias("gy"),
    )
    pts = load(spark, sf_dir, "customer").select(
        "c_custkey",
        (20 + (F.col("c_custkey") * 7919) % 100).alias("px"),
        (20 + (F.col("c_custkey") * 104729) % 100).alias("py"),
    )
    cand = pts.join(
        F.broadcast(cells),
        (F.expr(f"px div {_CELL}") == F.col("gx"))
        & (F.expr(f"py div {_CELL}") == F.col("gy")),
    )
    return (
        cand.withColumn(
            "hits", _ray_cast_hits_rings(F.col("px"), F.col("py"))
        )
        .filter(F.col("hits") % 2 == 1)
        .select("c_custkey", "px", "py", "n_nationkey")
    )


# --- search-index capstone: geometry feeding the reference's R9 surface -------
#
# The reference's search-index build derives each place's LABEL POINT from
# its (simplified) polygon and its parent label from the geography that
# CONTAINS it — i.e. the geometry slice above exists to feed this exact
# record shape. This capstone composes the three driver-verified pieces:
# pipeline_search_index's autocomplete columns, geo_point_in_polygon's
# containment assignment, and the exact rational centroid (the label
# point), into one hash-checked query — closing the loop from "geometry ops
# exist" to "the search-index shape uses them" (r13 VERDICT item 5).


@query(
    "geo_search_index",
    oracle=f"""
    WITH {_ORACLE_RING_IRREGULAR},
    bbox AS (
        SELECT n_nationkey, xs, ys,
               list_aggregate(xs[:len(xs)-1], 'min') // {_CELL} AS gx0,
               list_aggregate(xs[:len(xs)-1], 'max') // {_CELL} AS gx1,
               list_aggregate(ys[:len(ys)-1], 'min') // {_CELL} AS gy0,
               list_aggregate(ys[:len(ys)-1], 'max') // {_CELL} AS gy1
        FROM ring
    ),
    cellsx AS (SELECT *, unnest(range(gx0, gx1 + 1)) AS gx FROM bbox),
    cells AS (SELECT *, unnest(range(gy0, gy1 + 1)) AS gy FROM cellsx),
    pts AS (
        SELECT c_custkey, c_name,
               20 + (c_custkey * 7919) % 100 AS px,
               20 + (c_custkey * 104729) % 100 AS py
        FROM customer
    ),
    cand AS (
        SELECT p.c_custkey, p.c_name, p.px, p.py, c.n_nationkey, c.xs, c.ys
        FROM pts p JOIN cells c
          ON p.px // {_CELL} = c.gx AND p.py // {_CELL} = c.gy
    ),
    pip AS (
        SELECT c_custkey, c_name, px, py, n_nationkey
        FROM (SELECT c_custkey, c_name, px, py, n_nationkey,
                     {_RAY_CAST_SQL} AS hits
              FROM cand)
        WHERE hits % 2 = 1
    ),
    cent AS (
        SELECT n_nationkey,
               CASE WHEN a2 < 0 THEN -cx ELSE cx END AS lx_num,
               CASE WHEN a2 < 0 THEN -cy ELSE cy END AS ly_num,
               3 * abs(a2) AS den
        FROM (
            SELECT n_nationkey,
                   list_sum(list_transform(range(1, len(xs)), i ->
                       xs[i] * ys[i+1] - xs[i+1] * ys[i])) AS a2,
                   list_sum(list_transform(range(1, len(xs)), i ->
                       (xs[i] + xs[i+1])
                       * (xs[i] * ys[i+1] - xs[i+1] * ys[i]))) AS cx,
                   list_sum(list_transform(range(1, len(xs)), i ->
                       (ys[i] + ys[i+1])
                       * (xs[i] * ys[i+1] - xs[i+1] * ys[i]))) AS cy
            FROM ring
        )
    ),
    lab AS (
        SELECT n_nationkey, n_name, r_name
        FROM nation JOIN region ON n_regionkey = r_regionkey
    )
    SELECT lpad(CAST(p.c_custkey AS VARCHAR), 9, '0') AS geoid,
           p.c_name AS name,
           concat_ws(', ', l.n_name, l.r_name) AS parent,
           p.n_nationkey,
           p.px, p.py,
           CAST(c.lx_num AS BIGINT) AS lx_num,
           CAST(c.ly_num AS BIGINT) AS ly_num,
           CAST(c.den AS BIGINT) AS den,
           count(o.o_orderkey) AS activity
    FROM pip p
    JOIN lab l USING (n_nationkey)
    JOIN cent c USING (n_nationkey)
    LEFT JOIN orders o ON o.o_custkey = p.c_custkey
    GROUP BY p.c_custkey, p.c_name, l.n_name, l.r_name, p.n_nationkey,
             p.px, p.py, c.lx_num, c.ly_num, c.den
    """,
)
def geo_search_index(spark, sf_dir):
    """Search-index records with geometry: one autocomplete row per
    (place, CONTAINING polygon) — zero-padded GEOID, display name, the
    containing geography's 'parent, grandparent' label, the place's point,
    the containing polygon's exact rational label point (shoelace centroid,
    orientation-normalized integer numerators over den = 3·|2A|), and an
    activity weight (order count). A place inside two overlapping stars
    legitimately yields two records — containment, not c_nationkey,
    assigns the parent.

    Scale shape: geometry adds ZERO exchanges to pipeline_search_index's
    own — the cell index, ring centroids, and name labels are all
    nation-sized broadcasts probed map-side from the customer scan; the
    only shuffles are the orders join + final aggregation the activity
    column inherently costs. Plan pinned by tests/test_plans.py."""
    pts = load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        (20 + (F.col("c_custkey") * 7919) % 100).alias("px"),
        (20 + (F.col("c_custkey") * 104729) % 100).alias("py"),
    )
    pip = _pip_pairs(spark, sf_dir, pts)

    ring = _ring_coords(fixtures.nation_polygons_irregular(spark, sf_dir))
    x = lambda i: F.element_at("xs", i)  # noqa: E731
    y = lambda i: F.element_at("ys", i)  # noqa: E731
    cross = lambda i: x(i) * y(i + 1) - x(i + 1) * y(i)  # noqa: E731

    def fold(term):
        return F.aggregate(
            F.sequence(F.lit(1), F.size("xs") - 1),
            F.lit(0).cast("long"),
            lambda acc, i: acc + term(i),
        )

    a2 = fold(cross)
    cx = fold(lambda i: (x(i) + x(i + 1)) * cross(i))
    cy = fold(lambda i: (y(i) + y(i + 1)) * cross(i))
    sgn = F.when(a2 < 0, F.lit(-1)).otherwise(F.lit(1))
    cent = ring.select(
        F.col("n_nationkey").alias("cn"),
        big(cx * sgn).alias("lx_num"),
        big(cy * sgn).alias("ly_num"),
        big(3 * F.abs(a2)).alias("den"),
    )

    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    lab = nation.join(
        region, nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name", "r_name")

    orders = load(spark, sf_dir, "orders")
    enriched = pip.join(
        F.broadcast(lab.withColumnRenamed("n_nationkey", "ln")),
        F.col("n_nationkey") == F.col("ln"),
    ).join(F.broadcast(cent), F.col("n_nationkey") == F.col("cn"))
    return (
        enriched.join(orders, orders.o_custkey == enriched.c_custkey, "left")
        .groupBy(
            F.lpad(F.col("c_custkey").cast("string"), 9, "0").alias("geoid"),
            F.col("c_name").alias("name"),
            F.concat_ws(", ", "n_name", "r_name").alias("parent"),
            "n_nationkey",
            "px",
            "py",
            "lx_num",
            "ly_num",
            "den",
        )
        .agg(big(F.count("o_orderkey")).alias("activity"))
    )


# --- bbox-overlap spatial join: the shape-vs-shape axis ------------------------
#
# Everything above assigns POINTS to shapes; a tile/crosswalk build also
# needs shape-vs-shape overlap (which 2000 geography intersects which 2010
# geography). The distributed-textbook plan (PBSM / partition-based spatial
# merge, public): bucket each bbox to every grid cell it covers, generate
# candidate pairs within each cell, and avoid the global DISTINCT a
# multi-cell pair would otherwise need with the REFERENCE-POINT rule — a
# pair is reported only by the single cell containing the overlap region's
# min corner. At 100 TB that turns dedup into a per-row predicate (zero
# extra exchange); here the cell index is nation-sized so the whole join is
# one broadcast probe.


@query(
    "geo_bbox_overlap_pairs",
    oracle=f"""
    WITH {_ORACLE_RING_IRREGULAR},
    box AS (
        SELECT n_nationkey,
               list_aggregate(xs[:len(xs)-1], 'min') AS minx,
               list_aggregate(xs[:len(xs)-1], 'max') AS maxx,
               list_aggregate(ys[:len(ys)-1], 'min') AS miny,
               list_aggregate(ys[:len(ys)-1], 'max') AS maxy
        FROM ring
    )
    SELECT a, b, ox0, oy0, ox1, oy1,
           CAST((ox1 - ox0) * (oy1 - oy0) AS BIGINT) AS overlap_area
    FROM (
        SELECT a.n_nationkey AS a, b.n_nationkey AS b,
               CAST(greatest(a.minx, b.minx) AS BIGINT) AS ox0,
               CAST(greatest(a.miny, b.miny) AS BIGINT) AS oy0,
               CAST(least(a.maxx, b.maxx) AS BIGINT) AS ox1,
               CAST(least(a.maxy, b.maxy) AS BIGINT) AS oy1
        FROM box a JOIN box b
          ON a.n_nationkey < b.n_nationkey
         AND a.minx <= b.maxx AND b.minx <= a.maxx
         AND a.miny <= b.maxy AND b.miny <= a.maxy
    )
    """,
)
def geo_bbox_overlap_pairs(spark, sf_dir):
    """Bbox-overlap self-join over the irregular fixture (adjacent stars
    overlap by construction: max radius ~13.4 vs 20-unit center spacing):
    every (a < b) pair whose boxes intersect, with the exact overlap box
    and its area (0 for edge-touching). The ORACLE is the direct O(n²)
    pairwise join — trivially right at 25 shapes; the SPARK side runs the
    PBSM plan (grid-cell bucketing, per-cell candidates, reference-point
    dedup, exact post-filter) so the driver hash pins that the scalable
    plan reproduces the naive semantics EXACTLY — duplicate-free via the
    predicate, not via a distinct."""
    ring = _ring_coords(fixtures.nation_polygons_irregular(spark, sf_dir))
    n_open = F.size("xs") - 1
    box = ring.select(
        "n_nationkey",
        big(F.array_min(F.slice("xs", 1, n_open))).alias("minx"),
        big(F.array_max(F.slice("xs", 1, n_open))).alias("maxx"),
        big(F.array_min(F.slice("ys", 1, n_open))).alias("miny"),
        big(F.array_max(F.slice("ys", 1, n_open))).alias("maxy"),
    )

    def cells(side: str) -> DataFrame:
        renamed = box.select(
            F.col("n_nationkey").alias(f"{side}k"),
            F.col("minx").alias(f"{side}minx"),
            F.col("maxx").alias(f"{side}maxx"),
            F.col("miny").alias(f"{side}miny"),
            F.col("maxy").alias(f"{side}maxy"),
        )
        return renamed.select(
            "*",
            F.explode(
                F.sequence(
                    _gcell(F.col(f"{side}minx")), _gcell(F.col(f"{side}maxx"))
                )
            ).alias(f"{side}gx"),
        ).select(
            "*",
            F.explode(
                F.sequence(
                    _gcell(F.col(f"{side}miny")), _gcell(F.col(f"{side}maxy"))
                )
            ).alias(f"{side}gy"),
        )

    a, b = cells("a"), cells("b")
    ox0 = F.greatest("aminx", "bminx")
    oy0 = F.greatest("aminy", "bminy")
    ox1 = F.least("amaxx", "bmaxx")
    oy1 = F.least("amaxy", "bmaxy")
    return (
        a.join(
            F.broadcast(b),
            (F.col("agx") == F.col("bgx"))
            & (F.col("agy") == F.col("bgy"))
            & (F.col("ak") < F.col("bk")),
        )
        # exact bbox intersection (the cell match is only a candidate gate)
        .filter((ox0 <= ox1) & (oy0 <= oy1))
        # reference-point rule: report the pair ONLY in the cell holding the
        # overlap box's min corner — exactly-once without a distinct
        .filter((_gcell(ox0) == F.col("agx")) & (_gcell(oy0) == F.col("agy")))
        .select(
            F.col("ak").alias("a"),
            F.col("bk").alias("b"),
            ox0.alias("ox0"),
            oy0.alias("oy0"),
            ox1.alias("ox1"),
            oy1.alias("oy1"),
            big((ox1 - ox0) * (oy1 - oy0)).alias("overlap_area"),
        )
    )


# --- tile cover: the reference's tiling stage as arithmetic --------------------

# The reference's terminal sink is vector TILES (tippecanoe/tile-join over
# z/x/y pyramids). The data-side computation underneath is "which tiles does
# this shape land in per zoom level" — pure integer arithmetic on the bbox
# once the world is a power-of-two square. World here: [0, 128)² (the
# fixture lattice spans [18, 123]); tile size at zoom z is 128 >> z.

_TILE_WORLD = 128
_TILE_ZOOMS = 3  # z = 0, 1, 2 -> tile sizes 128, 64, 32


@query(
    "geo_tile_cover",
    oracle=f"""
    WITH {_ORACLE_RING_IRREGULAR},
    box AS (
        SELECT n_nationkey,
               list_aggregate(xs[:len(xs)-1], 'min') AS minx,
               list_aggregate(xs[:len(xs)-1], 'max') AS maxx,
               list_aggregate(ys[:len(ys)-1], 'min') AS miny,
               list_aggregate(ys[:len(ys)-1], 'max') AS maxy
        FROM ring
    ),
    zoomed AS (
        SELECT n_nationkey, minx, maxx, miny, maxy,
               unnest(range(0, {_TILE_ZOOMS})) AS zoom
        FROM box
    ),
    sized AS (
        SELECT *, {_TILE_WORLD} // (1 << zoom) AS t FROM zoomed
    ),
    tx AS (
        SELECT n_nationkey, zoom, t, miny, maxy,
               unnest(range(minx // t, maxx // t + 1)) AS tile_x
        FROM sized
    )
    SELECT n_nationkey, CAST(zoom AS BIGINT) AS zoom,
           CAST(tile_x AS BIGINT) AS tile_x,
           CAST(unnest(range(miny // t, maxy // t + 1)) AS BIGINT) AS tile_y
    FROM tx
    """,
)
def geo_tile_cover(spark, sf_dir):
    """Tile-pyramid cover per shape: for each zoom level (tile size =
    world >> z), every (tile_x, tile_y) the shape's bbox touches — the
    data half of the reference's tile build (tippecanoe assigns features
    to z/x/y exactly this way before encoding). Map-only: the bbox comes
    from the ring fold inside the scan projection and the per-zoom tile
    ranges explode from pure integer arithmetic; at 100 TB of shapes this
    is a scan rider whose output is the shuffle KEY for the per-tile
    encode that follows (group by (zoom, tile_x, tile_y))."""
    ring = _ring_coords(fixtures.nation_polygons_irregular(spark, sf_dir))
    n_open = F.size("xs") - 1
    box = ring.select(
        "n_nationkey",
        F.array_min(F.slice("xs", 1, n_open)).alias("minx"),
        F.array_max(F.slice("xs", 1, n_open)).alias("maxx"),
        F.array_min(F.slice("ys", 1, n_open)).alias("miny"),
        F.array_max(F.slice("ys", 1, n_open)).alias("maxy"),
    )
    tdiv = lambda c, t: F.call_function("div", c, t)  # noqa: E731
    zoomed = box.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(_TILE_ZOOMS - 1))).alias("zoom")
    ).withColumn("t", F.expr(f"shiftright({_TILE_WORLD}, zoom)").cast("long"))
    t = F.col("t")
    return (
        zoomed.select(
            "n_nationkey",
            "zoom",
            "t",
            "miny",
            "maxy",
            F.explode(
                F.sequence(tdiv(F.col("minx"), t), tdiv(F.col("maxx"), t))
            ).alias("tile_x"),
        )
        .select(
            "n_nationkey",
            big(F.col("zoom")).alias("zoom"),
            big(F.col("tile_x")).alias("tile_x"),
            F.explode(
                F.sequence(tdiv(F.col("miny"), t), tdiv(F.col("maxy"), t))
            ).alias("tile_y"),
        )
        .select("n_nationkey", "zoom", "tile_x", big(F.col("tile_y")).alias("tile_y"))
    )


# --- crosswalk apportionment: the reference's vintage-change weight table ------
#
# The reference's crosswalk apportions 2000-vintage geography values onto
# 2010 geographies by overlap weight. The two WKT fixtures model exactly
# that misalignment: the octagon vintage is planted at lattice +10 and the
# star vintage at +30, so every star straddles up to four octagons. The
# weight table is the bbox-overlap join between the vintages (the PBSM
# cells + reference-point plan again — cross-frame this time), the weights
# are exact integer overlap areas, and the apportionment is emitted as the
# exact rational alloc_num/den (§2.0 rule 1: no float crosses the engine).


@query(
    "geo_crosswalk_alloc",
    oracle=f"""
    WITH {_ORACLE_RING_IRREGULAR},
    abox AS (
        SELECT n_nationkey AS a,
               list_aggregate(xs[:len(xs)-1], 'min') AS minx,
               list_aggregate(xs[:len(xs)-1], 'max') AS maxx,
               list_aggregate(ys[:len(ys)-1], 'min') AS miny,
               list_aggregate(ys[:len(ys)-1], 'max') AS maxy
        FROM ring
    ),
    bpoly AS ({fixtures.NATION_POLYGONS_SQL}),
    bring AS (
        SELECT n_nationkey,
               list_transform(
                   string_split(replace(replace(wkt, 'POLYGON ((', ''), '))', ''), ', '),
                   p -> CAST(string_split(p, ' ')[1] AS BIGINT)) AS xs,
               list_transform(
                   string_split(replace(replace(wkt, 'POLYGON ((', ''), '))', ''), ', '),
                   p -> CAST(string_split(p, ' ')[2] AS BIGINT)) AS ys
        FROM bpoly
    ),
    bbox2 AS (
        SELECT n_nationkey AS b,
               list_aggregate(xs[:len(xs)-1], 'min') AS minx,
               list_aggregate(xs[:len(xs)-1], 'max') AS maxx,
               list_aggregate(ys[:len(ys)-1], 'min') AS miny,
               list_aggregate(ys[:len(ys)-1], 'max') AS maxy
        FROM bring
    ),
    w AS (
        SELECT a, b,
               (least(x.maxx, y.maxx) - greatest(x.minx, y.minx))
               * (least(x.maxy, y.maxy) - greatest(x.miny, y.miny)) AS w
        FROM abox x JOIN bbox2 y
          ON least(x.maxx, y.maxx) > greatest(x.minx, y.minx)
         AND least(x.maxy, y.maxy) > greatest(x.miny, y.miny)
    ),
    src AS (
        SELECT c_nationkey AS a, count(*) AS src_value
        FROM customer GROUP BY c_nationkey
    )
    SELECT w.a, w.b,
           CAST(w.w AS BIGINT) AS w,
           CAST(sum(w.w) OVER (PARTITION BY w.a) AS BIGINT) AS den,
           CAST(coalesce(src.src_value, 0) AS BIGINT) AS src_value,
           CAST(coalesce(src.src_value, 0) * w.w AS BIGINT) AS alloc_num
    FROM w LEFT JOIN src ON src.a = w.a
    """,
)
def geo_crosswalk_alloc(spark, sf_dir):
    """Vintage-crosswalk weight table + apportionment: for every (source
    star geography a, target octagon geography b) with strictly positive
    bbox overlap, the integer overlap-area weight ``w``, the source's total
    outgoing weight ``den``, the source measure (customer count keyed by
    c_nationkey), and the exact rational allocation numerator
    ``alloc_num = src_value · w`` (consumer divides by ``den`` at the
    edge; Σ_b alloc_num/den = src_value exactly). The overlap join runs
    the PBSM cells + reference-point plan cross-frame — at 100 TB of
    shapes, candidates shuffle on cell and dedup stays a predicate; here
    both vintages are nation-sized broadcasts, and the only exchange is
    the source-measure aggregation."""
    ring_a = _ring_coords(fixtures.nation_polygons_irregular(spark, sf_dir))
    ring_b = _ring_coords(fixtures.nation_polygons(spark, sf_dir))

    def boxed(ring: DataFrame, key: str) -> DataFrame:
        n_open = F.size("xs") - 1
        return ring.select(
            F.col("n_nationkey").alias(key),
            big(F.array_min(F.slice("xs", 1, n_open))).alias(f"{key}minx"),
            big(F.array_max(F.slice("xs", 1, n_open))).alias(f"{key}maxx"),
            big(F.array_min(F.slice("ys", 1, n_open))).alias(f"{key}miny"),
            big(F.array_max(F.slice("ys", 1, n_open))).alias(f"{key}maxy"),
        )

    def with_cells(box: DataFrame, key: str) -> DataFrame:
        return box.select(
            "*",
            F.explode(
                F.sequence(_gcell(F.col(f"{key}minx")), _gcell(F.col(f"{key}maxx")))
            ).alias(f"{key}gx"),
        ).select(
            "*",
            F.explode(
                F.sequence(_gcell(F.col(f"{key}miny")), _gcell(F.col(f"{key}maxy")))
            ).alias(f"{key}gy"),
        )

    a = with_cells(boxed(ring_a, "a"), "a")
    b = with_cells(boxed(ring_b, "b"), "b")
    ox0 = F.greatest("aminx", "bminx")
    oy0 = F.greatest("aminy", "bminy")
    ox1 = F.least("amaxx", "bmaxx")
    oy1 = F.least("amaxy", "bmaxy")
    w = (
        a.join(
            F.broadcast(b),
            (F.col("agx") == F.col("bgx")) & (F.col("agy") == F.col("bgy")),
        )
        .filter((ox0 < ox1) & (oy0 < oy1))  # strictly positive overlap
        .filter((_gcell(ox0) == F.col("agx")) & (_gcell(oy0) == F.col("agy")))
        .select(
            "a", "b", big((ox1 - ox0) * (oy1 - oy0)).alias("w")
        )
    )
    from pyspark.sql import Window

    den = F.sum("w").over(Window.partitionBy("a"))
    src = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("sa"))
        .agg(F.count(F.lit(1)).alias("src_value"))
    )
    return (
        w.withColumn("den", big(den))
        .join(F.broadcast(src), F.col("a") == F.col("sa"), "left")
        .select(
            "a",
            "b",
            "w",
            "den",
            big(F.coalesce("src_value", F.lit(0))).alias("src_value"),
            big(F.coalesce("src_value", F.lit(0)) * F.col("w")).alias("alloc_num"),
        )
    )


# --- tile-join capstone: pyramid assignment × wide attribute build -------------
#
# The reference's terminal tile build is `tile-join`: per-geography wide
# attribute records (the R6 CSV) merged onto the z/x/y features tippecanoe
# emitted. This is that flow as ONE plan: geo_tile_cover's pyramid
# assignment (which tiles does each geography touch, per zoom) joined to
# the wide per-geography attribute table at nation grain. Mirrors what
# geo_search_index does for the R9 flow: geometry rides the attribute
# build's existing exchanges, adding none of its own.

_TILE_YEARS = [1995, 1996, 1997, 1998]
_TILE_WIDE_ORACLE_COLS = ",\n           ".join(
    f"CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,6))) "
    f"FILTER (WHERE year(o_orderdate) = {y}), 0) AS DOUBLE) AS e_{y - 1900}, "
    f"count(*) FILTER (WHERE year(o_orderdate) = {y}) AS n_{y - 1900}"
    for y in _TILE_YEARS
)


@query(
    "geo_tile_join",
    oracle=f"""
    WITH {_ORACLE_RING_IRREGULAR},
    box AS (
        SELECT n_nationkey,
               list_aggregate(xs[:len(xs)-1], 'min') AS minx,
               list_aggregate(xs[:len(xs)-1], 'max') AS maxx,
               list_aggregate(ys[:len(ys)-1], 'min') AS miny,
               list_aggregate(ys[:len(ys)-1], 'max') AS maxy
        FROM ring
    ),
    zoomed AS (
        SELECT n_nationkey, minx, maxx, miny, maxy,
               unnest(range(0, {_TILE_ZOOMS})) AS zoom
        FROM box
    ),
    sized AS (
        SELECT *, {_TILE_WORLD} // (1 << zoom) AS t FROM zoomed
    ),
    tx AS (
        SELECT n_nationkey, zoom, t, miny, maxy,
               unnest(range(minx // t, maxx // t + 1)) AS tile_x
        FROM sized
    ),
    tiles AS (
        SELECT n_nationkey, zoom, tile_x,
               unnest(range(miny // t, maxy // t + 1)) AS tile_y
        FROM tx
    ),
    wide AS (
        SELECT c_nationkey AS geoid,
               {_TILE_WIDE_ORACLE_COLS}
        FROM customer
        LEFT JOIN orders ON o_custkey = c_custkey
        GROUP BY c_nationkey
    )
    SELECT CAST(t.zoom AS BIGINT) AS zoom,
           CAST(t.tile_x AS BIGINT) AS tile_x,
           CAST(t.tile_y AS BIGINT) AS tile_y,
           CAST(t.n_nationkey AS BIGINT) AS geoid,
           w.e_95, w.n_95, w.e_96, w.n_96, w.e_97, w.n_97, w.e_98, w.n_98
    FROM tiles t JOIN wide w ON w.geoid = t.n_nationkey
    """,
)
def geo_tile_join(spark, sf_dir):
    """Tile-join capstone (the reference's terminal `tile-join` data shape,
    r14 VERDICT item 4): one record per (zoom, tile_x, tile_y, geography)
    carrying the full wide attribute payload (`e_95`…`n_98`, the
    pipeline_tile_wide shape at nation grain) — exactly what a tile encoder
    consumes to emit attribute-rich vector tiles per pyramid level.

    Scale shape: the wide build pays the attribute pipeline's inherent
    exchanges (customer⋈orders, then the per-geography aggregate); the tile
    pyramid assignment is geo_tile_cover's scan-rider arithmetic over the
    shape table (25 rows × 3 zooms here; tile-count-proportional at scale)
    and attaches by BROADCAST — geometry adds ZERO exchanges over the
    attribute build (pinned, tests/test_plans.py), the same contract
    geo_search_index pins for the R9 flow. Exact: money stays DECIMAL
    until one terminal DOUBLE cast per cell (the pipeline_tile_wide rule);
    tile indices are integer `div` arithmetic."""
    from eviction_lab_etl_spark.functions.determinism import dec, to_dbl

    # pyramid assignment (geo_tile_cover's arithmetic, n_nationkey-keyed)
    ring = _ring_coords(fixtures.nation_polygons_irregular(spark, sf_dir))
    n_open = F.size("xs") - 1
    box = ring.select(
        "n_nationkey",
        F.array_min(F.slice("xs", 1, n_open)).alias("minx"),
        F.array_max(F.slice("xs", 1, n_open)).alias("maxx"),
        F.array_min(F.slice("ys", 1, n_open)).alias("miny"),
        F.array_max(F.slice("ys", 1, n_open)).alias("maxy"),
    )
    tdiv = lambda c, t: F.call_function("div", c, t)  # noqa: E731
    zoomed = box.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(_TILE_ZOOMS - 1))).alias("zoom")
    ).withColumn("t", F.expr(f"shiftright({_TILE_WORLD}, zoom)").cast("long"))
    t = F.col("t")
    tiles = (
        zoomed.select(
            "n_nationkey",
            "zoom",
            "t",
            "miny",
            "maxy",
            F.explode(
                F.sequence(tdiv(F.col("minx"), t), tdiv(F.col("maxx"), t))
            ).alias("tile_x"),
        )
        .select(
            "n_nationkey",
            "zoom",
            "tile_x",
            F.explode(
                F.sequence(tdiv(F.col("miny"), t), tdiv(F.col("maxy"), t))
            ).alias("tile_y"),
        )
    )
    # wide attribute build at nation grain (pipeline_tile_wide's aggregate)
    customer = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load(spark, sf_dir, "orders").withColumn("yr", F.year("o_orderdate"))
    joined = customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
    aggs = []
    for y in _TILE_YEARS:
        in_year = F.col("yr") == y
        aggs.append(
            to_dbl(
                F.coalesce(
                    F.sum(F.when(in_year, dec("o_totalprice"))),
                    F.lit(0).cast("decimal(18,6)"),
                )
            ).alias(f"e_{y - 1900}")
        )
        aggs.append(F.count_if(in_year).alias(f"n_{y - 1900}"))
    wide = joined.groupBy(F.col("c_nationkey").alias("geoid")).agg(*aggs)
    return wide.join(
        F.broadcast(tiles), wide.geoid == tiles.n_nationkey
    ).select(
        big(F.col("zoom")).alias("zoom"),
        big(F.col("tile_x")).alias("tile_x"),
        big(F.col("tile_y")).alias("tile_y"),
        big(F.col("geoid")).alias("geoid"),
        "e_95", "n_95", "e_96", "n_96", "e_97", "n_97", "e_98", "n_98",
    )


# --- crosswalk apportionment, integer end-to-end (largest remainder) -----------
#
# geo_crosswalk_alloc emits the exact rational alloc_num/den; this is the
# consumer's other half made first-class: an INTEGER apportionment whose
# per-source total is exactly src_value (counts are people/filings — they
# must land whole). Largest-remainder (Hamilton) method, the standard for
# census-style crosswalks: floor allocation per target, then one extra unit
# to the r = src − Σfloor targets with the largest remainders (rem DESC,
# target-key ASC tiebreak — §2.0 rule 3: boundary assignment must be
# deterministic). Fully integer in both engines, so the driver hash pins
# the complete 2000→2010-style apportionment from geometry to final table.


@query(
    "geo_crosswalk_apportion",
    oracle=f"""
    WITH {_ORACLE_RING_IRREGULAR},
    abox AS (
        SELECT n_nationkey AS a,
               list_aggregate(xs[:len(xs)-1], 'min') AS minx,
               list_aggregate(xs[:len(xs)-1], 'max') AS maxx,
               list_aggregate(ys[:len(ys)-1], 'min') AS miny,
               list_aggregate(ys[:len(ys)-1], 'max') AS maxy
        FROM ring
    ),
    bpoly AS ({fixtures.NATION_POLYGONS_SQL}),
    bring AS (
        SELECT n_nationkey,
               list_transform(
                   string_split(replace(replace(wkt, 'POLYGON ((', ''), '))', ''), ', '),
                   p -> CAST(string_split(p, ' ')[1] AS BIGINT)) AS xs,
               list_transform(
                   string_split(replace(replace(wkt, 'POLYGON ((', ''), '))', ''), ', '),
                   p -> CAST(string_split(p, ' ')[2] AS BIGINT)) AS ys
        FROM bpoly
    ),
    bbox2 AS (
        SELECT n_nationkey AS b,
               list_aggregate(xs[:len(xs)-1], 'min') AS minx,
               list_aggregate(xs[:len(xs)-1], 'max') AS maxx,
               list_aggregate(ys[:len(ys)-1], 'min') AS miny,
               list_aggregate(ys[:len(ys)-1], 'max') AS maxy
        FROM bring
    ),
    wt AS (
        SELECT a, b,
               (least(x.maxx, y.maxx) - greatest(x.minx, y.minx))
               * (least(x.maxy, y.maxy) - greatest(x.miny, y.miny)) AS w
        FROM abox x JOIN bbox2 y
          ON least(x.maxx, y.maxx) > greatest(x.minx, y.minx)
         AND least(x.maxy, y.maxy) > greatest(x.miny, y.miny)
    ),
    src AS (
        SELECT c_nationkey AS a, count(*) AS src_value
        FROM customer GROUP BY c_nationkey
    ),
    j AS (
        SELECT wt.a, wt.b,
               CAST(wt.w AS BIGINT) AS w,
               CAST(sum(wt.w) OVER (PARTITION BY wt.a) AS BIGINT) AS den,
               CAST(coalesce(src.src_value, 0) AS BIGINT) AS src_value
        FROM wt LEFT JOIN src ON src.a = wt.a
    ),
    k AS (
        SELECT *,
               (src_value * w) // den AS base,
               (src_value * w) % den AS rem,
               row_number() OVER (
                   PARTITION BY a ORDER BY (src_value * w) % den DESC, b
               ) AS rk,
               sum((src_value * w) // den) OVER (PARTITION BY a) AS sum_base
        FROM j
    ),
    al AS (
        SELECT a, b, w, den, src_value,
               CAST(base + CASE WHEN rk <= src_value - sum_base
                                THEN 1 ELSE 0 END AS BIGINT) AS alloc
        FROM k
    )
    SELECT a, b, w, den, src_value, alloc,
           CAST(sum(alloc) OVER (PARTITION BY b) AS BIGINT) AS b_total
    FROM al
    """,
)
def geo_crosswalk_apportion(spark, sf_dir):
    """Crosswalk end-to-end (r14 VERDICT item 5): the full geometry→weights→
    integer-apportionment pipeline in one plan. Weights are the cross-vintage
    bbox-overlap areas (the geo_crosswalk_alloc PBSM join); the source
    measure (customer count per source geography) is apportioned onto
    targets by the largest-remainder method — per target: floor
    (src·w / den), then +1 for the r = src − Σfloor targets with the
    largest remainders (rem DESC, b ASC tiebreak) — so Σ_b alloc ==
    src_value EXACTLY per source (pinned, tests/test_library.py) and every
    value in the result is a bigint: no rational ever leaves the plan.
    ``b_total`` is the rolled-up target-vintage table (Σ over sources) —
    the "2010 column" a consumer reads off directly.

    Scale shape: both vintage shape tables are dimension-sized and
    BROADCAST (at 100 TB of shapes the same PBSM join shuffles candidates
    on cell — geo_bbox_overlap_pairs' form); the apportionment windows
    partition the WEIGHT TABLE (pair-count rows, ≤ |a|·4 here) by source
    then by target — never the fact; the only fact-side exchange is the
    source-measure aggregation. All integer `div`/`%` arithmetic, truncation
    identical cross-engine on the non-negative domain (the _gcell rule)."""
    ring_a = _ring_coords(fixtures.nation_polygons_irregular(spark, sf_dir))
    ring_b = _ring_coords(fixtures.nation_polygons(spark, sf_dir))

    def boxed(ring: DataFrame, key: str) -> DataFrame:
        n_open = F.size("xs") - 1
        return ring.select(
            F.col("n_nationkey").alias(key),
            big(F.array_min(F.slice("xs", 1, n_open))).alias(f"{key}minx"),
            big(F.array_max(F.slice("xs", 1, n_open))).alias(f"{key}maxx"),
            big(F.array_min(F.slice("ys", 1, n_open))).alias(f"{key}miny"),
            big(F.array_max(F.slice("ys", 1, n_open))).alias(f"{key}maxy"),
        )

    def with_cells(box: DataFrame, key: str) -> DataFrame:
        return box.select(
            "*",
            F.explode(
                F.sequence(_gcell(F.col(f"{key}minx")), _gcell(F.col(f"{key}maxx")))
            ).alias(f"{key}gx"),
        ).select(
            "*",
            F.explode(
                F.sequence(_gcell(F.col(f"{key}miny")), _gcell(F.col(f"{key}maxy")))
            ).alias(f"{key}gy"),
        )

    a = with_cells(boxed(ring_a, "a"), "a")
    b = with_cells(boxed(ring_b, "b"), "b")
    ox0 = F.greatest("aminx", "bminx")
    oy0 = F.greatest("aminy", "bminy")
    ox1 = F.least("amaxx", "bmaxx")
    oy1 = F.least("amaxy", "bmaxy")
    w = (
        a.join(
            F.broadcast(b),
            (F.col("agx") == F.col("bgx")) & (F.col("agy") == F.col("bgy")),
        )
        .filter((ox0 < ox1) & (oy0 < oy1))
        .filter((_gcell(ox0) == F.col("agx")) & (_gcell(oy0) == F.col("agy")))
        .select("a", "b", big((ox1 - ox0) * (oy1 - oy0)).alias("w"))
    )
    from pyspark.sql import Window

    src = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("sa"))
        .agg(F.count(F.lit(1)).alias("sv"))
    )
    j = (
        w.withColumn("den", big(F.sum("w").over(Window.partitionBy("a"))))
        .join(F.broadcast(src), F.col("a") == F.col("sa"), "left")
        .select(
            "a", "b", "w", "den",
            big(F.coalesce("sv", F.lit(0))).alias("src_value"),
        )
    )
    by_a = Window.partitionBy("a")
    k = (
        j.withColumn("base", F.expr("(src_value * w) div den"))
        .withColumn("rem", F.expr("(src_value * w) % den"))
        .withColumn(
            "rk",
            F.row_number().over(by_a.orderBy(F.col("rem").desc(), F.col("b"))),
        )
        .withColumn("sum_base", F.sum("base").over(by_a))
    )
    al = k.select(
        "a", "b", "w", "den", "src_value",
        big(
            F.col("base")
            + F.when(
                F.col("rk") <= F.col("src_value") - F.col("sum_base"), 1
            ).otherwise(0)
        ).alias("alloc"),
    )
    return al.withColumn(
        "b_total", big(F.sum("alloc").over(Window.partitionBy("b")))
    )
