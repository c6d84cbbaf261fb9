"""Planted-fixture corpora for non-vacuous correctness checks.

The small-SF fixture data is too clean for several operators to decide
anything: there are no exact-duplicate documents, no customers without
orders, and no embedding near-twins (max pairwise cosine ~0.46). A hash
match over those operators' raw output is vacuous — both engines return the
empty set and the check verifies nothing.

These helpers build AUGMENTED INPUT datasets — the real table UNION'd with a
small deterministic planted set — in BOTH engines (a Spark DataFrame here and
the matching DuckDB SQL text the oracle embeds), so a registered query can
run the REAL operator over an input where the decision actually fires.

This is the fixture layer, deliberately separate from the operators: the
operator functions (``dedup_text.keep_first``, the anti join,
``extensions.cosine_neardup_pairs``) keep production semantics and can be
called on raw data (that is what bench.py times); only the correctness
binding reads the planted corpus. Keep each SQL string and its DataFrame
twin in lockstep — the oracle hash check depends on them being row-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eviction_lab_etl_spark.sources.loader import load

# --- documents with planted exact duplicates (dedup_keep_first) --------------

# Re-key doc_id<25 copies far above the organic id range: 25 real duplicate
# groups whose canonical member is always the original (lower doc_id).
DOCUMENTS_WITH_DUPS_SQL = """
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 25
"""


def documents_with_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.filter(F.col("doc_id") < 25).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    return docs.unionByName(planted)


# --- customers with planted no-order rows (join_anti) ------------------------

# Keys re-based to +9,000,000: orders reference organic custkeys only (15k at
# sf0.1), so the planted rows are guaranteed order-less at every tested SF and
# the anti join has >=25 real rows to decide.
CUSTOMERS_WITH_ORPHANS_SQL = """
        SELECT c_custkey FROM customer
        UNION ALL
        SELECT c_custkey + 9000000 AS c_custkey FROM customer WHERE c_custkey <= 25
"""


def customers_with_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    planted = cust.filter(F.col("c_custkey") <= 25).select(
        (F.col("c_custkey") + 9000000).alias("c_custkey")
    )
    return cust.unionByName(planted)


# --- documents wrapped in synthetic markup / PII (text-cleaning operators) ---

# The fixture corpus is plain text; the cleaning operators need dirty input.
# Markup and PII are synthesized deterministically from doc_id so both engines
# construct the identical raw corpus and the cleaning transform is what the
# hash check actually decides.
DOCUMENTS_WITH_MARKUP_SQL = """
        SELECT doc_id, '<p class="d">' || text || '</p> <br/>' AS raw
        FROM documents
"""


def documents_with_markup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.concat(
            F.lit('<p class="d">'), F.col("text"), F.lit("</p> <br/>")
        ).alias("raw"),
    )


DOCUMENTS_WITH_PII_SQL = """
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR) ||
               '@mail.example or call 555-' ||
               lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' now' AS raw
        FROM documents
"""


def documents_with_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example or call 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" now"),
        ).alias("raw"),
    )


# Wide-grammar PII corpus for text_pii_scrub (the CCNet/Dolma/RefinedWeb
# scrub stage): one planted case PER CLASS per document —
#   - email in the REAL grammar (dots, '+tag', dashed domain, 2-char TLD),
#     planted MIXED-CASE ('First.Last+Tag…@Ex-Ample.Co') so the driver hash
#     pins case-insensitive matching (r14 ADVICE: a lowercase-only fixture
#     left a lowercase-only grammar invisible),
#   - an IPv4 address (distinct octet shapes across docs),
#   - a phone in one of three shapes cycling by doc_id%3:
#     '(NNN) NNN-NNNN' / '+1 NNN-NNN-NNNN' / 'NNN.NNN.NNNN',
#   - plus a FALSE-POSITIVE guard: a 3-octet version literal 'v1.2.K' that a
#     correct IPv4 rule (exactly four octets, word-bounded) must NOT touch.
DOCUMENTS_WITH_PII_WIDE_SQL = """
        SELECT doc_id,
               text || ' reach First.Last+Tag' || CAST(doc_id AS VARCHAR)
                    || '@Ex-Ample.Co from 10.' || CAST(doc_id % 200 AS VARCHAR)
                    || '.0.' || CAST(doc_id % 100 AS VARCHAR)
                    || (CASE CAST(doc_id % 3 AS INTEGER)
                            WHEN 0 THEN ' call (555) 010-'
                            WHEN 1 THEN ' call +1 555-010-'
                            ELSE ' call 555.010.' END)
                    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                    || ' build v1.2.' || CAST(doc_id % 9 AS VARCHAR) AS raw
        FROM documents
"""


def documents_with_pii_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    d = F.col("doc_id")
    return docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" reach First.Last+Tag"),
            d.cast("string"),
            F.lit("@Ex-Ample.Co from 10."),
            (d % 200).cast("string"),
            F.lit(".0."),
            (d % 100).cast("string"),
            F.when(d % 3 == 0, F.lit(" call (555) 010-"))
            .when(d % 3 == 1, F.lit(" call +1 555-010-"))
            .otherwise(F.lit(" call 555.010.")),
            F.lpad((d % 10000).cast("string"), 4, "0"),
            F.lit(" build v1.2."),
            (d % 9).cast("string"),
        ).alias("raw"),
    )


# Unicode-mess corpus: the byte-level noise (case, diacritics, compatibility
# forms, punctuation, whitespace) that CCNet-style normalization exists to
# fold away — one planted case per fold CLASS of cleaning.py's table:
#   - case:            the whole doc uppercased
#   - Latin-1:         A E I O Y N C -> À É Î Õ Ý Ñ Ç
#   - Latin Ext-A:     U -> Ū (macron), L -> Ł (stroke)
#   - NFKC full-width: W -> Ｗ
#   - NFKC ligature:   FI -> ﬁ (fires on every "filter")
#   - decomposed mark: D -> D + U+0301 (combining acute — NFKD residue)
#   - punct/space:     every space turned into a padded ',' run, junk edges
# Constructed so the repo's normalize chain recovers the ORIGINAL text
# exactly, which is what makes the normalized-dedup delta measurable:
# mess(text) never equals text byte-wise, but always equals it normalized.
# (Expansion folds with no fixture digraph — ß æ œ ĳ þ — are pinned
# cross-engine over a crafted probe in tests/test_library.py instead.)
DOCUMENTS_MESSY_SQL = """
        SELECT doc_id,
               '  ' || replace(translate(
                           replace(replace(upper(text), 'FI', 'ﬁ'),
                                   'D', 'D\u0301'),
                           'AEIOUYNCLW', 'ÀÉÎÕŪÝÑÇŁＷ'),
                       ' ', '  ,  ') || ' !!' AS raw
        FROM documents
"""


def documents_messy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    messed = F.translate(
        F.replace(
            F.replace(F.upper("text"), F.lit("FI"), F.lit("ﬁ")),
            F.lit("D"),
            F.lit("D\u0301"),
        ),
        "AEIOUYNCLW",
        "ÀÉÎÕŪÝÑÇŁＷ",
    )
    return docs.select(
        "doc_id",
        F.concat(
            F.lit("  "),
            F.replace(messed, F.lit(" "), F.lit("  ,  ")),
            F.lit(" !!"),
        ).alias("raw"),
    )


# --- dup-augmented AND markup-wrapped corpus (pipeline_training_set) ---------

# The end-to-end training pipeline needs an input where BOTH the cleaning
# stage and the dedup stage have real decisions: the dup-planted corpus
# wrapped in deterministic markup.
DOCUMENTS_DIRTY_SQL = f"""
        SELECT doc_id, '<p class="d">' || text || '</p> <br/>' AS raw
        FROM ({DOCUMENTS_WITH_DUPS_SQL})
"""


def documents_dirty(spark: SparkSession, sf_dir: str) -> DataFrame:
    return documents_with_dups(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.lit('<p class="d">'), F.col("text"), F.lit("</p> <br/>")
        ).alias("raw"),
    )


# --- nation polygons as WKT (geometry-lite operators) ------------------------

# The fixture tables carry no geometry; the reference's geo stage (census
# shapes → simplified polygons → centroid "label points") needs one. Each
# nation gets a deterministic integer-coordinate octagon on a 5×5 grid of
# 20×20 cells: center ((k%5)*20+10, (k//5)*20+10), radius scale 1+(k%2), and
# an asymmetry bump -(k%3) on the west vertex so the area centroid is NOT the
# center (the shoelace computation has something to decide). All-integer
# coordinates keep every downstream computation exact (§2.0 rule 1). Keep the
# SQL text and the DataFrame twin in lockstep vertex by vertex.
_OCT_DX = (4, 3, 0, -3, -4, -3, 0, 3)
_OCT_DY = (0, 3, 4, 3, 0, -3, -4, -3)


def _vertex_sql(i: int) -> str:
    bump = " - (n_nationkey % 3)" if i == 4 else ""
    dx, dy = _OCT_DX[i], _OCT_DY[i]
    return (
        f"CAST((n_nationkey % 5) * 20 + 10 + (1 + n_nationkey % 2) * {dx}{bump} AS VARCHAR)"
        f" || ' ' || "
        f"CAST((n_nationkey // 5) * 20 + 10 + (1 + n_nationkey % 2) * {dy} AS VARCHAR)"
    )


NATION_POLYGONS_SQL = (
    "        SELECT n_nationkey, 'POLYGON ((' || "
    + " || ', ' || ".join(_vertex_sql(i) for i in list(range(8)) + [0])
    + " || '))' AS wkt FROM nation"
)


def nation_polygons(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = load(spark, sf_dir, "nation")

    def vx(i: int):
        bump = (F.col("n_nationkey") % 3) if i == 4 else F.lit(0)
        s = 1 + F.col("n_nationkey") % 2
        x = (F.col("n_nationkey") % 5) * 20 + 10 + s * _OCT_DX[i] - bump
        y = (F.col("n_nationkey") - F.col("n_nationkey") % 5) / 5
        y = y.cast("long") * 20 + 10 + s * _OCT_DY[i]
        return F.concat(x.cast("string"), F.lit(" "), y.cast("string"))

    parts = []
    for i in list(range(8)) + [0]:
        if parts:
            parts.append(F.lit(", "))
        parts.append(vx(i))
    return nat.select(
        "n_nationkey",
        F.concat(F.lit("POLYGON (("), *parts, F.lit("))")).alias("wkt"),
    )


# --- irregular (concave) nation polygons: the ray-casting fixture ------------

# geo_point_in_polygon needs polygons where the bbox / center-distance tests
# are WRONG answers — i.e. genuinely concave rings — or the exact ray-cast
# would be dead weight the hash can't see. Each nation gets a 16-vertex star
# polygon around its lattice center: 16 integer direction vectors in strictly
# increasing angular order (so the ring is simple — star-shaped about the
# center — for ANY per-vertex magnitudes), with magnitudes 1..6 varying by
# (n_nationkey, vertex) residue. Max offset 12 exceeds the 10-unit cell
# half-width, so polygons SPILL into neighbouring 20×20 grid cells and the
# grid index must emit one row per covered cell (the multi-cell case
# geo_point_in_region's docstring only gestures at). The lattice is shifted
# to (30, 30)+ so every coordinate stays non-negative — integer div on
# negatives truncates in Spark but floors in DuckDB, a cross-engine trap the
# shift removes by construction.
_STAR_DX = (1, 2, 1, 1, 0, -1, -1, -2, -1, -2, -1, -1, 0, 1, 1, 2)
_STAR_DY = (0, 1, 1, 2, 1, 2, 1, 1, 0, -1, -1, -2, -1, -2, -1, -1)
_STAR_N = 16


def _star_mag_sql(i: int) -> str:
    return f"(1 + (n_nationkey * 7 + {i * 5}) % 6)"


def _star_vertex_sql(i: int) -> str:
    dx, dy = _STAR_DX[i], _STAR_DY[i]
    m = _star_mag_sql(i)
    return (
        f"CAST((n_nationkey % 5) * 20 + 30 + {m} * {dx} AS VARCHAR)"
        f" || ' ' || "
        f"CAST((n_nationkey // 5) * 20 + 30 + {m} * {dy} AS VARCHAR)"
    )


NATION_POLYGONS_IRREGULAR_SQL = (
    "        SELECT n_nationkey, 'POLYGON ((' || "
    + " || ', ' || ".join(_star_vertex_sql(i) for i in list(range(_STAR_N)) + [0])
    + " || '))' AS wkt FROM nation"
)


def nation_polygons_irregular(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = load(spark, sf_dir, "nation")
    k = F.col("n_nationkey")

    def vx(i: int):
        m = 1 + (k * 7 + i * 5) % 6
        x = (k % 5) * 20 + 30 + m * _STAR_DX[i]
        y = (k - k % 5) / 5
        y = y.cast("long") * 20 + 30 + m * _STAR_DY[i]
        return F.concat(x.cast("string"), F.lit(" "), y.cast("string"))

    parts = []
    for i in list(range(_STAR_N)) + [0]:
        if parts:
            parts.append(F.lit(", "))
        parts.append(vx(i))
    return nat.select(
        "n_nationkey",
        F.concat(F.lit("POLYGON (("), *parts, F.lit("))")).alias("wkt"),
    )


# --- holed (multi-ring) nation polygons: census-shape semantics --------------

# Real census polygons carry interior rings (lakes, enclaves); the even-odd
# rule handles them for free IF the containment test folds over ALL rings.
# This fixture gives every nation a star outer ring with magnitudes 4..6
# (min inradius ≈ 3.9 — the same 16-direction construction, floor raised so
# a hole fits strictly inside) plus a ±2 square hole around the center
# (corner distance 2.83 < 3.9). Max radius 6·|(2,1)| ≈ 13.4 still spills
# across grid cells, so the multi-cell index path stays exercised.


def _holed_mag_sql(i: int) -> str:
    return f"(4 + (n_nationkey * 7 + {i * 5}) % 3)"


def _holed_vertex_sql(i: int) -> str:
    dx, dy = _STAR_DX[i], _STAR_DY[i]
    m = _holed_mag_sql(i)
    return (
        f"CAST((n_nationkey % 5) * 20 + 30 + {m} * {dx} AS VARCHAR)"
        f" || ' ' || "
        f"CAST((n_nationkey // 5) * 20 + 30 + {m} * {dy} AS VARCHAR)"
    )


_HOLE_OFFS = ((-2, -2), (2, -2), (2, 2), (-2, 2), (-2, -2))


def _hole_vertex_sql(dx: int, dy: int) -> str:
    return (
        f"CAST((n_nationkey % 5) * 20 + 30 + {dx} AS VARCHAR)"
        f" || ' ' || "
        f"CAST((n_nationkey // 5) * 20 + 30 + {dy} AS VARCHAR)"
    )


NATION_POLYGONS_HOLED_SQL = (
    "        SELECT n_nationkey, 'POLYGON ((' || "
    + " || ', ' || ".join(_holed_vertex_sql(i) for i in list(range(_STAR_N)) + [0])
    + " || '), (' || "
    + " || ', ' || ".join(_hole_vertex_sql(dx, dy) for dx, dy in _HOLE_OFFS)
    + " || '))' AS wkt FROM nation"
)


def nation_polygons_holed(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = load(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    cx = (k % 5) * 20 + 30
    cy = ((k - k % 5) / 5).cast("long") * 20 + 30

    def vx(i: int):
        m = 4 + (k * 7 + i * 5) % 3
        return F.concat(
            (cx + m * _STAR_DX[i]).cast("string"),
            F.lit(" "),
            (cy + m * _STAR_DY[i]).cast("string"),
        )

    outer = []
    for i in list(range(_STAR_N)) + [0]:
        if outer:
            outer.append(F.lit(", "))
        outer.append(vx(i))
    hole = []
    for dx, dy in _HOLE_OFFS:
        if hole:
            hole.append(F.lit(", "))
        hole.append(
            F.concat(
                (cx + dx).cast("string"), F.lit(" "), (cy + dy).cast("string")
            )
        )
    return nat.select(
        "n_nationkey",
        F.concat(
            F.lit("POLYGON (("), *outer, F.lit("), ("), *hole, F.lit("))")
        ).alias("wkt"),
    )


# --- multipolygon nations: the island case ------------------------------------

# Census geographies are MULTIPOLYGONs (mainland + islands). Even-keyed
# nations get a second part: a small square island at the cell's north-east
# (offset +13..+16 from center — disjoint from the star, whose max radius is
# 12, and still inside the 20×20 cell). Odd-keyed nations stay single-part,
# so the parser's part-count axis is exercised in both directions.

_ISLE_OFFS = ((13, 13), (16, 13), (16, 16), (13, 16), (13, 13))


def _isle_vertex_sql(dx: int, dy: int) -> str:
    return (
        f"CAST((n_nationkey % 5) * 20 + 30 + {dx} AS VARCHAR)"
        f" || ' ' || "
        f"CAST((n_nationkey // 5) * 20 + 30 + {dy} AS VARCHAR)"
    )


NATION_MULTIPOLYGONS_SQL = (
    "        SELECT n_nationkey, 'MULTIPOLYGON (((' || "
    + " || ', ' || ".join(_star_vertex_sql(i) for i in list(range(_STAR_N)) + [0])
    + " || CASE WHEN n_nationkey % 2 = 0 THEN ')), ((' || "
    + " || ', ' || ".join(_isle_vertex_sql(dx, dy) for dx, dy in _ISLE_OFFS)
    + " ELSE '' END || ')))' AS wkt FROM nation"
)


def nation_multipolygons(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = load(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    cx = (k % 5) * 20 + 30
    cy = ((k - k % 5) / 5).cast("long") * 20 + 30

    def vx(i: int):
        m = 1 + (k * 7 + i * 5) % 6
        return F.concat(
            (cx + m * _STAR_DX[i]).cast("string"),
            F.lit(" "),
            (cy + m * _STAR_DY[i]).cast("string"),
        )

    star = []
    for i in list(range(_STAR_N)) + [0]:
        if star:
            star.append(F.lit(", "))
        star.append(vx(i))
    isle = []
    for dx, dy in _ISLE_OFFS:
        if isle:
            isle.append(F.lit(", "))
        isle.append(
            F.concat(
                (cx + dx).cast("string"), F.lit(" "), (cy + dy).cast("string")
            )
        )
    return nat.select(
        "n_nationkey",
        F.concat(
            F.lit("MULTIPOLYGON ((("),
            *star,
            F.when(
                k % 2 == 0, F.concat(F.lit(")), ((") , *isle)
            ).otherwise(F.lit("")),
            F.lit(")))"),
        ).alias("wkt"),
    )


# --- GeoJSON feature strings over the irregular polygons ---------------------

# The reference's geo stage consumes GeoJSON (fetched census shapes), not
# WKT; geo_geojson_parse needs a GeoJSON column to parse. Built from the SAME
# star-vertex constants as the irregular WKT fixture, as a standard Feature:
# {"type":"Feature","properties":{"key":K,"name":...},"geometry":
#  {"type":"Polygon","coordinates":[[[x,y],...]]}} with the ring closed
# (first vertex repeated last, per the GeoJSON spec). n_name is [A-Z ]-only
# in TPC-H, so no JSON escaping is needed on either engine.


def _star_coord_sql(i: int) -> str:
    dx, dy = _STAR_DX[i], _STAR_DY[i]
    m = _star_mag_sql(i)
    return (
        f"'[' || CAST((n_nationkey % 5) * 20 + 30 + {m} * {dx} AS VARCHAR)"
        f" || ',' || "
        f"CAST((n_nationkey // 5) * 20 + 30 + {m} * {dy} AS VARCHAR) || ']'"
    )


NATION_GEOJSON_SQL = (
    "        SELECT n_nationkey, '{\"type\":\"Feature\",\"properties\":"
    "{\"key\":' || CAST(n_nationkey AS VARCHAR) || ',\"name\":\"' || n_name"
    " || '\"},\"geometry\":{\"type\":\"Polygon\",\"coordinates\":[[' || "
    + " || ',' || ".join(_star_coord_sql(i) for i in list(range(_STAR_N)) + [0])
    + " || ']]}}' AS geojson FROM nation"
)


def nation_geojson(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = load(spark, sf_dir, "nation")
    k = F.col("n_nationkey")

    def coord(i: int):
        m = 1 + (k * 7 + i * 5) % 6
        x = (k % 5) * 20 + 30 + m * _STAR_DX[i]
        y = (k - k % 5) / 5
        y = y.cast("long") * 20 + 30 + m * _STAR_DY[i]
        return F.concat(
            F.lit("["), x.cast("string"), F.lit(","), y.cast("string"), F.lit("]")
        )

    parts = []
    for i in list(range(_STAR_N)) + [0]:
        if parts:
            parts.append(F.lit(","))
        parts.append(coord(i))
    return nat.select(
        "n_nationkey",
        F.concat(
            F.lit('{"type":"Feature","properties":{"key":'),
            k.cast("string"),
            F.lit(',"name":"'),
            F.col("n_name"),
            F.lit('"},"geometry":{"type":"Polygon","coordinates":[['),
            *parts,
            F.lit("]]}}"),
        ).alias("geojson"),
    )


# --- embeddings with planted near-twins (sim_cosine_neardup) -----------------

# vec_id<50 re-keyed +100000 with the first component nudged +0.25
# (cos ~0.97 to the original). The nudge and the float->double casts are
# exact in both engines, so the planted corpus is bit-identical on the
# oracle side.
TWIN_NUDGE = 0.25


def embeddings_with_twins_sql(emb_dim: int) -> str:
    return f"""
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings WHERE vec_id < 300
        UNION ALL
        SELECT vec_id + 100000 AS vec_id,
               list_transform(range(1, {emb_dim + 1}), j -> CASE WHEN j = 1
                   THEN CAST(embedding[1] AS DOUBLE) + {TWIN_NUDGE}
                   ELSE CAST(embedding[j] AS DOUBLE) END) AS v
        FROM embeddings WHERE vec_id < 50
"""


def embeddings_with_twins(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") < 300).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    twins = emb.filter(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: F.when(i == 0, x.cast("double") + F.lit(TWIN_NUDGE)).otherwise(
                x.cast("double")
            ),
        ).alias("v"),
    )
    return base.unionByName(twins)


# --- clustered embeddings (ann_ivf recall evaluation) ------------------------

# 50 planted clusters x 10 members over the real vector corpus: member
# (cid, j) = seed_cid + CLUSTER_EPS * perturber, with the perturber drawn
# deterministically from the disjoint id range (50 + (cid*10 + j) % 450).
# Near-orthogonal base vectors of similar magnitude give within-cluster
# cos ~ 1/(1+eps^2) ~ 0.92 and cross-cluster cos well below 0.5, so
# nearest-neighbor structure is REAL and an IVF recall number measures the
# quantizer: the raw embeddings table is isotropic noise (max pairwise cos
# ~0.51, top-3 neighbor label agreement 10% = chance), where top-3 neighbors
# are arbitrary points NO codebook can systematically co-bucket — recall
# against it measures luck, not codebook quality. vec_id = j*50 + cid
# spreads every cluster across the id space so the vec_id < 10 probe set
# covers 10 DISTINCT clusters. The trained-KMeans ann_ivf stays rows-only
# (codebooks aren't SQL-expressible; recall pinned in tests/test_library.py);
# EMBEDDINGS_CLUSTERED_SQL below is the DuckDB twin that lets the
# sampled-codebook ann_ivf_recall query be hash-checked end-to-end.
CLUSTER_EPS = 0.3

EMBEDDINGS_CLUSTERED_SQL = f"""
        SELECT m.j * 50 + m.cid AS vec_id,
               list_transform(range(1, len(m.s) + 1),
                   i -> CAST(m.s[i] AS DOUBLE)
                        + {CLUSTER_EPS} * CAST(e.embedding[i] AS DOUBLE)
               ) AS embedding,
               m.cid AS cid
        FROM (SELECT cid, s, t.j AS j, 50 + (cid * 10 + t.j) % 450 AS pid
              FROM (SELECT vec_id AS cid, embedding AS s
                    FROM embeddings WHERE vec_id < 50) seeds,
                   LATERAL (SELECT unnest(range(0, 10)) AS j) t) m
        JOIN embeddings e ON e.vec_id = m.pid
"""


def embeddings_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    seeds = emb.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("s")
    )
    pert = emb.filter((F.col("vec_id") >= 50) & (F.col("vec_id") < 500)).select(
        F.col("vec_id").alias("pid"), F.col("embedding").alias("p")
    )
    return (
        seeds.select(
            "cid", "s", F.explode(F.sequence(F.lit(0), F.lit(9))).alias("j")
        )
        .withColumn("pid", F.lit(50) + (F.col("cid") * 10 + F.col("j")) % 450)
        .join(pert, "pid")
        .select(
            (F.col("j") * 50 + F.col("cid")).alias("vec_id"),
            F.zip_with(
                "s",
                "p",
                lambda a, b: a.cast("double")
                + F.lit(CLUSTER_EPS) * b.cast("double"),
            ).alias("embedding"),
            F.col("cid"),
        )
    )


# --- documents with synthetic crawl URLs (web-stage operators) ----------------

# RefinedWeb/CCNet stage-1 runs on URLs before any document byte is read:
# canonicalize, dedup by canonical form, cap per-domain volume. The fixture
# corpus has no URL column, so one is synthesized deterministically from
# (doc_id, source) carrying every noise axis the canonicalizer must fold —
# scheme variants, `www.`, host case, trailing slash, utm_* tracking params in
# BOTH positions (leading and trailing inside the query string) and in the
# WIDE grammar (digit/underscore-bearing name `utm_x2_id`, dash + percent-
# encoded value `AB-12_x%2Fy` — the r12 ADVICE realism case), a CONSECUTIVE
# utm run (`?utm_a=1&utm_b=2&page=` — exercises the `(...)+` run form of the
# separator-anchored strip rule), fragments — while meaningful params
# (`page=`, `id=`) must SURVIVE canonicalization, including the r13 ADVICE
# false-positive shapes: a param whose NAME merely contains `utm_`
# (`?xutm_a=1&page=`) and a param whose VALUE contains a literal `utm_x=y`
# sequence (`?q=utm_x=y&page=`) — both must pass through untouched.
# Canonical collisions are guaranteed (path = doc_id % 50 within a source, and
# the kept-param residue is itself periodic), so the URL dedup decides real
# groups at every SF.
DOCUMENTS_WITH_URLS_SQL = """
        SELECT doc_id, source,
               (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'http://' END)
               || (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END)
               || (CASE WHEN doc_id % 5 = 0 THEN upper(source) ELSE source END)
               || '.example.com/docs/' || CAST(doc_id % 50 AS VARCHAR)
               || (CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END)
               || (CASE WHEN doc_id % 8 = 4
                        THEN '?utm_x2_id=AB-12_x%2Fy&page=' || CAST(doc_id % 3 AS VARCHAR)
                        WHEN doc_id % 8 = 1
                        THEN '?xutm_a=1&page=' || CAST(doc_id % 3 AS VARCHAR)
                        WHEN doc_id % 8 = 5
                        THEN '?q=utm_x=y&page=' || CAST(doc_id % 3 AS VARCHAR)
                        WHEN doc_id % 8 = 3
                        THEN '?utm_a=1&utm_b=2&page=' || CAST(doc_id % 3 AS VARCHAR)
                        WHEN doc_id % 4 = 0
                        THEN '?utm_source=feed&page=' || CAST(doc_id % 3 AS VARCHAR)
                        WHEN doc_id % 4 = 2
                        THEN '?id=' || CAST(doc_id % 50 AS VARCHAR)
                             || '&utm_campaign=mail'
                        ELSE '' END)
               || (CASE WHEN doc_id % 11 = 0 THEN '#top' ELSE '' END) AS url
        FROM documents
"""


def documents_with_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    d = F.col("doc_id")
    url = F.concat(
        F.when(d % 2 == 0, F.lit("https://")).otherwise(F.lit("http://")),
        F.when(d % 3 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.when(d % 5 == 0, F.upper("source")).otherwise(F.col("source")),
        F.lit(".example.com/docs/"),
        (d % 50).cast("string"),
        F.when(d % 7 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(
            d % 8 == 4,
            F.concat(F.lit("?utm_x2_id=AB-12_x%2Fy&page="), (d % 3).cast("string")),
        )
        .when(
            d % 8 == 1,
            F.concat(F.lit("?xutm_a=1&page="), (d % 3).cast("string")),
        )
        .when(
            d % 8 == 5,
            F.concat(F.lit("?q=utm_x=y&page="), (d % 3).cast("string")),
        )
        .when(
            d % 8 == 3,
            F.concat(F.lit("?utm_a=1&utm_b=2&page="), (d % 3).cast("string")),
        )
        .when(
            d % 4 == 0,
            F.concat(F.lit("?utm_source=feed&page="), (d % 3).cast("string")),
        )
        .when(
            d % 4 == 2,
            F.concat(
                F.lit("?id="), (d % 50).cast("string"), F.lit("&utm_campaign=mail")
            ),
        )
        .otherwise(F.lit("")),
        F.when(d % 11 == 0, F.lit("#top")).otherwise(F.lit("")),
    )
    return docs.select("doc_id", "source", url.alias("url"))
