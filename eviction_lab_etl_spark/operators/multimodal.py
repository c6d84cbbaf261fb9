"""Multimodal column plumbing (BASELINE.json extension).

Pattern: media are opaque ``binary`` columns with a typed metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so the heavy bytes never cross a row-at-a-time
boundary. The actual codecs (PIL/ffmpeg/librosa) are not in this container,
so the decode body is a clearly-marked deterministic stub behind
``decode_media``; everything Spark-side — binary schema, batch iteration,
UDF signature, partition behavior — is real and tested.

At 100 TB: binary payloads dominate partition size, so sources should set
``spark.sql.files.maxPartitionBytes`` low and never project the binary column
except into the mapInPandas stage (column pruning keeps metadata-only queries
free of the bytes).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eviction_lab_etl_spark import fixtures
from eviction_lab_etl_spark.functions.determinism import big
from eviction_lab_etl_spark.registry import query
from eviction_lab_etl_spark.sources.loader import load

_FEATURE_DIM = 4


def decode_media(payload: bytes, media_type: str) -> list[float]:
    """Decode a media payload into a feature vector.

    STUB: real image/audio decoding needs PIL/librosa/ffmpeg, which this
    container does not ship. The deterministic fake — first 4 bytes scaled to
    [0,1] — preserves the exact data shape a real extractor would emit, so the
    surrounding Spark plumbing is fully exercised. Replace the body (not the
    signature) to go real.
    """
    if media_type not in ("fake/bytes",):
        raise NotImplementedError(
            f"real decoder for {media_type!r} requires media libs absent here"
        )
    head = payload[:_FEATURE_DIM].ljust(_FEATURE_DIM, b"\0")
    return [b / 255.0 for b in head]


def media_frame(spark, sf_dir: str) -> DataFrame:
    """The documents table viewed as a media table: payload bytes + typed
    metadata (the ingest shape for any multimodal source)."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("fake/bytes").alias("media_type"),
            F.col("n_chars").cast("bigint").alias("n_bytes"),
            ((F.col("n_chars") % 30) + 1).cast("bigint").alias("n_frames"),
        ).alias("meta"),
    )


@query(
    "multimodal_decode",
    oracle="""
    SELECT doc_id,
           CAST(n_chars AS BIGINT) AS n_bytes,
           CAST(4 AS BIGINT) AS dim,
           upper(rpad(substring(hex(encode(text)), 1, 8), 8, '0')) AS feature_hex
    FROM documents
    """,
)
def multimodal_decode(spark, sf_dir):
    """Arrow-batched feature extraction over binary payloads via mapInPandas:
    each batch arrives as a pandas frame and the stub decoder produces the
    float feature vector — the exact shape of a real image/audio embedding
    stage. The emitted columns are the vector's *dimension* plus a hex digest
    of the decoded source bytes rather than the raw array<float>: floats are
    never hashed (§2.0 rule 1) and the digest gives the oracle a byte-exact,
    engine-neutral value check of what was decoded."""
    media = media_frame(spark, sf_dir)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            features = [
                decode_media(payload, meta["media_type"])
                for payload, meta in zip(pdf["payload"], pdf["meta"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "dim": [len(f) for f in features],
                    "feature_hex": [
                        p[:_FEATURE_DIM].ljust(_FEATURE_DIM, b"\0").hex().upper()
                        for p in pdf["payload"]
                    ],
                }
            )

    return media.mapInPandas(
        extract, schema="doc_id long, n_bytes long, dim long, feature_hex string"
    )


@query("multimodal_resize")  # rows-only: binary-transform plumbing
def multimodal_resize(spark, sf_dir):
    """Media resize stage: an Arrow-batched transform that rewrites the binary
    payload and its metadata in one pass (the shape of an image-resize or
    audio-resample step). The stub 'resize' truncates the payload to 64 bytes;
    a real codec swaps only the per-row body. Metadata (n_bytes) is recomputed
    from the actual output payload, as a real stage must."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [bytes(p[:64]) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": resized,
                    "n_bytes": [len(p) for p in resized],
                    "media_type": [m["media_type"] for m in pdf["meta"]],
                }
            )

    media = media_frame(spark, sf_dir)
    return media.mapInPandas(
        resize, schema="doc_id long, payload binary, n_bytes long, media_type string"
    )


@query(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id,
           unnest(range(0, (n_chars % 30) + 1, 5)) AS frame_idx
    FROM documents
    """,
)
def multimodal_frame_sample(spark, sf_dir):
    """Video frame sampling: every 5th frame index from each payload's frame
    count (metadata-driven — the binary column is never touched, so column
    pruning keeps the scan cheap). Hash-checked integer expansion."""
    media = media_frame(spark, sf_dir)
    return media.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(5))
        ).alias("idx"),
    ).select("doc_id", F.col("idx").cast("bigint").alias("frame_idx"))


@query(
    "multimodal_dedup",
    oracle=f"""
    WITH media AS ({fixtures.DOCUMENTS_WITH_DUPS_SQL})
    SELECT md5(text) AS h, min(doc_id) AS keep, count(*) AS grp_size
    FROM media
    GROUP BY md5(text)
    HAVING count(*) > 1
    """,
)
def multimodal_dedup(spark, sf_dir):
    """Media-asset dedup: canonical-copy election per BINARY payload digest
    (identical re-crawled images/audio collapse to one stored asset). Spark's
    md5 hashes the raw bytes — the oracle hashes the same bytes as UTF-8 text
    because the fixture payload is encode(text). The shuffle carries 16-byte
    digests, never the payloads (at 100 TB the binary column feeds the digest
    map-side and is pruned from everything downstream); input is the
    dup-planted fixture corpus so the election decides 25 real groups."""
    docs = fixtures.documents_with_dups(spark, sf_dir)
    media = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return (
        media.groupBy(F.md5("payload").alias("h"))
        .agg(F.min("doc_id").alias("keep"), F.count(F.lit(1)).alias("grp_size"))
        .filter(F.col("grp_size") > 1)
    )
