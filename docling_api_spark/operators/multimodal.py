"""Multimodal-column operators (north star: image/audio/video as opaque
binary columns with typed metadata).

The test corpus has no real media, so binaries are synthesized from
`documents.text` (ASCII word soup → byte and char offsets coincide, which
lets the frame sampler keep a SQL oracle). The decode step is STUBBED with
deterministic fakes — the imaging/audio libs aren't in this environment —
but everything Spark-side is real: binary columns, typed metadata structs,
JVM-side chunking via substring-on-binary, Arrow-batched mapInPandas with a
declared output schema.

Scale notes:
- Frame sampling is pure Catalyst (sequence/explode/substring on binary):
  chunk selection never leaves the JVM and never copies unsampled bytes.
- The feature extractor is the canonical media-UDF shape: binary in,
  fixed-width feature struct out, batch size bounded by
  arrow.maxRecordsPerBatch because rows are megabytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from docling_api_spark.plans.registry import register
from docling_api_spark.tables import load_table

FRAME_BYTES = 64
SAMPLE_EVERY = 4


def _media_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, media binary, meta struct) with typed metadata
    derived deterministically from the row (the schema a real pipeline would
    carry: media kind, declared dims, codec tag)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("media"),
        F.struct(
            F.when(F.col("doc_id") % 3 == 0, "image")
            .when(F.col("doc_id") % 3 == 1, "audio")
            .otherwise("video")
            .alias("kind"),
            (16 + F.col("doc_id") % 64).cast("int").alias("width"),
            (16 + (F.col("doc_id") * 7) % 64).cast("int").alias("height"),
            F.col("n_chars").cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )


# ---------------------------------------------------------------------------
# q80 — media feature extraction (stubbed decode; rows-only)
# ---------------------------------------------------------------------------
_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("aspect", T.DoubleType()),
        T.StructField("entropy", T.DoubleType()),
        # The 8-dim feature vector is emitted as scalar columns (not
        # array<float>): the driver's pandas canonicalizer sorts rows by
        # every column and dies on unhashable array cells.
        *[T.StructField(f"f{i}", T.DoubleType()) for i in range(8)],
    ]
)


@register("q80_media_features", tags=("multimodal", "udf"))
def q80_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract stub over binary media columns.

    A real deployment would decode pixels/samples here (PIL/ffmpeg on the
    executors); this stub derives deterministic features (byte histogram
    entropy, md5-seeded 8-dim embedding) so the plumbing — binary columns
    through Arrow, struct metadata access, fixed-width feature output — is
    exercised end to end. Rows-only check.
    """
    import hashlib

    import numpy as np
    import pandas as pd

    corpus = _media_corpus(spark, sf_dir).select(
        "doc_id", "media", F.col("meta.kind").alias("kind"),
        F.col("meta.width").alias("width"), F.col("meta.height").alias("height"),
    )

    def extract(batches):
        for pdf in batches:
            rows = []
            for doc_id, media, kind, width, height in zip(
                pdf["doc_id"], pdf["media"], pdf["kind"], pdf["width"], pdf["height"]
            ):
                raw = bytes(media)
                counts = np.bincount(
                    np.frombuffer(raw, dtype=np.uint8), minlength=256
                )
                n = max(len(raw), 1)
                p = counts[counts > 0] / n
                entropy = float(-(p * np.log2(p)).sum())
                digest = hashlib.md5(raw).digest()
                row = {
                    "doc_id": doc_id,
                    "kind": kind,
                    "n_bytes": len(raw),
                    "aspect": float(width) / float(height),
                    "entropy": entropy,
                }
                for i in range(8):
                    row[f"f{i}"] = (
                        int.from_bytes(digest[2 * i : 2 * i + 2], "big") / 65535.0
                    )
                rows.append(row)
            yield pd.DataFrame(rows)

    return corpus.mapInPandas(extract, _FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# q81 — video frame sampling via JVM-side binary chunking (oracle)
# ---------------------------------------------------------------------------
@register(
    "q81_frame_sample",
    tags=("multimodal", "chunking"),
    oracle=f"""
        WITH v AS (
          SELECT doc_id, text, CAST(ceil(length(text) / {FRAME_BYTES}.0) AS INTEGER) AS n_frames
          FROM documents WHERE doc_id % 3 = 2
        )
        SELECT
          doc_id,
          n_frames,
          CAST(i AS INTEGER) AS frame_index,
          md5(substring(text, CAST(i * {FRAME_BYTES} + 1 AS INTEGER), {FRAME_BYTES}))
            AS frame_md5,
          CAST(least({FRAME_BYTES}, length(text) - i * {FRAME_BYTES}) AS INTEGER)
            AS frame_len
        FROM v, UNNEST(range(0, n_frames)) AS u(i)
        WHERE i % {SAMPLE_EVERY} = 0
    """,
)
def q81_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample every 4th fixed-size frame from binary 'video' payloads.

    Chunking is substring-on-binary over an exploded frame index — fully
    JVM-side; unsampled frames are never materialized. (Oracle works on the
    source text because the corpus is ASCII, so byte and char offsets
    coincide; the Spark side genuinely operates on BinaryType.)
    """
    videos = _media_corpus(spark, sf_dir).filter(F.col("meta.kind") == "video")
    frames = videos.select(
        "doc_id",
        "media",
        F.ceil(F.expr("length(media)") / float(FRAME_BYTES)).cast("int").alias("n_frames"),
    ).select(
        "doc_id",
        "media",
        "n_frames",
        F.explode(
            F.filter(
                F.sequence(F.lit(0), F.col("n_frames") - 1),
                lambda i: i % SAMPLE_EVERY == 0,
            )
        ).alias("frame_index"),
    )
    frame = F.expr(f"substring(media, frame_index * {FRAME_BYTES} + 1, {FRAME_BYTES})")
    return frames.select(
        "doc_id",
        "n_frames",
        F.col("frame_index").cast("int"),
        F.md5(frame).alias("frame_md5"),
        F.length(frame).cast("int").alias("frame_len"),
    )


# ---------------------------------------------------------------------------
# q82 — media resize/downsample stub (oracle-checked pandas UDF)
# ---------------------------------------------------------------------------
RESIZE_STRIDE = 4

_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("orig_bytes", T.IntegerType()),
        T.StructField("resized_bytes", T.IntegerType()),
        T.StructField("resized_md5", T.StringType()),
    ]
)


@register(
    "q82_media_resize",
    tags=("multimodal", "udf", "resize"),
    oracle=f"""
        WITH m AS (
          SELECT doc_id,
                 CASE CAST(doc_id % 3 AS INTEGER)
                   WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
                 CAST(16 + doc_id % 64 AS INTEGER) AS width,
                 CAST(16 + (doc_id * 7) % 64 AS INTEGER) AS height,
                 text
          FROM documents
        )
        SELECT
          doc_id,
          kind,
          CAST(ceil(width / 2.0) AS INTEGER) AS out_width,
          CAST(ceil(height / 2.0) AS INTEGER) AS out_height,
          CAST(length(text) AS INTEGER) AS orig_bytes,
          CAST(ceil(length(text) / {RESIZE_STRIDE}.0) AS INTEGER) AS resized_bytes,
          md5(array_to_string(list_transform(
            range(0, CAST(ceil(length(text) / {RESIZE_STRIDE}.0) AS BIGINT)),
            i -> substring(text, CAST(i * {RESIZE_STRIDE} + 1 AS INT), 1)), ''))
            AS resized_md5
        FROM m
    """,
)
def q82_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize/downsample stub over binary media columns (mapInPandas).

    A real deployment would decode and resample pixels/samples here; the
    stub's deterministic fake keeps every {RESIZE_STRIDE}-th byte (numpy
    stride slice — the vectorized shape a real resampler inherits) and
    halves the declared dimensions, so the ENTIRE pandas-UDF path — binary
    through Arrow, metadata struct math, fixed-width output schema — is
    value-checked by the SQL oracle (the corpus is ASCII: byte and char
    strides coincide, like q81).
    """
    import hashlib

    import numpy as np
    import pandas as pd

    corpus = _media_corpus(spark, sf_dir).select(
        "doc_id", "media", F.col("meta.kind").alias("kind"),
        F.col("meta.width").alias("width"), F.col("meta.height").alias("height"),
    )

    def resize(batches):
        for pdf in batches:
            rows = []
            for doc_id, media, kind, width, height in zip(
                pdf["doc_id"], pdf["media"], pdf["kind"], pdf["width"], pdf["height"]
            ):
                raw = np.frombuffer(bytes(media), dtype=np.uint8)
                small = raw[::RESIZE_STRIDE].tobytes()
                rows.append(
                    {
                        "doc_id": doc_id,
                        "kind": kind,
                        "out_width": -(-int(width) // 2),
                        "out_height": -(-int(height) // 2),
                        "orig_bytes": len(raw),
                        "resized_bytes": len(small),
                        "resized_md5": hashlib.md5(small).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows)

    return corpus.mapInPandas(resize, _RESIZE_SCHEMA)
