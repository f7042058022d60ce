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


def pil_decode_available() -> bool:
    """True when Pillow is importable — the same import-gating contract as
    the docling heavy path (pipeline/convert.py): the real decoder runs
    wherever the lib exists, the deterministic stub is the fallback."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def decode_image(raw: bytes) -> dict | None:
    """Real image decode (import-gated): returns {width, height, mode,
    pixels(np.uint8 flat luma)} or None when Pillow is unavailable OR the
    payload is not a decodable image (the synthetic test corpus is text
    bytes, so graded runs always fall back to the stub — results are
    identical with and without Pillow installed)."""
    try:
        import io

        import numpy as np
        from PIL import Image
    except ImportError:
        return None
    try:
        with Image.open(io.BytesIO(raw)) as im:
            gray = im.convert("L")
            return {
                "width": im.width,
                "height": im.height,
                "mode": im.mode,
                "pixels": np.asarray(gray, dtype="uint8").ravel(),
            }
    except Exception:
        return None


def resize_image(raw: bytes, scale: float = 0.5) -> bytes | None:
    """Real image resize (import-gated): re-encoded PNG at `scale`, or None
    when Pillow is unavailable or the payload isn't an image."""
    try:
        import io

        from PIL import Image
    except ImportError:
        return None
    try:
        with Image.open(io.BytesIO(raw)) as im:
            out = im.resize(
                (max(1, int(im.width * scale)), max(1, int(im.height * scale)))
            )
            buf = io.BytesIO()
            out.save(buf, format="PNG")
            return buf.getvalue()
    except Exception:
        return None


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
# q80 — media feature extraction (stubbed decode; hash-graded since r11)
# ---------------------------------------------------------------------------
_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("aspect", T.DoubleType()),
        T.StructField("simpson", T.DoubleType()),
        # The 8-dim feature vector is emitted as scalar columns (not
        # array<float>): the driver's pandas canonicalizer sorts rows by
        # every column and dies on unhashable array cells.
        *[T.StructField(f"f{i}", T.DoubleType()) for i in range(8)],
    ]
)

# Hash-graded since r11 (rows-only r3-r11a): the diversity feature is the
# SIMPSON INDEX (collision probability, sum(count_i^2)/n^2) instead of
# Shannon entropy — same per-document byte-histogram feature role, but its
# arithmetic is integers until ONE correctly-rounded IEEE division, so the
# DuckDB oracle replays it BIT-exactly (entropy's log2 is transcendental:
# numpy's SIMD log2 and libm disagree in the last ulp, which the driver's
# repr()-based float hashing cannot tolerate). Every other column was
# already exact: md5-derived f0..f7 (16-bit windows / 65535.0, one exact
# division), aspect (small-int ratio), ints/strings. Verified 500/500
# bit-identical against DuckDB before the flip; the corpus is ASCII so
# char and byte histograms coincide (the same property q81's oracle uses).
_Q80_ORACLE = f"""
    WITH chars AS (
      SELECT doc_id, substr(text, CAST(i.i + 1 AS INTEGER), 1) AS ch
      FROM documents, UNNEST(range(0, length(text))) AS i(i)
    ), hist AS (
      SELECT doc_id, COUNT(*) AS c FROM chars GROUP BY doc_id, ch
    ), agg AS (
      SELECT doc_id, SUM(c * c) AS ss, SUM(c) AS n FROM hist GROUP BY doc_id
    )
    SELECT
      d.doc_id,
      CASE CAST(d.doc_id % 3 AS INTEGER)
        WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video'
      END AS kind,
      CAST(length(d.text) AS INTEGER) AS n_bytes,
      CAST(16 + d.doc_id % 64 AS DOUBLE)
        / CAST(16 + (d.doc_id * 7) % 64 AS DOUBLE) AS aspect,
      CAST(COALESCE(a.ss, 0) AS DOUBLE)
        / CAST(COALESCE(a.n * a.n, 1) AS DOUBLE) AS simpson,
      {", ".join(
        "CAST(CAST(concat('0x', substr(md5(d.text), "
        f"{4 * i + 1}, 4)) AS INTEGER) AS DOUBLE) / 65535.0 AS f{i}"
        for i in range(8)
      )}
    FROM documents d LEFT JOIN agg a USING (doc_id)
"""
# LEFT JOIN + COALESCE (ADVICE r12): an empty-text document has no char
# rows, so the inner join silently dropped it while the Spark stub still
# emits a row with simpson = 0 (n = max(len, 1)). Safe on today's corpus
# (min length 44) but a corpus change would have turned the grade into a
# row-count mismatch; the LEFT JOIN replays the stub's 0/1 exactly.


@register("q80_media_features", tags=("multimodal", "udf"), oracle=_Q80_ORACLE)
def q80_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract stub over binary media columns.

    Decode is import-gated (decode_image): where Pillow exists AND the
    payload decodes, features come from real pixels (true dims, luma
    histogram Simpson index, 8-bin luma embedding); otherwise the
    deterministic stub (byte-histogram Simpson index, md5-seeded 8-dim
    embedding) keeps the plumbing — binary columns through Arrow, struct
    metadata access, fixed-width feature output — exercised end to end.
    The synthetic corpus is text bytes (never decodable), so graded
    results are identical either way; the oracle (block comment above)
    replays the stub bit-exactly.
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
                decoded = decode_image(raw) if kind == "image" else None
                if decoded is not None:
                    vals = decoded["pixels"]
                    width, height = decoded["width"], decoded["height"]
                else:
                    vals = np.frombuffer(raw, dtype=np.uint8)
                counts = np.bincount(vals, minlength=256)
                n = max(len(vals), 1)
                # integer arithmetic until one exact-rounded division —
                # see the _Q80_ORACLE comment (bit-replicable on purpose)
                ss = int((counts.astype(np.int64) ** 2).sum())
                row = {
                    "doc_id": doc_id,
                    "kind": kind,
                    "n_bytes": len(raw),
                    "aspect": float(width) / float(height),
                    "simpson": ss / (n * n),
                }
                if decoded is not None:
                    # real features: mean luma of 8 equal-width bins
                    bins = counts.reshape(8, 32).sum(axis=1) / n
                    for i in range(8):
                        row[f"f{i}"] = float(bins[i])
                else:
                    digest = hashlib.md5(raw).digest()
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
    ).where(
        # n_frames = 0 (empty payload) must emit NO frames: sequence(0, -1)
        # is DESCENDING in Spark ([0, -1]) and would emit a spurious frame 0
        # where the oracle's range(0, 0) is empty (q113 lesson).
        F.col("n_frames") > 0
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

    Resize is import-gated (resize_image): where Pillow exists AND the
    payload decodes, the real resampler re-encodes at half scale;
    otherwise the deterministic stub keeps every {RESIZE_STRIDE}-th byte
    (numpy stride slice — the vectorized shape a real resampler inherits)
    and halves the declared dimensions. The synthetic corpus is text bytes
    (never decodable), so the SQL oracle value-checks the ENTIRE
    pandas-UDF path — binary through Arrow, metadata struct math,
    fixed-width output schema — identically with and without Pillow (the
    corpus is ASCII: byte and char strides coincide, like q81).
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
                real = resize_image(bytes(media)) if kind == "image" else None
                if real is not None:
                    decoded = decode_image(real)
                    small = real
                    out_w = decoded["width"] if decoded else -(-int(width) // 2)
                    out_h = decoded["height"] if decoded else -(-int(height) // 2)
                else:
                    small = raw[::RESIZE_STRIDE].tobytes()
                    out_w = -(-int(width) // 2)
                    out_h = -(-int(height) // 2)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "kind": kind,
                        "out_width": out_w,
                        "out_height": out_h,
                        "orig_bytes": len(raw),
                        "resized_bytes": len(small),
                        "resized_md5": hashlib.md5(small).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows)

    return corpus.mapInPandas(resize, _RESIZE_SCHEMA)


# ---------------------------------------------------------------------------
# q281 — exact media dedup by content digest (binary-column governance)
# ---------------------------------------------------------------------------
# The first pass of every media pipeline: identical blobs (re-uploads,
# mirrored crawls) collapse by full-content digest before any expensive
# decode runs. Digest = md5 over the BINARY column (computed JVM-side /
# engine-native — the bytes never reach Python), keeper = lowest doc_id
# (q40's deterministic-survivor rule), and duplicate groups are
# flagged (every group is emitted so the audit is non-vacuous at any
# corpus scale). At 100 TB the digest is computed once at ingest and this
# becomes a pure hash-aggregate on stored metadata.
@register(
    "q281_media_content_dedup",
    tags=("multimodal", "dedup", "binary"),
    oracle="""
        -- DuckDB's md5 takes VARCHAR; the synthetic blobs are ASCII text
        -- bytes (module docstring), so digest/size over the text equal
        -- digest/size over the binary the Spark side hashes
        WITH blobs AS (
          SELECT doc_id, text AS media FROM documents
        ),
        groups AS (
          SELECT md5(media) AS digest,
                 CAST(octet_length(encode(media)) AS BIGINT) AS n_bytes,
                 CAST(COUNT(*) AS BIGINT) AS n_copies,
                 CAST(MIN(doc_id) AS BIGINT) AS keeper_doc,
                 CAST(SUM(CAST(octet_length(encode(media)) AS BIGINT))
                      - MIN(CAST(octet_length(encode(media)) AS BIGINT))
                   AS BIGINT) AS reclaimable_bytes
          FROM blobs GROUP BY md5(media), octet_length(encode(media))
        )
        SELECT digest, n_bytes, n_copies, keeper_doc, reclaimable_bytes,
               CASE WHEN n_copies >= 2 THEN 1 ELSE 0 END AS is_duplicate
        FROM groups
    """,
)
def q281_media_content_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate media groups by full-content md5 over the binary
    column, with deterministic keeper and reclaimable-byte accounting
    (see block comment)."""
    docs = load_table(spark, sf_dir, "documents")
    blobs = docs.select(
        "doc_id", F.encode("text", "utf-8").alias("media")
    )
    groups = blobs.groupBy(
        F.md5("media").alias("digest"),
        F.length("media").cast("bigint").alias("n_bytes"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_copies"),
        F.min("doc_id").cast("bigint").alias("keeper_doc"),
        (
            F.sum(F.length("media").cast("bigint"))
            - F.min(F.length("media").cast("bigint"))
        ).cast("bigint").alias("reclaimable_bytes"),
    )
    return groups.selectExpr(
        "digest",
        "n_bytes",
        "n_copies",
        "keeper_doc",
        "reclaimable_bytes",
        "CASE WHEN n_copies >= 2 THEN 1 ELSE 0 END AS is_duplicate",
    )


# ---------------------------------------------------------------------------
# q282 — stride-signature near-dup candidates for media blobs
# ---------------------------------------------------------------------------
# Exact digests miss blobs that differ in a few bytes (re-encodes,
# trailing metadata). The cheap scalable candidate generator samples the
# binary at fixed offsets — a stride signature (here: 4 × 8-byte windows
# at proportional offsets, hashed together) — and buckets blobs by
# signature: same signature → near-dup candidate group, verified
# downstream (q43's candidate→verify ladder, in the binary domain). The
# windows are substring-on-binary: JVM-side, no byte ever copied to
# Python; a candidate group is REAL when it holds ≥2 distinct digests
# (else it's q281's exact group again) — both counts are emitted.
@register(
    "q282_media_stride_signature",
    tags=("multimodal", "neardedup", "binary"),
    oracle="""
        -- ASCII blobs: char-offset windows over the text equal the
        -- byte-offset windows the Spark side takes on the binary
        WITH blobs AS (
          SELECT doc_id, text AS media,
                 CAST(octet_length(encode(text)) AS BIGINT) AS n
          FROM documents
        ),
        sigs AS (
          SELECT doc_id, md5(media) AS digest,
                 md5(concat(
                   substring(media, 1, 8),
                   substring(media, CAST(n // 4 AS INTEGER) + 1, 8),
                   substring(media, CAST(n // 2 AS INTEGER) + 1, 8),
                   substring(media, CAST((3 * n) // 4 AS INTEGER) + 1, 8)
                 )) AS sig
          FROM blobs
        ),
        groups AS (
          SELECT sig,
                 CAST(COUNT(*) AS BIGINT) AS n_blobs,
                 CAST(COUNT(DISTINCT digest) AS BIGINT) AS n_distinct,
                 CAST(MIN(doc_id) AS BIGINT) AS sample_doc
          FROM sigs GROUP BY sig
        )
        SELECT sig, n_blobs, n_distinct, sample_doc,
               CASE WHEN n_blobs >= 2 THEN 1 ELSE 0 END AS candidate_group,
               CASE WHEN n_distinct >= 2 THEN 1 ELSE 0 END AS near_dup_group
        FROM groups
    """,
)
def q282_media_stride_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stride-sampled binary signatures over all media blobs, flagging
    candidate groups (≥2 blobs) and true near-dup groups (≥2 distinct
    exact digests) — see block comment."""
    docs = load_table(spark, sf_dir, "documents")
    blobs = docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("media"),
        F.length(F.encode("text", "utf-8")).cast("bigint").alias("n"),
    )
    sigs = blobs.selectExpr(
        "doc_id",
        "md5(media) AS digest",
        "md5(concat("
        " substring(media, 1, 8),"
        " substring(media, CAST(n div 4 AS INT) + 1, 8),"
        " substring(media, CAST(n div 2 AS INT) + 1, 8),"
        " substring(media, CAST((3 * n) div 4 AS INT) + 1, 8))) AS sig",
    )
    groups = sigs.groupBy("sig").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_blobs"),
        F.countDistinct("digest").cast("bigint").alias("n_distinct"),
        F.min("doc_id").cast("bigint").alias("sample_doc"),
    )
    return groups.selectExpr(
        "sig",
        "n_blobs",
        "n_distinct",
        "sample_doc",
        "CASE WHEN n_blobs >= 2 THEN 1 ELSE 0 END AS candidate_group",
        "CASE WHEN n_distinct >= 2 THEN 1 ELSE 0 END AS near_dup_group",
    )
