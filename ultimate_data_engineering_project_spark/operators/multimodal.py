"""Multimodal column plumbing (SURVEY.md X5; driver contract
'multimodal columns').

Design for 100 TB: hot tables carry *pointers* (path, byte offsets,
typed metadata) plus optionally small binary payloads; heavy decode
runs as Arrow-batched ``mapInPandas`` so each task streams batches
without materializing a partition.  The image/audio codecs are not in
this container, so the decode kernel is STUBBED (deterministic fake
derived from the bytes) behind the real Spark plumbing — schema,
partitioning, UDF signature, and batch shape are production-real; only
the innermost decode call swaps out.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

# typed metadata for an opaque media blob
MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image/audio/video
        T.StructField("format", T.StringType()),      # png/jpeg/wav/...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_DIM = 16

_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_sha", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def attach_fake_binary(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Test affordance: derive an opaque binary column + metadata from a
    text column (the fixtures carry no real media).  In production this
    column comes from ``spark.read.format('binaryFile')`` or pointer
    joins against an object store."""
    return df.withColumn("media_bytes", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "media_meta",
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("fake").alias("format"),
            F.lit(64).cast("int").alias("width"),
            F.lit(64).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ),
    )


try:  # real image decode when Pillow is available in the environment
    from PIL import Image as _PILImage  # pragma: no cover - not in container
except ImportError:  # container has no codecs; use deterministic fallback
    _PILImage = None


def _decode_kernel(buf: bytes, use_pil: bool = True) -> list[float]:
    """Decode+featurize one blob.

    When Pillow is importable (and ``use_pil``) the bytes are decoded as
    an image and featurized as a FEATURE_DIM-bin grayscale histogram (a
    real, if simple, content feature).  Otherwise — this container ships
    no codecs — a deterministic fallback derived from the sha256 digest
    keeps the Spark plumbing (schema, Arrow batching, partitioning)
    fully exercised, test-stable, AND external-engine-verifiable (the
    ``multimodal_decode_features`` oracle reproduces it in SQL,
    float32 rounding included).
    """
    import hashlib

    if use_pil and _PILImage is not None:
        import io

        try:
            with _PILImage.open(io.BytesIO(buf)) as img:
                gray = img.convert("L")
                hist = gray.histogram()  # 256 bins
                step = 256 // FEATURE_DIM
                total = float(sum(hist)) or 1.0
                return [
                    sum(hist[i * step : (i + 1) * step]) / total
                    for i in range(FEATURE_DIM)
                ]
        except Exception:
            pass  # non-image bytes fall through to the stable fallback

    digest = hashlib.sha256(buf).digest()
    return [digest[i] / 255.0 for i in range(FEATURE_DIM)]


def decode_features(
    df: DataFrame,
    id_col: str = "doc_id",
    bytes_col: str = "media_bytes",
    kernel: str = "auto",
) -> DataFrame:
    """Arrow-batched decode/feature-extraction over binary media
    (mapInPandas: the executor streams record batches; Python touches
    only (id, bytes) after JVM-side column pruning).

    ``kernel='auto'`` decodes real images when Pillow is available and
    falls back to the deterministic sha256 featurizer otherwise;
    ``kernel='fallback'`` pins the deterministic featurizer regardless
    of environment (what the oracle-checked catalog entry uses, so its
    result does not depend on installed codecs)."""
    id_name, bytes_name = id_col, bytes_col
    use_pil = kernel == "auto"
    # output schema keeps the CALLER's id column (name AND type) — a
    # hardcoded doc_id:long would silently rename an alt id column and
    # crash at the Arrow boundary for string ids (the pq_encode pattern)
    schema = T.StructType(
        [T.StructField(id_col, df.schema[id_col].dataType)]
        + list(_DECODED_SCHEMA.fields[1:])
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            blobs = pdf[bytes_name]
            yield pd.DataFrame(
                {
                    id_name: pdf[id_name],
                    "n_bytes": blobs.map(len).astype("int64"),
                    "content_sha": blobs.map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                    "feature": blobs.map(
                        lambda b: _decode_kernel(bytes(b), use_pil=use_pil)
                    ),
                }
            )

    return df.select(id_col, bytes_col).mapInPandas(batches, schema=schema)


def frame_sample_plan(df: DataFrame, every_ms: int = 1_000) -> DataFrame:
    """Video frame-sampling *plan* (X5): expands each video row into
    frame-timestamp rows JVM-side (sequence+explode); the per-frame
    decode then rides the same mapInPandas kernel.  With no real video
    metadata in the fixtures this documents the plan shape over
    media_meta.duration_ms."""
    return (
        df.filter(F.col("media_meta.duration_ms").isNotNull())
        .withColumn(
            "frame_ms",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.col("media_meta.duration_ms"),
                    F.lit(every_ms).cast("long"),
                )
            ),
        )
    )


_RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("n_bytes_in", T.LongType()),
        T.StructField("thumb_hex", T.StringType()),
    ]
)


def _resize_kernel(buf: bytes, width: int, height: int, use_pil: bool) -> str:
    """Resize one blob to a (width x height) grayscale thumbnail,
    returned as hex.  PIL path: real decode + LANCZOS resize + raw
    luminance bytes.  Fallback (no codecs in this container): a
    deterministic pseudo-thumbnail — sha256(buf ':' counter) digests
    concatenated and truncated to width*height bytes — which keeps the
    plumbing exercised and is reproducible in SQL (printable ':i'
    suffixes because DuckDB's sha256 takes VARCHAR, not BLOB)."""
    import hashlib

    n = width * height
    if use_pil and _PILImage is not None:
        import io

        try:
            with _PILImage.open(io.BytesIO(buf)) as img:
                small = img.convert("L").resize((width, height))
                return bytes(small.getdata()).hex()
        except Exception:
            pass  # non-image bytes fall through to the stable fallback
    out = bytearray()
    i = 0
    while len(out) < n:
        out.extend(hashlib.sha256(buf + f":{i}".encode()).digest())
        i += 1
    return bytes(out[:n]).hex()


def resize_images(
    df: DataFrame,
    id_col: str = "doc_id",
    bytes_col: str = "media_bytes",
    *,
    width: int = 8,
    height: int = 8,
    kernel: str = "auto",
) -> DataFrame:
    """Arrow-batched image RESIZE (X5 — the third leg of the
    decode / feature-extract / resize / frame-sample quartet): each blob
    becomes a fixed-size grayscale thumbnail, hex-encoded.

    Same scale shape as :func:`decode_features` — JVM-side column
    pruning to (id, bytes), mapInPandas streaming record batches, no
    partition materialization; thumbnails are width*height bytes per
    row, so the output is shuffle-light however large the inputs.
    ``kernel='fallback'`` pins the deterministic pseudo-thumbnail (what
    the oracle-checked entry uses); ``'auto'`` does real PIL resizes
    when codecs exist."""
    id_name, bytes_name = id_col, bytes_col
    use_pil = kernel == "auto"
    schema = T.StructType(
        [T.StructField(id_col, df.schema[id_col].dataType)]
        + list(_RESIZED_SCHEMA.fields[1:])
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = pdf[bytes_name]
            yield pd.DataFrame(
                {
                    id_name: pdf[id_name],
                    "out_width": width,
                    "out_height": height,
                    "n_bytes_in": blobs.map(len).astype("int64"),
                    "thumb_hex": blobs.map(
                        lambda b: _resize_kernel(bytes(b), width, height, use_pil)
                    ),
                }
            )

    return df.select(id_col, bytes_col).mapInPandas(batches, schema=schema)
