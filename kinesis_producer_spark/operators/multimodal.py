"""Multimodal (image/audio/video) column handling.

Design for binary-media corpora at 100 TB:
- media is an opaque ``binary`` column + a typed metadata struct,
  ingested via ``spark.read.format("binaryFile")`` (or any source
  producing bytes);
- decode / feature-extraction / resize / frame-sampling run as
  Arrow-batched ``mapInPandas`` stages so media bytes stream through
  executors in columnar batches and never concentrate on the driver;
- partitioning: media rows are *fat* — size-based repartition (bytes
  per partition, not rows) keeps task memory bounded.

The actual codec work (PIL/ffmpeg/soundfile) is NOT in this image, so
decoders are stubbed: ``decode_stub='fail'`` raises
NotImplementedError listing the real dependency; ``'fake'`` produces a
deterministic fake decode so the full Spark plumbing (schema, batch
shape, partitioning) is testable end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("magic_hex", T.StringType()),
        T.StructField("media_type", T.StringType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

_MAGIC = {
    b"\x89PNG": "image/png",
    b"\xff\xd8\xff": "image/jpeg",
    b"RIFF": "audio/wav",
    b"OggS": "audio/ogg",
}


def _sniff(blob: bytes) -> str:
    for magic, mtype in _MAGIC.items():
        if blob[: len(magic)] == magic:
            return mtype
    return "application/octet-stream"


def extract_metadata(df: DataFrame, id_col: str = "media_id", content_col: str = "content") -> DataFrame:
    """Size / digest / magic sniff per media blob (mapInPandas stage)."""
    src = df.select(F.col(id_col).alias("media_id"), F.col(content_col).alias("_blob"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["_blob"]):
                b = bytes(blob) if blob is not None else b""
                rows.append(
                    {
                        "media_id": mid,
                        "n_bytes": len(b),
                        "content_md5": hashlib.md5(b).hexdigest(),
                        "magic_hex": b[:4].hex(),
                        "media_type": _sniff(b),
                    }
                )
            yield pd.DataFrame(rows, columns=MEDIA_META_SCHEMA.fieldNames())

    return src.mapInPandas(run, MEDIA_META_SCHEMA)


def decode_media(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    decode_stub: str = "fail",
    feature_dim: int = 8,
) -> DataFrame:
    """Decode + featurize media blobs.

    ``decode_stub='fail'`` — the honest mode: raises at execution time
    because the codec libraries (PIL / ffmpeg / librosa) are not
    installed here; the Spark plan, schema and batch plumbing are real.
    ``'fake'`` — deterministic md5-seeded pseudo-decode for tests.
    """
    if decode_stub not in ("fail", "fake"):
        raise ValueError("decode_stub must be 'fail' or 'fake'")
    src = df.select(F.col(id_col).alias("media_id"), F.col(content_col).alias("_blob"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["_blob"]):
                if decode_stub == "fail":
                    raise NotImplementedError(
                        "media decode requires PIL/ffmpeg/soundfile — not in this image; "
                        "use decode_stub='fake' for plumbing tests"
                    )
                b = bytes(blob) if blob is not None else b""
                h = hashlib.md5(b).digest()
                rows.append(
                    {
                        "media_id": mid,
                        "width": 1 + h[0],
                        "height": 1 + h[1],
                        "n_channels": 1 + h[2] % 4,
                        "feature": [float(x) / 255.0 for x in h[:feature_dim]],
                    }
                )
            yield pd.DataFrame(rows, columns=DECODED_SCHEMA.fieldNames())

    return src.mapInPandas(run, DECODED_SCHEMA)


def repartition_by_bytes(
    df: DataFrame, content_col: str = "content", target_bytes: int = 128 * 1024 * 1024
) -> DataFrame:
    """Size-aware repartition: media rows are fat, so balance partitions
    by cumulative byte size rather than row count."""
    total = df.select(F.sum(F.length(F.col(content_col)))).collect()[0][0] or 0
    n = max(1, int(total / target_bytes))
    return df.repartition(n)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("resized", T.BinaryType()),
    ]
)

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def resize_media(
    df: DataFrame,
    width: int = 64,
    height: int = 64,
    id_col: str = "media_id",
    content_col: str = "content",
    decode_stub: str = "fail",
) -> DataFrame:
    """Resize stage: one output row per media blob.

    Real implementation needs PIL (not in this image) — ``'fail'``
    raises with the dependency name; ``'fake'`` emits a deterministic
    md5-stretched byte payload so the Arrow batch plumbing is tested."""
    if decode_stub not in ("fail", "fake"):
        raise ValueError("decode_stub must be 'fail' or 'fake'")
    src = df.select(F.col(id_col).alias("media_id"), F.col(content_col).alias("_blob"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["_blob"]):
                if decode_stub == "fail":
                    raise NotImplementedError(
                        "media resize requires PIL — not in this image; "
                        "use decode_stub='fake' for plumbing tests"
                    )
                b = bytes(blob) if blob is not None else b""
                h = hashlib.md5(b).digest()
                payload = (h * (width * height // len(h) + 1))[: width * height]
                rows.append(
                    {"media_id": mid, "width": width, "height": height, "resized": payload}
                )
            yield pd.DataFrame(rows, columns=RESIZED_SCHEMA.fieldNames())

    return src.mapInPandas(run, RESIZED_SCHEMA)


def sample_frames(
    df: DataFrame,
    every_n: int = 4,
    max_frames: int = 8,
    id_col: str = "media_id",
    content_col: str = "content",
    decode_stub: str = "fail",
) -> DataFrame:
    """Frame-sampling stage: one output row per sampled frame — a
    row-multiplying mapInPandas (the video analogue of explode).

    ``'fake'`` derives a deterministic frame count from the blob digest
    and keeps every ``every_n``-th frame up to ``max_frames``."""
    if decode_stub not in ("fail", "fake"):
        raise ValueError("decode_stub must be 'fail' or 'fake'")
    src = df.select(F.col(id_col).alias("media_id"), F.col(content_col).alias("_blob"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["_blob"]):
                if decode_stub == "fail":
                    raise NotImplementedError(
                        "frame sampling requires ffmpeg — not in this image; "
                        "use decode_stub='fake' for plumbing tests"
                    )
                b = bytes(blob) if blob is not None else b""
                h = hashlib.md5(b)
                n_frames = 1 + h.digest()[0]
                for idx in range(0, min(n_frames, every_n * max_frames), every_n):
                    fh = hashlib.md5(h.digest() + idx.to_bytes(4, "big")).hexdigest()
                    rows.append({"media_id": mid, "frame_idx": idx, "frame_md5": fh})
            yield pd.DataFrame(rows, columns=FRAMES_SCHEMA.fieldNames())

    return src.mapInPandas(run, FRAMES_SCHEMA)
