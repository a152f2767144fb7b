"""Multimodal column conventions: opaque ``BINARY`` content + typed
metadata struct (SURVEY.md §7.7).

Schema convention for multimodal tables:

    content BINARY,
    meta STRUCT<mime: STRING, n_bytes: BIGINT, source: STRING>

Loading real media uses ``spark.read.format("binaryFile")`` (path,
modificationTime, length, content). Decode / feature-extraction run
as Arrow-batched ``mapInPandas`` over the binary column — the
image/audio libraries are not available in this container, so the
decode kernel is STUBBED (raises NotImplementedError) while the
Spark-side plumbing (schema, batching, partitioning) is real and
tested with a deterministic fake extractor.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def text_to_binary_content(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adapter: treat document text bytes as opaque binary content
    with the standard meta struct (stands in for real media here)."""
    content = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("content", content).withColumn(
        "meta",
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(content).cast("bigint").alias("n_bytes"),
            F.col("source").alias("source"),
        ),
    )


def _find_pil():
    """PIL detection, cached at first use (not import time, so a
    test can monkeypatch ``importlib`` behavior deterministically)."""
    import importlib.util

    return importlib.util.find_spec("PIL") is not None


_HAS_PIL: bool | None = None


def has_pil() -> bool:
    global _HAS_PIL
    if _HAS_PIL is None:
        _HAS_PIL = _find_pil()
    return _HAS_PIL


def decode_image(content: bytes) -> object:
    """Decode image bytes to an ``ndarray`` (H × W [× C], uint8).

    Auto-detects PIL: when it is importable (a real cluster with
    imaging libs baked in) the decode is real; otherwise this raises
    ``NotImplementedError`` — deliberately loud, so a pipeline that
    NEEDS decoding fails fast instead of producing fake features.
    The Spark-side contract either way: bytes in → decoded array
    out; plumbing tests use ``fake_feature_extract``, which never
    decodes.
    """
    if has_pil():
        import io

        import numpy as np
        from PIL import Image

        with Image.open(io.BytesIO(content)) as img:
            return np.asarray(img)
    raise NotImplementedError(
        "image decode requires an imaging library not present in this "
        "environment; use fake_feature_extract for plumbing tests"
    )


def pil_resize_kernel(blob: bytes, width: int, height: int) -> bytes:
    """Real resize kernel for :func:`resize_images` (``kernel=``):
    decode → grayscale → bilinear resize → raw bytes, exactly
    ``width*height`` per image (same output contract as the
    environment stub). Requires PIL — opt-in by passing it
    explicitly; the default stays the stub because the stub accepts
    ARBITRARY bytes (the test corpus is text-as-binary) while a real
    decoder rightly rejects non-images."""
    import io

    from PIL import Image

    with Image.open(io.BytesIO(blob)) as img:
        return img.convert("L").resize((width, height)).tobytes()


def fake_feature_extract(content: bytes, n_features: int = 4) -> list[float]:
    """Deterministic stand-in feature extractor (byte statistics) —
    exercises the exact mapInPandas path a real model/decoder uses."""
    if not content:
        return [0.0] * n_features
    n = len(content)
    return [
        float(n),
        float(sum(content) % 997),
        float(content[0]),
        float(content[-1]),
    ][:n_features]


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_index", LongType()),
        StructField("frame_offset", LongType()),
        StructField("frame_bytes", BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    n_frames: int = 4,
    frame_size: int = 16,
    id_col: str = "doc_id",
    content_col: str = "content",
) -> DataFrame:
    """Frame-sampling plumbing for video-like binary content:
    emit ``n_frames`` evenly spaced fixed-size byte windows per blob
    via Arrow-batched ``mapInPandas`` (one output row per frame).

    A real video pipeline replaces the byte-window slicer with a
    container-aware keyframe decoder (not available in this
    container); the Spark-side contract — binary in, exploded typed
    frame rows out, partition-parallel — is exactly this.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_index": [], "frame_offset": [], "frame_bytes": []}
            for doc_id, blob in zip(pdf[id_col], pdf[content_col]):
                blob = bytes(blob or b"")
                stride = max(1, (max(len(blob) - frame_size, 0)) // max(n_frames - 1, 1))
                for i in range(n_frames):
                    off = min(i * stride, max(len(blob) - frame_size, 0))
                    rows["doc_id"].append(doc_id)
                    rows["frame_index"].append(i)
                    rows["frame_offset"].append(off)
                    rows["frame_bytes"].append(blob[off : off + frame_size])
            yield pd.DataFrame(rows)

    return df.select(id_col, content_col).mapInPandas(run, FRAME_SCHEMA)


def extract_features(
    df: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "content",
    batch_extractor=None,
) -> DataFrame:
    """Arrow-batched feature extraction over binary content.

    ``mapInPandas`` streams record batches through Python once —
    partition-parallel, no row-at-a-time serde. The extractor runs
    per batch; default is the deterministic fake (real decoders plug
    in unchanged).
    """
    extractor = batch_extractor or (
        lambda blobs: [fake_feature_extract(b) for b in blobs]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = extractor(list(pdf[content_col]))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "mime": pdf["mime"],
                    "n_bytes": pdf["n_bytes"],
                    "features": feats,
                }
            )

    flat = df.select(
        F.col(id_col),
        F.col(content_col),
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"),
    )
    return flat.mapInPandas(run, FEATURE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("content", BinaryType()),
    ]
)


def _fake_resize(blob: bytes, width: int, height: int) -> bytes:
    """Deterministic environment stub for the resize kernel: emit
    exactly ``width*height`` bytes by striding/cycling the source
    blob (no imaging library in this container). Replaced wholesale
    by a real decoder+resampler via ``kernel=``."""
    target = width * height
    if not blob:
        return b"\x00" * target
    reps = -(-target // len(blob))
    return (bytes(blob) * reps)[:target]


def resize_images(
    df: DataFrame,
    width: int = 8,
    height: int = 8,
    id_col: str = "doc_id",
    content_col: str = "content",
    kernel=None,
) -> DataFrame:
    """Resize plumbing for image-like binary content via
    Arrow-batched ``mapInPandas``: binary in, fixed-dimension binary
    out, one row per input, partition-parallel with no shuffle. The
    default kernel is the deterministic environment stub (see
    ``decode_image`` — no imaging library in this container); a real
    pipeline passes ``kernel=lambda blob, w, h: ...`` wrapping
    PIL/libvips and the Spark-side contract is unchanged. If PIL is
    ever present, ``kernel=pil_resize_kernel``-style adapters slot
    in without touching the plan shape."""
    resize = kernel or _fake_resize

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [], "content": []}
            for doc_id, blob in zip(pdf[id_col], pdf[content_col]):
                out["doc_id"].append(doc_id)
                out["width"].append(width)
                out["height"].append(height)
                out["content"].append(resize(bytes(blob or b""), width, height))
            yield pd.DataFrame(out)

    return df.select(id_col, content_col).mapInPandas(run, RESIZE_SCHEMA)
