"""Multimodal column conventions: opaque ``BINARY`` content + typed
metadata struct (SURVEY.md §7.7).

Schema convention for multimodal tables:

    content BINARY,
    meta STRUCT<mime: STRING, n_bytes: BIGINT, source: STRING>

Loading real media uses ``spark.read.format("binaryFile")`` (path,
modificationTime, length, content). Decode / feature-extraction run
as Arrow-batched ``mapInPandas`` over the binary column. The decode
kernels are REAL for netpbm (P5/P6), uncompressed 24-bit BMP, 8-bit
non-interlaced PNG (stdlib zlib inflate + all five scanline
filters; encoder twin ``png_from_array``), and PCM RIFF/WAVE audio
— pure-Python parsers of the public format layouts,
dependency-free — with images routing other formats to PIL
when importable; only unknown formats without a library raise
``NotImplementedError`` (loud by design). The Spark-side plumbing
(schema, batching, partitioning) is additionally tested with a
deterministic fake extractor that never decodes.
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


def decode_ppm(content: bytes):
    """Decode binary PPM (``P6``, RGB) / PGM (``P5``, grayscale)
    bytes to a uint8 ndarray — H×W×3 or H×W. Pure Python + numpy,
    no imaging library: the netpbm header grammar is magic, then
    whitespace/comment-separated width, height, maxval, then exactly
    one whitespace byte before the raster (netpbm format spec).
    Only maxval <= 255 (1-byte samples) is supported."""
    import numpy as np

    if content[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PPM/PGM (magic P5/P6)")
    channels = 3 if content[:2] == b"P6" else 1
    pos, fields = 2, []
    while len(fields) < 3:
        if pos >= len(content):
            raise ValueError("truncated netpbm header")
        c = content[pos]
        if c in b" \t\r\n":
            pos += 1
        elif c == ord("#"):
            nl = content.find(b"\n", pos)
            pos = len(content) if nl < 0 else nl + 1
        elif chr(c).isdigit():
            start = pos
            while pos < len(content) and chr(content[pos]).isdigit():
                pos += 1
            fields.append(int(content[start:pos]))
        else:
            raise ValueError(f"bad netpbm header byte {c!r}")
    width, height, maxval = fields
    if not 0 < maxval <= 255:
        raise ValueError(f"unsupported netpbm maxval {maxval}")
    pos += 1  # the single whitespace byte after maxval
    n = width * height * channels
    raster = content[pos : pos + n]
    if len(raster) != n:
        raise ValueError(f"netpbm raster: want {n} bytes, got {len(raster)}")
    arr = np.frombuffer(raster, dtype=np.uint8)
    return arr.reshape((height, width, 3) if channels == 3 else (height, width))


def decode_bmp(content: bytes):
    """Decode an uncompressed 24-bit Windows BMP (``BM`` +
    BITMAPINFOHEADER) to an H×W×3 uint8 RGB ndarray. Pure Python +
    numpy from the public format layout: 14-byte file header with
    the pixel-data offset at byte 10; 40-byte info header with
    width/height/bpp; rows stored bottom-up (negative height =
    top-down), BGR order, each row padded to 4 bytes."""
    import struct

    import numpy as np

    if content[:2] != b"BM" or len(content) < 54:
        raise ValueError("not a BMP (magic BM + 54-byte headers)")
    (data_offset,) = struct.unpack_from("<I", content, 10)
    header_size, width, height = struct.unpack_from("<Iii", content, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", content, 26)
    if header_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP (headerSize={header_size}, bpp={bpp}, "
            f"compression={compression}); only uncompressed 24-bit"
        )
    top_down = height < 0
    height = abs(height)
    row_bytes = (width * 3 + 3) & ~3
    n = row_bytes * height
    raster = content[data_offset : data_offset + n]
    if len(raster) != n:
        raise ValueError(f"BMP raster: want {n} bytes, got {len(raster)}")
    rows = np.frombuffer(raster, dtype=np.uint8).reshape(height, row_bytes)
    bgr = rows[:, : width * 3].reshape(height, width, 3)
    if not top_down:
        bgr = bgr[::-1]
    return bgr[:, :, ::-1].copy()  # BGR → RGB


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color type → samples/px


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (RFC 2083 §6.6): nearest of left/up/
    up-left to the linear estimate a + b - c, ties a → b → c."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(content: bytes):
    """Decode an 8-bit non-interlaced PNG to a uint8 ndarray — H×W
    (grayscale), H×W×2 (gray+alpha), H×W×3 (RGB, incl. paletted),
    or H×W×4 (RGBA). Pure Python + stdlib ``zlib`` + numpy from the
    public format layout (RFC 2083): signature, length-prefixed
    chunks (IHDR geometry, PLTE palette, concatenated IDAT deflate
    stream, IEND), then per-scanline unfiltering of the five filter
    types (None/Sub/Up/Average/Paeth). Chunk CRCs are not verified —
    decode integrity, not transport, is this kernel's contract.
    Sub/Average/Paeth unfilter sequentially along the row (inherent
    data dependence — this is a per-image kernel inside an
    Arrow-batched worker, not a Spark-side loop)."""
    import struct
    import zlib

    import numpy as np

    if content[:8] != _PNG_SIG:
        raise ValueError("not a PNG (8-byte signature)")
    pos, ihdr, plte, idat = 8, None, None, bytearray()
    while pos + 8 <= len(content):
        (length,) = struct.unpack_from(">I", content, pos)
        ctype = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        pos += 12 + length  # data + 4-byte CRC
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    width, height, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG (depth={depth}, compression={comp}, "
            f"interlace={interlace}); only 8-bit non-interlaced"
        )
    channels = _PNG_CHANNELS.get(color_type)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {color_type}")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError(
            f"PNG raster: want {(stride + 1) * height} filtered bytes, "
            f"got {len(raw)}"
        )
    out = bytearray(stride * height)
    prev = bytearray(stride)
    bpp = channels
    rpos = 0
    for y in range(height):
        f = raw[rpos]
        line = bytearray(raw[rpos + 1 : rpos + 1 + stride])
        rpos += 1 + stride
        if f == 0:
            pass
        elif f == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                c = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter byte {f}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    arr = np.frombuffer(bytes(out), dtype=np.uint8)
    if color_type == 3:
        if plte is None or len(plte) % 3:
            raise ValueError("paletted PNG missing/malformed PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = arr.reshape(height, width)
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("PNG palette index out of range")
        return pal[idx]
    if channels == 1:
        return arr.reshape(height, width)
    return arr.reshape(height, width, channels)


def png_from_array(arr, row_filters=None) -> bytes:
    """Encode a uint8 ndarray (H×W gray or H×W×{2,3,4}) as a REAL
    8-bit non-interlaced PNG — the packing twin of
    :func:`decode_png` (same role as ``wav_from_samples`` for the
    audio tier). ``row_filters`` optionally pins the filter byte per
    scanline (int or per-row list from {0..4}); default None filters
    everything with 0. Exercising all five forward filters and
    decoding back proves the unfilter paths, not just the happy
    None-filter case."""
    import struct
    import zlib

    import numpy as np

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        height, width, channels = a.shape[0], a.shape[1], 1
    elif a.ndim == 3 and a.shape[2] in (2, 3, 4):
        height, width, channels = a.shape
    else:
        raise ValueError(f"unsupported array shape {a.shape}")
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    if row_filters is None:
        row_filters = [0] * height
    elif isinstance(row_filters, int):
        row_filters = [row_filters] * height
    if len(row_filters) != height:
        raise ValueError("row_filters length != image height")
    stride = width * channels
    flat = a.reshape(height, stride)
    body = bytearray()
    prev = bytes(stride)
    for y in range(height):
        f = int(row_filters[y])
        cur = flat[y].tobytes()
        if f == 0:
            enc = cur
        elif f == 1:
            enc = bytes(
                (cur[i] - (cur[i - channels] if i >= channels else 0))
                & 0xFF
                for i in range(stride)
            )
        elif f == 2:
            enc = bytes((cur[i] - prev[i]) & 0xFF for i in range(stride))
        elif f == 3:
            enc = bytes(
                (
                    cur[i]
                    - (
                        ((cur[i - channels] if i >= channels else 0)
                         + prev[i])
                        >> 1
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        elif f == 4:
            enc = bytes(
                (
                    cur[i]
                    - _paeth(
                        cur[i - channels] if i >= channels else 0,
                        prev[i],
                        prev[i - channels] if i >= channels else 0,
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        else:
            raise ValueError(f"bad PNG filter {f}")
        body.append(f)
        body += enc
        prev = cur

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(
            ">I", crc
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(body), 6))
        + chunk(b"IEND", b"")
    )


def decode_image(content: bytes) -> object:
    """Decode image bytes to an ``ndarray`` (H × W [× C], uint8).

    Format routing by magic bytes: netpbm ``P5``/``P6`` and
    uncompressed 24-bit ``BM`` decode with the built-in pure-Python
    kernels above (no dependencies — real decodes in any
    environment); anything else falls through to PIL when importable
    (a real cluster with imaging libs baked in), and otherwise raises
    ``NotImplementedError`` — deliberately loud, so a pipeline that
    NEEDS e.g. JPEG fails fast instead of producing fake features.
    The Spark-side contract either way: bytes in → decoded array
    out; ``decoded_feature_extract`` is the batch adapter."""
    content = bytes(content or b"")
    if content[:2] in (b"P5", b"P6"):
        return decode_ppm(content)
    if content[:2] == b"BM":
        return decode_bmp(content)
    if content[:8] == _PNG_SIG:
        return decode_png(content)
    if has_pil():
        import io

        import numpy as np
        from PIL import Image

        with Image.open(io.BytesIO(content)) as img:
            return np.asarray(img)
    raise NotImplementedError(
        "unknown image format (not netpbm/BMP) and no imaging library "
        "in this environment; use fake_feature_extract for plumbing tests"
    )


def decoded_feature_extract(blobs) -> list[list[float]]:
    """Batch extractor for :func:`extract_features` that REALLY
    decodes (``decode_image``) and emits geometry + intensity
    features per image: [height, width, channels, mean, min, max].
    Deterministic — pixel statistics of the decoded raster."""
    out = []
    for blob in blobs:
        arr = decode_image(bytes(blob or b""))
        channels = 1 if arr.ndim == 2 else arr.shape[2]
        out.append(
            [
                float(arr.shape[0]),
                float(arr.shape[1]),
                float(channels),
                float(arr.mean()),
                float(arr.min()),
                float(arr.max()),
            ]
        )
    return out


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


def decode_resize_kernel(blob: bytes, width: int, height: int) -> bytes:
    """Real resize kernel for :func:`resize_images` on decodable
    formats (netpbm/BMP, or anything PIL handles): decode via
    :func:`decode_image`, collapse to grayscale, nearest-neighbor
    resample to exactly ``width*height`` bytes — same output
    contract as the environment stub, but actual pixels."""
    import numpy as np

    arr = decode_image(blob)
    gray = (
        arr.astype(np.uint16).mean(axis=2).astype(np.uint8)
        if arr.ndim == 3
        else arr
    )
    rows = (np.arange(height) * gray.shape[0]) // height
    cols = (np.arange(width) * gray.shape[1]) // width
    return gray[np.ix_(rows, cols)].tobytes()


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


def wav_from_samples(samples, sample_rate: int = 8000) -> bytes:
    """Build a mono 16-bit PCM WAV blob from integer samples — the
    ingest-side twin of :func:`decode_wav` (and its unit-test
    independent counterpart is the stdlib ``wave`` module)."""
    import struct

    data = b"".join(
        struct.pack("<h", max(-32768, min(32767, int(s)))) for s in samples
    )
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav(content: bytes):
    """Decode a PCM RIFF/WAVE blob to ``(sample_rate, ndarray)`` —
    pure Python + numpy from the public RIFF layout: 12-byte header,
    then even-padded chunks; ``fmt `` gives format/channels/rate/
    bits (PCM 8-bit unsigned or 16-bit signed LE supported),
    ``data`` is the raster. The array is (n_frames,) mono or
    (n_frames, channels)."""
    import struct

    import numpy as np

    if content[:4] != b"RIFF" or content[8:12] != b"WAVE" or len(content) < 44:
        raise ValueError("not a RIFF/WAVE blob")
    pos, fmt, raw = 12, None, None
    while pos + 8 <= len(content):
        cid = content[pos : pos + 4]
        (size,) = struct.unpack_from("<I", content, pos + 4)
        body = content[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
    if fmt is None or raw is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, rate, _bps, _align, bits = fmt
    if audio_format != 1 or bits not in (8, 16) or channels < 1:
        raise ValueError(
            f"unsupported WAV (format={audio_format}, bits={bits}); "
            "only PCM 8/16-bit"
        )
    dtype = np.uint8 if bits == 8 else np.dtype("<i2")
    arr = np.frombuffer(raw[: len(raw) - len(raw) % (channels * bits // 8)],
                        dtype=dtype)
    if channels > 1:
        arr = arr.reshape(-1, channels)
    return rate, arr


def audio_feature_extract(blobs) -> list[list[float]]:
    """Batch extractor for :func:`extract_features` over WAV blobs:
    real decode (:func:`decode_wav`) then deterministic signal
    statistics per blob — [sample_rate, n_frames, channels, rms,
    n_zero_cross]. RMS is sqrt of the exact integer power sum over
    one IEEE division; a zero crossing is a strict sign change
    (negative↔non-negative) between consecutive frames of the first
    channel."""
    import math

    import numpy as np

    out = []
    for blob in blobs:
        rate, arr = decode_wav(bytes(blob or b""))
        channels = 1 if arr.ndim == 1 else arr.shape[1]
        mono = arr if arr.ndim == 1 else arr[:, 0]
        mono = mono.astype(np.int64)
        n = len(mono)
        rms = math.sqrt(float(int((mono * mono).sum())) / n) if n else 0.0
        neg = mono < 0
        zc = int((neg[1:] != neg[:-1]).sum()) if n > 1 else 0
        out.append([float(rate), float(n), float(channels), rms, float(zc)])
    return out


def extract_audio_features(
    df: DataFrame, id_col: str = "doc_id", content_col: str = "content"
) -> DataFrame:
    """Arrow-batched audio feature extraction over WAV binary
    content (:func:`audio_feature_extract` per blob) — the audio
    sibling of :func:`extract_features`: one typed feature row per
    input row, partition-parallel, no shuffle."""
    schema = StructType(
        [
            df.schema[id_col],
            StructField("sample_rate", LongType()),
            StructField("n_frames", LongType()),
            StructField("channels", LongType()),
            StructField("rms", DoubleType()),
            StructField("n_zero_cross", LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = audio_feature_extract(list(pdf[content_col]))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "sample_rate": [int(f[0]) for f in feats],
                    "n_frames": [int(f[1]) for f in feats],
                    "channels": [int(f[2]) for f in feats],
                    "rms": [f[3] for f in feats],
                    "n_zero_cross": [int(f[4]) for f in feats],
                }
            )

    return df.select(id_col, content_col).mapInPandas(run, schema)


# --- Video-like container: indexed frames, selective decode --------
_VID_MAGIC = b"VID0"


def video_from_frames(frames) -> bytes:
    """Pack a list of uint8 ndarrays into an indexed multi-frame
    container — the ingest-side twin of :func:`decode_video_frames`.

    Layout (all integers big-endian u32): ``VID0 | n_frames |
    offset table (one entry per frame, relative to byte 0) | frame
    payloads``, each payload a REAL PNG (:func:`png_from_array`).
    The up-front offset table is the load-bearing property: a reader
    can seek straight to any keyframe without scanning or decoding
    the rest — the contract a real container (MP4 ``stsz``/``stco``,
    MKV cues) provides, and what makes sampled-frame extraction cost
    O(sampled) instead of O(stream)."""
    import struct

    payloads = [
        png_from_array(f, row_filters=i % 5)
        for i, f in enumerate(frames)
    ]
    head_len = 4 + 4 + 4 * len(payloads)
    offs, pos = [], head_len
    for p in payloads:
        offs.append(pos)
        pos += len(p)
    return (
        _VID_MAGIC
        + struct.pack(">I", len(payloads))
        + b"".join(struct.pack(">I", o) for o in offs)
        + b"".join(payloads)
    )


def video_frame_count(content: bytes) -> int:
    import struct

    if content[:4] != _VID_MAGIC or len(content) < 8:
        raise ValueError("not a VID0 container")
    return struct.unpack(">I", content[4:8])[0]


def decode_video_frames(content: bytes, indices) -> list:
    """Selectively decode frames ``indices`` from a VID0 container:
    walk the offset table, slice each requested payload, decode via
    the pure-Python PNG kernel. Frames NOT requested are never
    touched, let alone inflated — the keyframe-sampling cost model.
    Returns uint8 ndarrays in the order given."""
    import struct

    n = video_frame_count(content)
    out = []
    for i in indices:
        if not (0 <= i < n):
            raise IndexError(f"frame {i} out of range 0..{n - 1}")
        off = struct.unpack(">I", content[8 + 4 * i : 12 + 4 * i])[0]
        end = (
            struct.unpack(">I", content[12 + 4 * i : 16 + 4 * i])[0]
            if i + 1 < n
            else len(content)
        )
        out.append(decode_png(content[off:end]))
    return out


def sample_video_features(
    df: DataFrame,
    every_k: int = 3,
    id_col: str = "doc_id",
    content_col: str = "content",
) -> DataFrame:
    """Arrow-batched sampled-frame feature extraction over VID0
    video content: decode every ``every_k``-th frame only (offset
    table → selective PNG decode) and emit one exact-integer stats
    row per sampled frame — the video sibling of
    :func:`extract_features` / :func:`extract_audio_features`.
    Partition-parallel, no shuffle; per-blob work scales with
    frames SAMPLED, not frames stored."""
    import numpy as np

    schema = StructType(
        [
            df.schema[id_col],
            StructField("frame_index", LongType()),
            StructField("height", LongType()),
            StructField("width", LongType()),
            StructField("pix_sum", LongType()),
            StructField("pix_min", LongType()),
            StructField("pix_max", LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for key, blob in zip(pdf[id_col], pdf[content_col]):
                blob = bytes(blob)
                picks = list(range(0, video_frame_count(blob), every_k))
                for i, a in zip(picks, decode_video_frames(blob, picks)):
                    a = a.astype(np.int64)
                    rows.append(
                        (
                            key,
                            i,
                            int(a.shape[0]),
                            int(a.shape[1]),
                            int(a.sum()),
                            int(a.min()),
                            int(a.max()),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col,
                    "frame_index",
                    "height",
                    "width",
                    "pix_sum",
                    "pix_min",
                    "pix_max",
                ],
            )

    return df.select(id_col, content_col).mapInPandas(run, schema)
