"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Beyond-reference surface (BASELINE.json north star).  Design for 100 TB:

- An asset is a row: ``(asset_id, modality, payload binary, meta struct)``.
  Payload bytes stay opaque to the engine — never parsed by Catalyst, never
  a join/shuffle key; only sub-kilobyte metadata travels through wide
  transformations.  This is the Overture lesson applied to media: keep WKB
  (here: pixels) late-materialized (`/root/reference/src/lib/query.js:7-9`),
  decode at the boundary only.
- Decode / feature-extract / resize / frame-sample run as **mapInPandas**
  over Arrow record batches: one Python worker call per batch (not per row),
  payload bytes move driver-free from parquet to the Python worker.
- Partitioning: assets are independent → any partitioning works; size
  partitions by *bytes* not rows (``spark.sql.files.maxPartitionBytes``)
  since payloads dominate.  Feature outputs are tiny and re-shuffle freely.

Pixel/sample decoding libraries (PIL, ffmpeg, librosa) are NOT in this
container.  Each kernel therefore has layered paths:
- ``_real_*`` — pillow when importable (production executors; arbitrary
  formats), else a built-in dependency-free binary-PPM (P6) codec doing
  REAL pixel decode/resample in numpy (tests/test_multimodal_real.py);
  anything else raises :class:`NotImplementedError` naming the dependency.
- a deterministic fake parse of our synthetic payload header, so the
  Spark-side plumbing (schema, batch iteration, UDF signatures, partition
  behavior) is fully real and fully tested against SQL oracles.

Synthetic payload format (built by :func:`attach_payload` from any text
column, so fixtures need no binary files)::

    b"OMM0" + modality[0] + utf-8 text bytes
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MAGIC = b"OMM0"

#: the typed metadata struct carried beside every payload
META_SCHEMA = StructType(
    [
        StructField("byte_len", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)

ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("modality", StringType()),
        StructField("payload", BinaryType()),
        StructField("meta", META_SCHEMA),
    ]
)

DECODE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("modality", StringType()),
        StructField("byte_len", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("byte_sum", LongType()),
        StructField("byte_mean", DoubleType()),
        StructField("first_byte", IntegerType()),
        StructField("last_byte", IntegerType()),
    ]
)


def attach_payload(
    df: DataFrame, id_col: str, text_col: str, modality: str = "image"
) -> DataFrame:
    """Materialize an asset table from a text fixture: payload =
    MAGIC + modality[0] + utf8(text).  Pure native expressions (encode /
    concat work on BinaryType), so asset construction itself is JVM-side."""
    payload = F.concat(
        F.lit(MAGIC),
        F.encode(F.lit(modality[0]), "utf-8"),
        F.encode(F.col(text_col), "utf-8"),
    )
    return df.select(
        F.col(id_col).cast("long").alias("asset_id"),
        F.lit(modality).alias("modality"),
        payload.alias("payload"),
    )


# ---------------------------------------------------------------------------
# decode (mapInPandas kernel)
# ---------------------------------------------------------------------------


def _pil():
    """Pillow if importable (production executors), else None (this
    container ships no image libs — the PPM path below still does real
    pixel work without it)."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


# -- minimal real codec: binary PPM (P6), public format, zero dependencies --


def _ppm_parse_header(payload: bytes) -> tuple[int, int, int, int] | None:
    """Parse a binary-PPM header → (width, height, maxval, data_offset),
    or None if the payload isn't P6.  Whitespace/comment handling per the
    netpbm spec."""
    if not payload.startswith(b"P6"):
        return None
    fields: list[int] = []
    i = 2
    while len(fields) < 3 and i < len(payload):
        c = payload[i : i + 1]
        if c.isspace():
            i += 1
        elif c == b"#":  # comment to end of line
            while i < len(payload) and payload[i : i + 1] not in (b"\n", b"\r"):
                i += 1
        elif c.isdigit():
            j = i
            while j < len(payload) and payload[j : j + 1].isdigit():
                j += 1
            fields.append(int(payload[i:j]))
            i = j
        else:
            return None
    if len(fields) < 3 or i >= len(payload) or not payload[i : i + 1].isspace():
        return None
    width, height, maxval = fields
    return width, height, maxval, i + 1  # single whitespace after maxval


def decode_ppm(payload: bytes):
    """P6 payload → HxWx3 uint8 numpy array (real pixels, no deps)."""
    import numpy as np

    hdr = _ppm_parse_header(payload)
    if hdr is None:
        raise ValueError("not a binary PPM (P6) payload")
    width, height, maxval, off = hdr
    if maxval > 255:
        # legal P6 with maxval > 255 uses 2-byte big-endian samples — decoding
        # them as uint8 would silently halve/garble the image
        raise ValueError(f"P6 maxval {maxval} > 255 (16-bit samples) unsupported")
    n = width * height * 3
    arr = np.frombuffer(payload, dtype=np.uint8, count=n, offset=off)
    return arr.reshape(height, width, 3)


def encode_ppm(arr) -> bytes:
    """HxWx3 uint8 numpy array → P6 payload."""
    h, w = arr.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode() + arr.astype("uint8").tobytes()


def _resize_nearest(arr, width: int, height: int):
    """Nearest-neighbor resample via integer index maps — the standard
    vectorized formulation (pure numpy fancy indexing, no Python loop)."""
    import numpy as np

    src_h, src_w = arr.shape[:2]
    rows = np.minimum((np.arange(height) * src_h) // height, src_h - 1)
    cols = np.minimum((np.arange(width) * src_w) // width, src_w - 1)
    return arr[rows[:, None], cols[None, :]]


def _real_decode_image(payload: bytes) -> tuple[int, int, int]:
    """Real image decode: pillow for arbitrary formats when importable;
    the built-in PPM parser otherwise (header-only — no pixel copy)."""
    Image = _pil()
    if Image is not None:
        import io

        img = Image.open(io.BytesIO(bytes(payload)))
        return img.width, img.height, getattr(img, "n_frames", 1)
    hdr = _ppm_parse_header(bytes(payload))
    if hdr is not None:
        return hdr[0], hdr[1], 1
    raise NotImplementedError(
        "non-PPM image decoding requires pillow on executors"
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic header parse of the synthetic payload: dimensions are a
    fixed function of the content bytes, so an SQL oracle can state them."""
    body = len(payload) - len(MAGIC) - 1
    width = 64 + body % 256
    height = 64 + (body * 3) % 256
    n_frames = 1 + body % 24
    return width, height, n_frames


def decode_assets(assets: DataFrame, *, use_real_codec: bool = False) -> DataFrame:
    """Decode every asset's header → (asset_id, modality, byte_len, width,
    height, n_frames) via mapInPandas (one Arrow batch per call)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "asset_id": pdf["asset_id"],
                "modality": pdf["modality"],
                "byte_len": pdf["payload"].map(len).astype("int64"),
            }
            dims = [
                _real_decode_image(p) if use_real_codec else _fake_decode(p)
                for p in pdf["payload"]
            ]
            out["width"] = pd.Series([d[0] for d in dims], dtype="int32")
            out["height"] = pd.Series([d[1] for d in dims], dtype="int32")
            out["n_frames"] = pd.Series([d[2] for d in dims], dtype="int32")
            yield pd.DataFrame(out)

    return assets.mapInPandas(decode, schema=DECODE_SCHEMA)


def with_meta(assets: DataFrame, *, use_real_codec: bool = False) -> DataFrame:
    """Attach the typed `meta` struct next to the payload (the asset-table
    form downstream operators consume).

    ONE mapInPandas pass emitting payload + meta together — the previous
    join-on-asset_id form hash-shuffled the full payload bytes across the
    cluster and scanned the asset table twice, violating this module's own
    'payload never travels through wide transformations' design."""
    meta_type = StructType(
        [
            StructField("byte_len", LongType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("n_frames", IntegerType()),
        ]
    )
    schema = StructType(assets.schema.fields + [StructField("meta", meta_type)])

    def attach(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [
                _real_decode_image(p) if use_real_codec else _fake_decode(p)
                for p in pdf["payload"]
            ]
            out = pdf.copy()
            out["meta"] = [
                {
                    "byte_len": len(p),
                    "width": d[0],
                    "height": d[1],
                    "n_frames": d[2],
                }
                for p, d in zip(pdf["payload"], dims)
            ]
            yield out

    return assets.mapInPandas(attach, schema=schema)


# ---------------------------------------------------------------------------
# feature extraction (mapInPandas kernel — real computation, no codec needed)
# ---------------------------------------------------------------------------


def extract_byte_features(assets: DataFrame) -> DataFrame:
    """Per-asset byte statistics over the payload body (after the 5-byte
    header): length, sum, mean, first/last byte.  A stand-in for real feature
    extraction (embeddings, spectrograms) with the same dataflow shape."""
    skip = len(MAGIC) + 1

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                # numpy view over the payload bytes: the fold runs at C
                # speed instead of a per-byte Python loop (the kernel is
                # the per-batch hot path at corpus scale)
                body = np.frombuffer(payload, dtype=np.uint8)[skip:]
                n = int(body.size)
                s = int(body.sum())
                rows.append(
                    (
                        aid,
                        n,
                        s,
                        (s / n) if n else 0.0,
                        int(body[0]) if n else 0,
                        int(body[-1]) if n else 0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id",
                    "byte_len",
                    "byte_sum",
                    "byte_mean",
                    "first_byte",
                    "last_byte",
                ],
            )

    return assets.mapInPandas(features, schema=FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# resize / frame-sample (STUB kernels with real plumbing)
# ---------------------------------------------------------------------------


def _real_resize_payload(payload: bytes, width: int, height: int) -> bytes:
    """Real pixel resize: pillow when importable (any format, Lanczos,
    re-encoded to the source format); otherwise the dependency-free PPM
    path (numpy nearest-neighbor over real pixel data)."""
    Image = _pil()
    if Image is not None and not payload.startswith(b"P6"):
        import io

        img = Image.open(io.BytesIO(payload))
        fmt = img.format or "PNG"
        buf = io.BytesIO()
        img.resize((width, height)).save(buf, format=fmt)
        return buf.getvalue()
    if not payload.startswith(b"P6"):
        raise NotImplementedError(
            "non-PPM image resize requires pillow on executors"
        )
    return encode_ppm(_resize_nearest(decode_ppm(payload), width, height))


def resize_images(
    assets: DataFrame, width: int, height: int, *, use_real_codec: bool = False
) -> DataFrame:
    """Thumbnail kernel: payload → resized payload (schema-preserving map).

    Real path (``use_real_codec=True``): actual pixel resampling via
    :func:`_real_resize_payload` — pillow when present, built-in numpy
    PPM nearest-neighbor otherwise (tests/test_multimodal_real.py).  Fake
    path (default, used by the m5 oracle query over text-derived synthetic
    payloads): a new payload whose header records the target dims
    (deterministic, size-bounded), exercising identical plumbing."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            if use_real_codec:
                out["payload"] = [
                    _real_resize_payload(bytes(p), width, height)
                    for p in pdf["payload"]
                ]
            else:
                tag = f"{width}x{height}:".encode()
                out["payload"] = [
                    bytes(p[: len(MAGIC) + 1]) + tag + bytes(p[len(MAGIC) + 1 :])[:64]
                    for p in pdf["payload"]
                ]
            yield out

    return assets.mapInPandas(resize, schema=assets.schema)


def sample_frames(
    assets: DataFrame, every_n: int = 10, *, use_real_codec: bool = False
) -> DataFrame:
    """Video frame sampling: one output row per kept frame (explode shape).

    Real path (STUB): ffmpeg/pyav demux.  Fake path emits `n_frames/every_n`
    rows per asset with the frame index — the row-expansion dataflow a real
    sampler produces."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                # the real decode's frame count drives the sampling — it
                # used to be decoded then DISCARDED, emitting frame indexes
                # fabricated from the fake byte-length hash (16 "frames"
                # for a 1-frame image)
                if use_real_codec:
                    _w, _h, n_frames = _real_decode_image(bytes(payload))
                else:
                    _w, _h, n_frames = _fake_decode(bytes(payload))
                for i in range(0, n_frames, every_n):
                    rows.append((aid, i))
            yield pd.DataFrame(rows, columns=["asset_id", "frame_idx"])

    return assets.mapInPandas(
        sample,
        schema=StructType(
            [
                StructField("asset_id", LongType()),
                StructField("frame_idx", IntegerType()),
            ]
        ),
    )
