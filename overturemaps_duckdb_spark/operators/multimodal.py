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

The actual pixel/sample decoding libraries (PIL, ffmpeg, librosa) are NOT in
this container.  Each kernel therefore has two paths:
- ``_real_decode_*`` — raises :class:`NotImplementedError` with the exact
  dependency needed (the marked STUB), and
- a deterministic fake parse of our synthetic payload header, so the
  Spark-side plumbing (schema, batch iteration, UDF signatures, partition
  behavior) is fully real and fully tested.

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


def _real_decode_image(payload: bytes) -> tuple[int, int, int]:
    """STUB: the real path needs an image decoder.

    On a production cluster::

        from PIL import Image           # pip install pillow on executors
        img = Image.open(io.BytesIO(payload))
        return img.width, img.height, getattr(img, "n_frames", 1)
    """
    raise NotImplementedError("image decoding requires pillow on executors")


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
    form downstream operators consume)."""
    decoded = decode_assets(assets, use_real_codec=use_real_codec).select(
        "asset_id",
        F.struct("byte_len", "width", "height", "n_frames").alias("meta"),
    )
    return assets.join(decoded, "asset_id")


# ---------------------------------------------------------------------------
# feature extraction (mapInPandas kernel — real computation, no codec needed)
# ---------------------------------------------------------------------------


def extract_byte_features(assets: DataFrame) -> DataFrame:
    """Per-asset byte statistics over the payload body (after the 5-byte
    header): length, sum, mean, first/last byte.  A stand-in for real feature
    extraction (embeddings, spectrograms) with the same dataflow shape."""
    skip = len(MAGIC) + 1

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                body = payload[skip:]
                n = len(body)
                s = sum(body)
                rows.append(
                    (
                        aid,
                        n,
                        s,
                        (s / n) if n else 0.0,
                        body[0] if n else 0,
                        body[-1] if n else 0,
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


def resize_images(
    assets: DataFrame, width: int, height: int, *, use_real_codec: bool = False
) -> DataFrame:
    """Thumbnail kernel: payload → resized payload.

    Real path (STUB): PIL `Image.resize((width, height))` re-encoded to the
    original format.  Fake path keeps the plumbing honest: a new payload
    whose header records the target dims (deterministic, size-bounded)."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if use_real_codec:
                _real_decode_image(b"")  # raises NotImplementedError
            out = pdf.copy()
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
                if use_real_codec:
                    _real_decode_image(bytes(payload))
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
