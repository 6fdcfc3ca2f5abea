"""Multimodal-column inventory (LLM-pipeline extension surface).

Assets are synthesized from `documents.text` (payload = 5-byte header +
utf8 body; fixture text is pure ASCII, verified, so byte arithmetic is
SQL-statable).  The mapInPandas kernels do the real Arrow-batched work; the
oracles state the same byte math over the text column."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from overturemaps_duckdb_spark.operators.multimodal import (
    attach_payload,
    decode_assets,
    extract_byte_features,
    resize_images,
    sample_frames,
)
from overturemaps_duckdb_spark.queries import query, t

#: payload bytes before the body: b"OMM0" + modality initial
_HDR = 5

_BYTESUM = (
    "list_sum(list_transform(range(1, length(text) + 1), "
    "i -> ascii(substr(text, CAST(i AS INTEGER), 1))))"
)


def _assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    return attach_payload(d, "doc_id", "text", modality="image")


@query(
    "m1_asset_metadata",
    oracle=f"""
    SELECT doc_id AS asset_id, 'image' AS modality,
           CAST(length(text) + {_HDR} AS BIGINT) AS byte_len,
           md5(text) AS body_md5
    FROM documents
    """,
)
def m1_asset_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native-expression metadata over binary payloads (no Python): length
    and body md5 — binary columns are first-class to the JVM expressions."""
    a = _assets(spark, sf_dir)
    return a.select(
        "asset_id",
        "modality",
        F.length("payload").cast("bigint").alias("byte_len"),
        F.md5(F.expr(f"substring(payload, {_HDR + 1}, length(payload))")).alias(
            "body_md5"
        ),
    )


@query(
    "m2_asset_decode",
    oracle=f"""
    SELECT doc_id AS asset_id, 'image' AS modality,
           CAST(length(text) + {_HDR} AS BIGINT) AS byte_len,
           CAST(64 + length(text) % 256 AS INTEGER) AS width,
           CAST(64 + (length(text) * 3) % 256 AS INTEGER) AS height,
           CAST(1 + length(text) % 24 AS INTEGER) AS n_frames
    FROM documents
    """,
)
def m2_asset_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode kernel (deterministic fake header parse; the real
    codec path is the documented STUB)."""
    return decode_assets(_assets(spark, sf_dir))


@query(
    "m3_asset_byte_features",
    oracle=f"""
    SELECT doc_id AS asset_id,
           CAST(length(text) AS BIGINT) AS byte_len,
           CAST({_BYTESUM} AS BIGINT) AS byte_sum,
           ROUND(CAST({_BYTESUM} AS DOUBLE) / length(text), 6) AS byte_mean,
           ascii(substr(text, 1, 1)) AS first_byte,
           ascii(substr(text, length(text), 1)) AS last_byte
    FROM documents
    """,
)
def m3_asset_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extraction kernel: per-asset byte statistics (the embedding/
    spectrogram dataflow shape, minus the codec)."""
    f = extract_byte_features(_assets(spark, sf_dir))
    return f.withColumn("byte_mean", F.round("byte_mean", 6))


@query(
    "m4_frame_sample",
    oracle="""
    SELECT doc_id AS asset_id, CAST(unnest(range(0, 1 + length(text) % 24, 10)) AS INTEGER) AS frame_idx
    FROM documents
    """,
)
def m4_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling kernel: row-per-kept-frame expansion via mapInPandas
    (every 10th frame of the fake-decoded frame count)."""
    return sample_frames(_assets(spark, sf_dir), every_n=10)


@query(
    "m6_audio_modality",
    oracle=f"""
    SELECT event_id AS asset_id, 'audio' AS modality,
           CAST(length(props) + {_HDR} AS BIGINT) AS byte_len,
           CAST(8000 + (length(props) % 3) * 8000 AS INTEGER) AS sample_rate,
           ROUND(CAST(length(props) AS DOUBLE)
                 / (8000 + (length(props) % 3) * 8000), 6) AS duration_s
    FROM events WHERE event_id % 50 = 0
    """,
)
def m6_audio_modality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio modality through the same asset plumbing: payloads from event
    props, deterministic fake header → sample-rate/duration metadata (the
    real librosa/ffprobe path is the documented STUB).  Shows the schema is
    modality-generic — only the decode kernel differs."""
    import pandas as pd

    from overturemaps_duckdb_spark.operators.multimodal import attach_payload

    ev = t(spark, sf_dir, "events").where(F.col("event_id") % 50 == 0)
    assets = attach_payload(ev, "event_id", "props", modality="audio")

    def decode(batches):
        for pdf in batches:
            body = pdf["payload"].map(lambda p: len(p) - _HDR)
            rate = (8000 + (body % 3) * 8000).astype("int32")
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "byte_len": pdf["payload"].map(len).astype("int64"),
                    "sample_rate": rate,
                    "duration_s": (body / rate).round(6),
                }
            )

    return assets.mapInPandas(
        decode,
        schema="asset_id long, modality string, byte_len long, "
        "sample_rate int, duration_s double",
    )


#: m5 target dims; the resized header is "P6\n16 16\n255\n" (13 bytes)
_PPM_TARGET = 16


def _ppm_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixture adapter: deterministic binary-PPM (P6) payloads derived from
    doc_id — dims (4 + id%13) × (3 + id%7), every pixel of row r valued
    (r*7 + 13) % 256 — so the REAL resample output is header-math statable
    in SQL (each resized row contributes rowval(src_row) * 16 * 3 bytes)."""
    d = t(spark, sf_dir, "documents").select("doc_id")

    def build(batches):
        import numpy as np
        import pandas as pd

        from overturemaps_duckdb_spark.operators.multimodal import encode_ppm

        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 4 + did % 13, 3 + did % 7
                arr = np.repeat(
                    ((np.arange(h) * 7 + 13) % 256).astype("uint8"), w * 3
                ).reshape(h, w, 3)
                payloads.append(encode_ppm(arr))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"].astype("int64"),
                    "modality": "image",
                    "payload": payloads,
                }
            )

    return d.mapInPandas(
        build, schema="asset_id long, modality string, payload binary"
    )


@query(
    "m5_ppm_resize",
    oracle=f"""
    SELECT doc_id AS asset_id,
           CAST(13 + {_PPM_TARGET} * {_PPM_TARGET} * 3 AS BIGINT) AS out_bytes,
           CAST(list_sum(list_transform(range(0, {_PPM_TARGET}), r ->
                ((least((r * (3 + doc_id % 7)) // {_PPM_TARGET},
                        (3 + doc_id % 7) - 1) * 7 + 13) % 256)
                * {_PPM_TARGET} * 3
           )) AS BIGINT) AS out_pixel_sum
    FROM documents
    """,
)
def m5_ppm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image kernel, certified: binary-PPM decode → numpy
    nearest-neighbor resample → P6 re-encode (operators/multimodal.py
    `_real_resize_payload`/`_resize_nearest` — actual pixel work, no image
    libs needed).  The oracle restates the resample arithmetic: output row r
    samples source row min(r·src_h/16, src_h−1), whose constant pixel value
    the fixture adapter fixed as (row·7+13)%256.  (Supersedes the retired
    m5_resize_stub, which measured the fake re-header path.)"""
    from overturemaps_duckdb_spark.operators.multimodal import decode_ppm

    resized = resize_images(
        _ppm_assets(spark, sf_dir), _PPM_TARGET, _PPM_TARGET, use_real_codec=True
    )

    @F.pandas_udf("long")
    def pixel_sum(payloads: pd.Series) -> pd.Series:
        return payloads.map(lambda p: int(decode_ppm(bytes(p)).sum()))

    return resized.select(
        "asset_id",
        F.length("payload").cast("bigint").alias("out_bytes"),
        pixel_sum("payload").alias("out_pixel_sum"),
    )
