"""Multimodal (image/audio/video) column plumbing.

Media assets are opaque ``binary`` columns with typed metadata, carried
through the span model as ``kind='media'`` spans whose ``media_ref`` points
into an assets table:

    assets(media_ref: string, kind: string, payload: binary,
           meta: struct<width:int, height:int, duration_ms:int, mime:string>)

The Spark-side plumbing — schema, partitioning, Arrow batch shape, UDF
signatures — is real and tested; the actual decoders are STUBBED (this
container has no image/audio libraries): ``decode_image`` raises
NotImplementedError unless ``fake=True``, in which case a deterministic
content-derived feature vector stands in so downstream join/ANN plumbing is
exercised end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

ASSETS = StructType(
    [
        StructField("media_ref", StringType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType(), True),
                    StructField("height", IntegerType(), True),
                    StructField("duration_ms", IntegerType(), True),
                    StructField("mime", StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

_FEATURES = StructType(
    [
        StructField("media_ref", StringType(), False),
        StructField("feature", ArrayType(FloatType()), True),
        StructField("decode_error", StringType(), True),
    ]
)


def media_refs(docs: DataFrame) -> DataFrame:
    """Media spans of the corpus: (doc_id, media_ref, offset)."""
    m = docs.select(
        "doc_id",
        F.explode(F.filter("spans", lambda s: s["kind"] == "media")).alias("s"),
    )
    return m.select("doc_id", F.col("s.media_ref").alias("media_ref"), F.col("s.offset").alias("offset"))


def _fake_feature(payload: bytes | None, ref: str, dim: int) -> list[float]:
    """Deterministic content-derived pseudo-feature (decoder stand-in)."""
    h = hashlib.sha256((payload or ref.encode())[:1024]).digest()
    rng = np.random.RandomState(int.from_bytes(h[:4], "big"))
    v = rng.normal(size=dim).astype(np.float32)
    return (v / np.linalg.norm(v)).tolist()


def extract_features(
    assets: DataFrame, dim: int = 16, fake: bool = False, batch_rows: int = 64
) -> DataFrame:
    """Decode + feature-extract media payloads via mapInPandas.

    Real decoders (PIL/torchaudio/decord) are not available in this
    container — STUB: with ``fake=False`` every row gets a
    ``decode_error='NotImplementedError: no media decoders in environment'``
    and a null feature (the pipeline must tolerate undecodable assets
    anyway); with ``fake=True`` a deterministic content-hash feature is
    produced so ANN/join plumbing runs end-to-end.

    Batch shape matters at scale: payloads are large, so Arrow batches are
    capped by ``batch_rows`` (set spark.sql.execution.arrow.maxRecordsPerBatch
    accordingly) and the scan partitions by file, never collecting payloads
    to the driver.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # the fake feature is (re)defined INSIDE the closure: cloudpickle
        # ships a closure-referenced module-level function by module path,
        # which breaks on executors without xlink_spark on their import
        # path; an inner def is serialized by value (mirror of
        # _fake_feature, which stays importable for unit tests)
        def fake_feature(payload, ref, dim):
            h = hashlib.sha256((payload or ref.encode())[:1024]).digest()
            rng = np.random.RandomState(int.from_bytes(h[:4], "big"))
            v = rng.normal(size=dim).astype(np.float32)
            return (v / np.linalg.norm(v)).tolist()

        for pdf in batches:
            out = []
            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                if fake:
                    out.append((ref, fake_feature(payload, ref, dim), None))
                else:
                    out.append(
                        (ref, None, "NotImplementedError: no media decoders in environment")
                    )
            yield pd.DataFrame(out, columns=["media_ref", "feature", "decode_error"])

    return assets.select("media_ref", "payload").mapInPandas(run, _FEATURES)


def synthesize_assets(docs: DataFrame, with_payload: bool = True) -> DataFrame:
    """Deterministic fake asset table for the corpus's media refs.

    payload = utf-8 of the ref repeated (content-addressable, deterministic);
    meta derived from the ref hash. Exercises binary-column I/O for real.
    """
    refs = media_refs(docs).select("media_ref").distinct()
    payload = (
        F.encode(F.concat_ws(":", F.lit("payload"), "media_ref", "media_ref"), "utf-8")
        if with_payload
        else F.lit(None).cast("binary")
    )
    h = F.abs(F.xxhash64("media_ref"))
    return refs.select(
        "media_ref",
        F.lit("image").alias("kind"),
        payload.alias("payload"),
        F.struct(
            (h % 1920 + 1).cast("int").alias("width"),
            (h % 1080 + 1).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit("image/jpeg").alias("mime"),
        ).alias("meta"),
    )
