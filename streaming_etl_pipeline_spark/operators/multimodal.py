"""Multimodal (image/audio/video) column handling.

Design (SURVEY.md §7 step 7): media travel as opaque ``binary`` payload
columns next to typed metadata — the lakehouse-native pattern (same as
Spark's built-in ``binaryFile`` source schema). All heavy per-asset work
(decode, resize, feature-extract, frame-sample) runs as Arrow-batched
``mapInPandas`` over the payload column:

- the PLUMBING is real and tested — schema contract, batch shape,
  partition sizing, Arrow round-trip;
- the DECODE itself is stubbed: the image/audio libraries are not in
  this container, so ``_decode_payload`` tries the real library and
  falls back to a clearly-marked deterministic fake (documented below).
  Swapping in Pillow/torchaudio later changes one function, not the
  pipeline.

Scale notes: payloads dominate bytes, so the operative knobs are
``spark.sql.files.maxPartitionBytes`` (keep decoded batches within
executor memory) and ``spark.sql.execution.arrow.maxRecordsPerBatch``
(bound the pandas batch). Feature extraction is embarrassingly parallel —
no shuffle; downstream joins should carry only (asset_id, features),
never the payload.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_bytes", T.IntegerType(), False),
                ]
            ),
            False,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("payload_sha256", T.StringType(), False),
        T.StructField("byte_entropy", T.DoubleType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
        T.StructField("decoder", T.StringType(), False),
    ]
)


def synthesize_assets(spark: SparkSession, n: int = 100) -> DataFrame:
    """Deterministic fake asset table: payload bytes derived from the
    asset id via sha256 (columnar — ``spark.range`` + built-ins only).
    Stands in for a real ``spark.read.format("binaryFile")`` scan."""
    base = spark.range(n).select(F.col("id").alias("asset_id"))
    kind = F.when(F.col("asset_id") % 2 == 0, "image").otherwise("audio")
    payload = F.unhex(
        F.concat(
            *[
                F.sha2(F.concat(F.col("asset_id").cast("string"), F.lit(f"#{i}")), 256)
                for i in range(4)
            ]
        )
    )
    n_bytes = F.length(payload).cast("int")
    return base.select(
        "asset_id",
        kind.alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.when(kind == "image", F.lit(64)).otherwise(F.lit(None)).cast("int").alias("width"),
            F.when(kind == "image", F.lit(64)).otherwise(F.lit(None)).cast("int").alias("height"),
            F.when(kind == "audio", F.lit(16000)).otherwise(F.lit(None)).cast("int").alias("sample_rate"),
            n_bytes.alias("n_bytes"),
        ).alias("meta"),
    )


def _decode_payload(kind: str, payload: bytes) -> tuple[list[float], str]:
    """Decode an asset and produce a small feature vector.

    STUB: real decoders (Pillow for images, soundfile/torchaudio for
    audio) are not installed in this container. We try them, and fall
    back to a deterministic fake feature (sha256-seeded, fixed 8-dim)
    so the distributed plumbing is fully exercisable. The fake is NOT a
    real feature — swap `_decode_payload` when the codec libs exist.
    """
    if kind == "image":
        try:  # pragma: no cover - library absent in this container
            from PIL import Image  # noqa: F401

            raise NotImplementedError("real image decode not wired yet")
        except ImportError:
            pass
    digest = hashlib.sha256(payload).digest()
    feat = [round(b / 255.0, 6) for b in digest[:8]]
    return feat, "stub-sha256"


def _byte_entropy(payload: bytes) -> float:
    counts: dict[int, int] = {}
    for b in payload:
        counts[b] = counts.get(b, 0) + 1
    n = len(payload)
    return round(
        -sum(c / n * math.log2(c / n) for c in counts.values()), 6
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("resizer", T.StringType(), False),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("frame_payload", T.BinaryType(), False),
        T.StructField("sampler", T.StringType(), False),
    ]
)


def resize_images(assets: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Resize image assets to width×height via Arrow-batched mapInPandas.

    STUB decode/encode: without Pillow the "resized" payload is a
    deterministic sha256-derived stand-in of the right conceptual shape;
    the distributed plumbing (filter to images, batch iteration, schema
    contract, payload replacement) is real. One narrow projection — no
    shuffle at any scale.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for payload in pdf["payload"]:
                payload = bytes(payload)
                try:  # pragma: no cover - library absent in this container
                    from PIL import Image  # noqa: F401

                    raise NotImplementedError("real resize not wired yet")
                except ImportError:
                    seed = hashlib.sha256(
                        payload + f":{width}x{height}".encode()
                    ).digest()
                    payloads.append(seed * ((width * height) // len(seed) + 1))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "payload": payloads,
                    "width": width,
                    "height": height,
                    "resizer": "stub-sha256",
                }
            )

    return (
        assets.filter(F.col("kind") == "image")
        .select("asset_id", "kind", "payload")
        .mapInPandas(run, schema=RESIZED_SCHEMA)
    )


def sample_frames(assets: DataFrame, n_frames: int = 4) -> DataFrame:
    """Sample n frames per audio/video asset — the row-exploding shape
    (one input asset → n output rows) via mapInPandas.

    STUB frame extraction: each "frame" is a deterministic slice-hash of
    the payload. Real decoders drop in at the marked point; the 1→n
    Arrow plumbing, deterministic frame indexing and memory behavior
    (frames stream out per batch, payload never amplified n× in one
    buffer) are the engineered part.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                payload = bytes(payload)
                step = max(len(payload) // n_frames, 1)
                for i in range(n_frames):
                    chunk = payload[i * step : (i + 1) * step] or payload[-step:]
                    ids.append(aid)
                    idxs.append(i)
                    frames.append(hashlib.sha256(chunk).digest())
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "frame_index": idxs,
                    "frame_payload": frames,
                    "sampler": "stub-slicehash",
                }
            )

    return (
        assets.filter(F.col("kind") != "image")
        .select("asset_id", "payload")
        .mapInPandas(run, schema=FRAME_SCHEMA)
    )


def extract_features(assets: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    ``mapInPandas`` receives an iterator of pandas batches (never the
    whole partition) — memory stays bounded by the Arrow batch size no
    matter how large the partition's payload bytes are.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, decoders, entropies, hashes = [], [], [], []
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                payload = bytes(payload)
                f, d = _decode_payload(kind, payload)
                feats.append(f)
                decoders.append(d)
                entropies.append(_byte_entropy(payload))
                hashes.append(hashlib.sha256(payload).hexdigest())
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "payload_sha256": hashes,
                    "byte_entropy": entropies,
                    "feature": feats,
                    "decoder": decoders,
                }
            )

    return assets.select("asset_id", "kind", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )
