"""Multimodal column support: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as `BinaryType` columns with a
struct of typed metadata; decode / feature-extract / resize / frame-sample
run as Arrow-batched pandas functions over `mapInPandas` so the heavy
per-item work stays vectorized and off the driver.

The container ships no codec libraries, so the actual decoders are stubs
(`NotImplementedError` or the deterministic fake used in tests); the Spark
plumbing — schemas, batch iteration, partition-preserving UDF shape — is
real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    import pandas as pd

#: metadata struct carried alongside every binary payload column
MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload_bytes", LongType()),
        StructField("first_byte", IntegerType()),
    ]
)


def decode_image(payload: bytes) -> "object":
    """Decode an image payload. STUB: no codec libraries in this container.

    On a real cluster this is `PIL.Image.open(io.BytesIO(payload))` inside
    the same mapInPandas batch loop.
    """
    raise NotImplementedError("image codecs not available in this environment")


def decode_audio(payload: bytes) -> "object":
    """Decode an audio payload. STUB — see decode_image."""
    raise NotImplementedError("audio codecs not available in this environment")


def extract_features(df: DataFrame) -> DataFrame:
    """Feature-extract over binary payloads via Arrow-batched mapInPandas.

    Input: (doc_id: long, payload: binary). Output: FEATURE_SCHEMA.
    Deterministic fake 'decode': byte length + first byte — stands in for
    real embedding/thumbnail extraction while exercising the exact
    Spark-side shape (Arrow transfer, per-batch pandas work, stable schema).
    """
    assert isinstance(df.schema["payload"].dataType, BinaryType)

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            # NULL payloads are legal (BinaryType is nullable): treat as empty
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload_bytes": pdf["payload"]
                    .map(lambda b: len(b) if b is not None else 0)
                    .astype("int64"),
                    "first_byte": pdf["payload"]
                    .map(lambda b: b[0] if b is not None and len(b) else -1)
                    .astype("int32"),
                }
            )

    return df.mapInPandas(batches, FEATURE_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize image payloads via Arrow-batched mapInPandas.

    Input: (doc_id: long, payload: binary, meta: MEDIA_META_SCHEMA struct).
    Output: same shape with meta.width/height rewritten. The pixel work is a
    deterministic fake (payload passthrough — a real cluster calls
    PIL `Image.resize` in the same batch loop; codecs are absent here); the
    Spark-side plumbing — struct column through Arrow, schema-stable output,
    partition-preserving map — is the real contract."""

    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("payload", BinaryType()),
            StructField("meta", MEDIA_META_SCHEMA),
        ]
    )

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            meta = [
                {
                    "media_type": (m or {}).get("media_type"),
                    "width": width,
                    "height": height,
                    "duration_ms": (m or {}).get("duration_ms"),
                }
                for m in pdf["meta"]
            ]
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": pdf["payload"], "meta": meta}
            )

    return df.mapInPandas(batches, out_schema)


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Sample frames from video payloads. STUB plumbing: emits one row per
    sampled offset with the payload sliced deterministically (real impl
    would demux; the partitioning/batching shape is identical)."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    payload = b""
                n = max(1, len(payload) // max(every_ms, 1))
                for k in range(min(n, 8)):
                    rows.append((int(doc_id), int(k * every_ms), len(payload)))
            yield pd.DataFrame(rows, columns=["doc_id", "offset_ms", "payload_bytes"])

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("offset_ms", LongType()),
            StructField("payload_bytes", LongType()),
        ]
    )
    return df.mapInPandas(batches, schema)
