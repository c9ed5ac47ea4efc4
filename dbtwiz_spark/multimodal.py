"""Multimodal column support: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as `BinaryType` columns with a
struct of typed metadata; decode / feature-extract / resize / frame-sample
run as Arrow-batched pandas functions over `mapInPandas` so the heavy
per-item work stays vectorized and off the driver.

The container ships no codec LIBRARIES, so image/video decoders are
honest stubs (`NotImplementedError` or the deterministic fake used in
tests) — but AUDIO is real for PCM WAV, the one codec the Python stdlib
ships (`wave`): `decode_audio` parses the actual header and returns the
PCM stream, and `frame_sample` steps header-derived offsets with true
byte-math slice sizes. The Spark plumbing — schemas, batch iteration,
partition-preserving UDF shape — is real and tested for every modality.
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


def decode_audio(payload: bytes, with_pcm: bool = True) -> dict:
    """Decode a PCM WAV audio payload — REAL for the one codec the
    Python stdlib ships (``wave``; no external libraries, no audioop).
    Returns the header-derived stream parameters plus (by default) the
    raw PCM bytes; ``with_pcm=False`` is the header-only parse for
    callers that need offsets/sizes but not the samples — frame_sample's
    hot loop must not allocate a full second copy of every payload just
    to emit 8 byte-math tuples. Anything the stdlib can't parse
    (compressed WAV, mp3, a truncated header) raises NotImplementedError
    like the other codec guards, so callers keep one failure mode for
    'not decodable here'."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(payload)) as w:
            frame_rate = w.getframerate()
            n_frames = w.getnframes()
            out = {
                "n_channels": w.getnchannels(),
                "sample_width": w.getsampwidth(),
                "frame_rate": frame_rate,
                "n_frames": n_frames,
                "duration_ms": n_frames * 1000 // max(frame_rate, 1),
            }
            if with_pcm:
                out["pcm"] = w.readframes(n_frames)
            return out
    except (wave.Error, EOFError, ValueError) as e:
        raise NotImplementedError(
            f"audio payload is not stdlib-decodable PCM WAV: {e}"
        ) from e


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


def _is_wav(payload: bytes) -> bool:
    return (
        len(payload) >= 12
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"WAVE"
    )


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Sample frames from media payloads, one typed row per sampled
    offset, via Arrow-batched mapInPandas.

    REAL for PCM WAV payloads (stdlib ``wave`` — no external codecs):
    offsets step through the HEADER-derived duration and
    ``payload_bytes`` is the byte length of that offset's actual
    every_ms PCM slice (frame_rate × channels × sample_width byte math;
    the final slice is the stream remainder, so the sizes sum to the
    data chunk). Non-WAV payloads (video containers — no codecs here)
    keep the deterministic size-based fake with the identical output
    schema; both branches cap at 8 samples per item so skewed media
    can't blow up a batch."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    payload = b""
                if _is_wav(payload):
                    try:
                        # header-only: the slices are pure byte math
                        a = decode_audio(bytes(payload), with_pcm=False)
                    except NotImplementedError:
                        a = None
                else:
                    a = None
                if a is not None:
                    bytes_per_frame = a["n_channels"] * a["sample_width"]
                    # clamp ONCE and use everywhere: every_ms=0 or a
                    # degenerate frame rate would otherwise zero the
                    # slice byte-math while n still clamps to >=1 frame,
                    # emitting rows that claim 0 bytes for a stream with
                    # data (the non-WAV branch guards the same input)
                    frames_per_slice = max(
                        a["frame_rate"] * every_ms // 1000, 1
                    )
                    n = max(1, -(-a["n_frames"] // frames_per_slice))
                    for k in range(min(n, 8)):
                        start = k * frames_per_slice * bytes_per_frame
                        end = min(
                            (k + 1) * frames_per_slice * bytes_per_frame,
                            a["n_frames"] * bytes_per_frame,
                        )
                        rows.append(
                            (int(doc_id), int(k * every_ms), end - start)
                        )
                    continue
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
