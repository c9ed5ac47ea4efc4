"""Multimodal column support: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as `BinaryType` columns with a
struct of typed metadata; decode / feature-extract / resize / frame-sample
run as Arrow-batched pandas functions over `mapInPandas` so the heavy
per-item work stays vectorized and off the driver.

The container ships no codec LIBRARIES, so the decode line is drawn at
what pure byte math can reach — and everything on the reachable side is
REAL: audio for PCM WAV (stdlib `wave`: `decode_audio` parses the
actual header and returns the PCM stream; `frame_sample` steps
header-derived offsets with true byte-math slice sizes), images for
uncompressed BMP (BI_RGB 24/32 bpp) and binary PPM (`decode_image`
normalizes row order/channel order/padding; `resize_images` does a
vectorized nearest-neighbor resample and re-encodes). Compressed
formats (PNG/JPEG/mp3/video) raise `NotImplementedError` — on a real
cluster those branches swap in PIL/ffmpeg inside the same batch loop.
The Spark plumbing — schemas, batch iteration, partition-preserving UDF
shape — is real and tested for every modality.
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
        # real decoded geometry for byte-math-decodable image payloads
        # (BMP/PPM), NULL otherwise — surfaced as plan-level columns so
        # min-resolution gates and aspect-ratio buckets are ordinary
        # Catalyst filters, not a second decode pass
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def decode_image(payload: bytes, with_pixels: bool = True) -> dict:
    """Decode an image payload — REAL for the two formats whose decode
    is pure byte math (no codec libraries needed): uncompressed BMP
    (BITMAPINFOHEADER, BI_RGB, 24/32 bpp) and binary PPM (P6, maxval
    ≤ 255). Returns ``{"width", "height", "n_channels", "pixels"}``
    with pixels as top-down row-major RGB(A) bytes — BMP's bottom-up row
    order and BGR channel order and 4-byte row padding are normalized
    here, so callers never see container quirks. ``with_pixels=False``
    is the header-only parse (the ``decode_audio``/``with_pcm``
    convention): full validation — including the pixel-data length
    check — but no pixel buffer materialized, for callers that need
    geometry only (``extract_features``' width/height columns must not
    copy every image's pixels just to read two header ints).

    Compressed formats (PNG/JPEG/…) raise NotImplementedError like the
    other codec guards — on a real cluster that branch is
    `PIL.Image.open(io.BytesIO(payload))` inside the same mapInPandas
    batch loop. One failure mode ('not decodable here') either way."""
    if payload[:2] == b"BM":
        return _decode_bmp(payload, with_pixels)
    if payload[:2] == b"P6":
        return _decode_ppm(payload, with_pixels)
    raise NotImplementedError(
        "image payload is not byte-math-decodable (uncompressed BMP / "
        "binary PPM); compressed codecs are not available in this "
        "environment"
    )


def _decode_bmp(payload: bytes, with_pixels: bool = True) -> dict:
    import struct

    import numpy as np

    try:
        if len(payload) < 54:
            raise ValueError("truncated BMP header")
        data_offset = struct.unpack_from("<I", payload, 10)[0]
        # height is signed: negative means top-down row order
        dib_size, width, height_raw = struct.unpack_from("<Iii", payload, 14)
        bpp, compression = struct.unpack_from("<HI", payload, 28)
        if dib_size < 40:
            raise ValueError(f"unsupported DIB header size {dib_size}")
        if compression != 0 or bpp not in (24, 32):
            raise ValueError(
                f"only BI_RGB 24/32 bpp supported (bpp={bpp}, "
                f"compression={compression})"
            )
        height = abs(height_raw)
        n_channels = bpp // 8
        row_stride = (width * n_channels + 3) & ~3  # rows pad to 4 bytes
        end = data_offset + row_stride * height
        if width <= 0 or height == 0 or len(payload) < end:
            raise ValueError("pixel data shorter than header claims")
        out = {"width": width, "height": height, "n_channels": n_channels}
        if not with_pixels:
            return out
        rows = np.frombuffer(payload, np.uint8, row_stride * height, data_offset)
        px = rows.reshape(height, row_stride)[:, : width * n_channels]
        px = px.reshape(height, width, n_channels)
        if height_raw > 0:
            px = px[::-1]  # bottom-up file order -> top-down
        # BGR(A) -> RGB(A)
        px = px[..., [2, 1, 0, 3][:n_channels]]
        out["pixels"] = np.ascontiguousarray(px).tobytes()
        return out
    except (struct.error, ValueError) as e:
        raise NotImplementedError(f"BMP payload not decodable: {e}") from e


def _decode_ppm(payload: bytes, with_pixels: bool = True) -> dict:
    """Binary PPM (P6): 'P6' then whitespace-separated width/height/
    maxval tokens ('#' comment lines legal), one whitespace byte, then
    width*height RGB triples."""
    try:
        pos = 2
        tokens: list[int] = []
        while len(tokens) < 3:
            while pos < len(payload) and payload[pos : pos + 1].isspace():
                pos += 1
            if payload[pos : pos + 1] == b"#":
                while pos < len(payload) and payload[pos] != 0x0A:
                    pos += 1
                continue
            start = pos
            while pos < len(payload) and not payload[pos : pos + 1].isspace():
                pos += 1
            tokens.append(int(payload[start:pos]))
        pos += 1  # exactly one whitespace byte after maxval
        width, height, maxval = tokens
        if not (0 < maxval <= 255) or width <= 0 or height <= 0:
            raise ValueError(f"unsupported PPM dimensions/maxval {tokens}")
        need = width * height * 3
        if len(payload) - pos < need:
            raise ValueError("pixel data shorter than header claims")
        out = {"width": width, "height": height, "n_channels": 3}
        if with_pixels:
            out["pixels"] = bytes(payload[pos : pos + need])
        return out
    except (ValueError, IndexError) as e:
        raise NotImplementedError(f"PPM payload not decodable: {e}") from e


def encode_bmp(width: int, height: int, pixels: bytes, n_channels: int = 3) -> bytes:
    """Encode top-down row-major RGB(A) bytes as an uncompressed 24-bit
    BI_RGB BMP (alpha dropped) — the inverse of _decode_bmp, so resized
    payloads stay round-trippable through decode_image."""
    import struct

    import numpy as np

    px = np.frombuffer(pixels, np.uint8).reshape(height, width, n_channels)
    rgb = px[..., :3][..., ::-1]  # RGB(A) -> BGR, drop alpha
    row_stride = (width * 3 + 3) & ~3
    rows = np.zeros((height, row_stride), np.uint8)
    rows[:, : width * 3] = rgb.reshape(height, width * 3)
    data = rows[::-1].tobytes()  # top-down -> bottom-up file order
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(data), 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return header + data


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
    Byte length + first byte are computed for every payload; width/height
    are the REAL decoded geometry for byte-math-decodable images (BMP/PPM
    — a header-only ``decode_image(with_pixels=False)`` parse, so no
    pixel buffer is copied just to read two header ints) and NULL for
    everything else. The Spark-side shape (Arrow transfer, per-batch
    pandas work, stable schema) is the production one either way.
    """
    assert isinstance(df.schema["payload"].dataType, BinaryType)

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            nbytes, first, widths, heights = [], [], [], []
            for b in pdf["payload"]:
                # NULL payloads are legal (BinaryType is nullable):
                # treat as empty
                b = bytes(b) if b is not None else b""
                nbytes.append(len(b))
                first.append(b[0] if b else -1)
                w = h = None
                if b[:2] in (b"BM", b"P6"):
                    try:
                        img = decode_image(b, with_pixels=False)
                        w, h = img["width"], img["height"]
                    except NotImplementedError:
                        pass  # sniffed like an image, doesn't parse: NULL
                widths.append(w)
                heights.append(h)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload_bytes": pd.array(nbytes, dtype="int64"),
                    "first_byte": pd.array(first, dtype="int32"),
                    "width": pd.array(widths, dtype="Int32"),
                    "height": pd.array(heights, dtype="Int32"),
                }
            )

    return df.mapInPandas(batches, FEATURE_SCHEMA)


def _resize_nearest(img: dict, width: int, height: int) -> bytes:
    """Nearest-neighbor resample via numpy index arrays (vectorized —
    no per-pixel Python), re-encoded as 24-bit BMP."""
    import numpy as np

    px = np.frombuffer(img["pixels"], np.uint8).reshape(
        img["height"], img["width"], img["n_channels"]
    )
    ys = (np.arange(height) * img["height"]) // height
    xs = (np.arange(width) * img["width"]) // width
    out = px[ys][:, xs]
    return encode_bmp(width, height, out.tobytes(), img["n_channels"])


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize image payloads via Arrow-batched mapInPandas.

    Input: (doc_id: long, payload: binary, meta: MEDIA_META_SCHEMA struct).
    Output: same shape with meta.width/height rewritten (and, on the
    real-resize branch, meta.media_type rewritten to image/bmp — the
    re-encoded payload's actual format). REAL for
    byte-math-decodable payloads (uncompressed BMP / binary PPM — see
    decode_image): nearest-neighbor resample through vectorized numpy
    index arrays, re-encoded as 24-bit BMP. Payloads needing an absent
    codec (PNG/JPEG) pass through unchanged with only the meta rewrite —
    a real cluster swaps that branch for PIL `Image.resize` in the same
    batch loop. The Spark-side plumbing — struct column through Arrow,
    schema-stable output, partition-preserving map — is identical on
    both branches."""

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
            payloads, metas = [], []
            for b, m in zip(pdf["payload"], pdf["meta"]):
                m = m or {}
                media_type = m.get("media_type")
                if b is not None:
                    try:
                        b = _resize_nearest(
                            decode_image(bytes(b)), width, height
                        )
                        # the payload was RE-ENCODED as 24-bit BMP: the
                        # metadata must say so, whatever format came in
                        # (a resized PPM labeled image/ppm would lie to
                        # every metadata consumer downstream)
                        media_type = "image/bmp"
                    except NotImplementedError:
                        pass  # codec absent here: passthrough branch
                payloads.append(b)
                metas.append(
                    {
                        "media_type": media_type,
                        "width": width,
                        "height": height,
                        "duration_ms": m.get("duration_ms"),
                    }
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads, "meta": metas}
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
