"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, processed by Arrow-batched pandas iterators (``mapInPandas``).

The decode step is REAL for uncompressed BMP payloads (pure-numpy header
parse + pixel extraction -- no media library needed) and, when Pillow is
present in the environment, for every format PIL opens (feature-flagged
import; this build has no PIL). Payloads in any other format fall back to
``fake_decode`` -- a deterministic metadata fake derived from payload
bytes -- unless ``strict=True``, which raises instead. The Spark-side
design is identical in all three cases and is what matters at 100 TB of
media: binary column handling, Arrow batch transfer, a declared output
schema, per-partition batching -- a narrow map with no shuffle, payload
bytes never leaving the executor.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # feature flag: real general-format decode iff Pillow exists
    from PIL import Image as _PILImage  # pragma: no cover (absent here)
except ImportError:
    _PILImage = None

#: output schema of the decode step
DECODE_SCHEMA = (
    "doc_id BIGINT, n_bytes BIGINT, width BIGINT, height BIGINT, "
    "n_frames BIGINT, fmt STRING"
)


def fake_decode(doc_id: int, payload: bytes) -> dict:
    """Deterministic fake decode (documented stub): metadata derived purely
    from payload length and id, so an external oracle can verify the
    plumbing end-to-end."""
    n = len(payload)
    return {
        "doc_id": doc_id,
        "n_bytes": n,
        "width": (n * 7919) % 624 + 16,
        "height": (n * 104729) % 464 + 16,
        "n_frames": n % 24 + 1,
        "fmt": ("jpeg", "png", "webp")[doc_id % 3],
    }


def decode_bmp_pixels(payload: bytes) -> tuple[int, int, np.ndarray]:
    """REAL decoder for uncompressed 24-bit BMP: returns (width, height,
    pixels[h, w, 3] uint8 in RGB, top-down row order). Raises ``ValueError``
    on anything that is not a well-formed BI_RGB 24bpp BMP.

    BMP is simple enough to decode exactly with numpy alone: a 14-byte file
    header (magic ``BM``, pixel-array offset at byte 10), a BITMAPINFOHEADER
    (width/height int32 LE at 18/22, bpp uint16 at 28, compression uint32 at
    30), then bottom-up (or top-down if height < 0) pixel rows of BGR
    triples, each row zero-padded to a 4-byte boundary."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (pix_off,) = struct.unpack_from("<I", payload, 10)
    width, height = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, comp={compression})")
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height <= 0:
        raise ValueError("degenerate BMP dimensions")
    stride = (width * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    need = pix_off + stride * height
    if len(payload) < need:
        raise ValueError(f"truncated BMP: {len(payload)} < {need} bytes")
    rows = np.frombuffer(payload, np.uint8, stride * height, pix_off)
    bgr = rows.reshape(height, stride)[:, : width * 3].reshape(height, width, 3)
    rgb = bgr[:, :, ::-1]
    return width, height, (rgb if top_down else rgb[::-1])


def decode_image(doc_id: int, payload: bytes, strict: bool = False) -> dict:
    """Decode an image payload into the :data:`DECODE_SCHEMA` metadata row.

    Uncompressed BMP decodes for real (header + pixel array,
    :func:`decode_bmp_pixels`); other formats decode via Pillow when the
    environment has it, else fall back to :func:`fake_decode` -- or raise
    ``NotImplementedError`` under ``strict=True``."""
    if payload[:2] == b"BM":
        try:
            width, height, _px = decode_bmp_pixels(payload)
            return {
                "doc_id": doc_id,
                "n_bytes": len(payload),
                "width": width,
                "height": height,
                "n_frames": 1,
                "fmt": "bmp",
            }
        except ValueError:
            # a "BM"-prefixed payload that is NOT a well-formed BMP (e.g.
            # text bytes) is an unrecognized format, not an error: fall
            # through to PIL/fake like any other payload; strict re-raises
            if strict:
                raise
    if _PILImage is not None:  # pragma: no cover (PIL absent in this build)
        import io

        with _PILImage.open(io.BytesIO(payload)) as im:
            return {
                "doc_id": doc_id,
                "n_bytes": len(payload),
                "width": im.width,
                "height": im.height,
                "n_frames": getattr(im, "n_frames", 1),
                "fmt": (im.format or "unknown").lower(),
            }
    if strict:
        raise NotImplementedError(
            "real decode of non-BMP formats requires Pillow/ffmpeg, not "
            "present in this build"
        )
    return fake_decode(doc_id, payload)


#: back-compat alias (pre-r6 name, when ALL formats were stubbed)
decode_image_stub = decode_image


def attach_payload(docs: DataFrame) -> DataFrame:
    """Materialize an opaque binary column (here: utf-8 bytes of ``text``
    standing in for image bytes) -- the multimodal storage model: payloads
    are ``binary``, metadata is typed columns."""
    return docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))


def decode_batches(docs_with_payload: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """Run the (stubbed) decoder over Arrow batches via ``mapInPandas``.

    The iterator shape is the real pattern for media pipelines: per-batch
    pandas processing, bounded memory, no driver involvement, output schema
    declared up front.
    """

    def decode_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                decode_image(int(r.doc_id), bytes(r.payload))
                for r in pdf.itertuples(index=False)
            ]
            yield pd.DataFrame(out)

    return docs_with_payload.mapInPandas(decode_iter, DECODE_SCHEMA)


def frame_sample_offsets(decoded: DataFrame, n_samples: int = 4) -> DataFrame:
    """Deterministic frame-sampling plan: evenly spaced byte offsets per
    payload (stand-in for video frame sampling). Pure Catalyst arithmetic --
    the sampling plan is computable without touching payload bytes."""
    step = F.greatest(F.expr("n_bytes div %d" % n_samples), F.lit(1))
    offsets = F.transform(
        F.sequence(F.lit(0), F.lit(n_samples - 1)),
        lambda i: F.least(i * step, F.col("n_bytes") - 1),
    )
    return decoded.select("doc_id", "n_bytes", offsets.alias("frame_offsets"))
