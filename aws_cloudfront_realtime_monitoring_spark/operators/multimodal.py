"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, processed by Arrow-batched pandas iterators (``mapInPandas``).

Real image/audio decode libraries are not in this environment, so the decode
step is STUBBED: ``decode_image_stub`` raises ``NotImplementedError`` when
``strict=True`` and otherwise produces a deterministic fake derived from the
payload bytes. Everything around the stub -- binary column handling, Arrow
batch transfer, output schema, per-partition batching -- is real and is what
matters for the Spark-side design: the pattern scales to 100 TB of media
because each batch is processed independently (narrow map, no shuffle) and
payload bytes never leave the executor.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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


def decode_image_stub(doc_id: int, payload: bytes, strict: bool = False) -> dict:
    """Decode an image payload. STUB: real decoding (PIL/ffmpeg) is not
    available in this environment."""
    if strict:
        raise NotImplementedError(
            "real image decode requires PIL/ffmpeg, not present in this build"
        )
    return fake_decode(doc_id, payload)


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
                decode_image_stub(int(r.doc_id), bytes(r.payload))
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
