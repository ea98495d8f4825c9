"""Audio-payload plumbing: REAL WAV (RIFF/PCM) decode + feature
extraction over Arrow-batched ``mapInPandas`` — the audio leg of the
multimodal contract (images: ``operators/multimodal.py``; the Spark-side
shape is identical: binary column in, declared typed schema out, a
narrow map with no shuffle, payload bytes never leaving the executor).

WAV is decodable with stdlib ``struct`` + numpy alone: a RIFF container
(``RIFF <size> WAVE``), a ``fmt `` chunk (PCM tag 1, channel count,
sample rate, bits per sample — 8-bit unsigned or 16-bit signed LE
supported), and a ``data`` chunk of interleaved frames. Compressed
formats (IEEE float, ADPCM, mp3-in-RIFF) raise ``ValueError`` and take
the caller's fallback, the same contract as the image decoders'
unsupported profiles.

The features are the standard cheap audio-curation signals (the audio
analog of text_profile's one-pass stats): duration, RMS energy and
zero-crossing rate — enough to drop silent/clipped/garbage clips before
an expensive model ever sees them.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

#: output schema of the audio feature step (integer-quantized features so
#: cross-engine comparisons stay exact: rms/zcr scaled by 1e6)
AUDIO_SCHEMA = (
    "doc_id BIGINT, n_bytes BIGINT, sample_rate BIGINT, n_channels BIGINT, "
    "n_samples BIGINT, duration_ms BIGINT, rms_micro BIGINT, "
    "zcr_micro BIGINT, fmt STRING"
)


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    try:
        return _decode_wav(payload)
    except (struct.error, IndexError, TypeError) as exc:
        # corrupt bytes surface as ValueError only (fallback contract)
        raise ValueError(f"malformed WAV: {exc}") from exc


def _decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """REAL decoder for PCM WAV: returns (sample_rate, n_channels,
    samples[n_frames, n_channels] float64 in [-1, 1]). Raises
    ``ValueError`` on malformed RIFF or non-PCM encodings."""
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt_chunk, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError("truncated WAV chunk")
        if cid == b"fmt ":
            fmt_chunk = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
    if fmt_chunk is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if len(fmt_chunk) < 16:
        raise ValueError("malformed WAV fmt chunk")
    audio_fmt, channels, rate, _brate, _align, bits = struct.unpack_from(
        "<HHIIHH", fmt_chunk, 0
    )
    if audio_fmt != 1:
        raise ValueError(f"non-PCM WAV (format tag {audio_fmt}) unsupported")
    if channels < 1 or rate < 1:
        raise ValueError("degenerate WAV channel count / sample rate")
    if bits == 16:
        raw = np.frombuffer(data, "<i2", len(data) // 2)
        samples = raw.astype(np.float64) / 32768.0
    elif bits == 8:  # 8-bit WAV is UNSIGNED per the spec
        raw = np.frombuffer(data, np.uint8)
        samples = (raw.astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"{bits}-bit WAV unsupported")
    n_frames = len(samples) // channels
    return rate, channels, samples[: n_frames * channels].reshape(
        n_frames, channels
    )


def wav_features(doc_id: int, payload: bytes) -> dict:
    """One payload -> the :data:`AUDIO_SCHEMA` feature row."""
    rate, channels, samples = decode_wav(payload)
    mono = samples.mean(axis=1)
    n = len(mono)
    rms = float(np.sqrt(np.mean(mono**2))) if n else 0.0
    # zero-crossing rate: fraction of adjacent sample pairs changing sign
    zcr = (
        float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
        if n > 1
        else 0.0
    )
    return {
        "doc_id": doc_id,
        "n_bytes": len(payload),
        "sample_rate": rate,
        "n_channels": channels,
        "n_samples": n,
        "duration_ms": int(n * 1000 // rate),
        "rms_micro": int(round(rms * 1_000_000)),
        "zcr_micro": int(round(zcr * 1_000_000)),
        "fmt": "wav",
    }


def audio_feature_batches(
    docs_with_payload: DataFrame, skip_invalid: bool = True
) -> DataFrame:
    """Arrow-batched feature extraction (the image decode_batches shape):
    per-batch pandas processing, bounded memory, declared schema, no
    driver involvement. Input: (doc_id BIGINT, payload BINARY).

    ``skip_invalid`` (default): undecodable payloads are DROPPED instead
    of failing the task -- the production curation behavior for corrupt
    records at 100 TB (count them via an input-vs-output row diff);
    ``skip_invalid=False`` propagates the ValueError for strict runs."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                # NULL payloads/doc_ids take the skip_invalid path
                # explicitly (bytes(None) would TypeError past the
                # handler; int(NaN) raised ValueError only by accident)
                if pd.isna(r.doc_id):
                    if skip_invalid:
                        continue
                    raise ValueError("NULL doc_id in audio batch")
                payload = bytes(r.payload) if r.payload is not None else b""
                try:
                    rows.append(wav_features(int(r.doc_id), payload))
                except ValueError:
                    if not skip_invalid:
                        raise
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_bytes", "sample_rate", "n_channels",
                    "n_samples", "duration_ms", "rms_micro", "zcr_micro",
                    "fmt",
                ],
            )

    return docs_with_payload.mapInPandas(feats, AUDIO_SCHEMA)
