"""Multimodal plumbing tests: binary columns through Arrow batches, the
real-BMP / fake-fallback decode contract, frame sampling arithmetic."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from aws_cloudfront_realtime_monitoring_spark.operators.multimodal import (
    attach_payload,
    decode_batches,
    decode_bmp_pixels,
    decode_image,
    frame_sample_offsets,
)
from aws_cloudfront_realtime_monitoring_spark.sources.tables import load_table


def _make_bmp(pixels: np.ndarray, top_down: bool = False) -> bytes:
    """Hand-build an uncompressed 24-bit BMP from an RGB[h, w, 3] array --
    an independent golden-bytes encoder (header layout written from the
    format spec, not from the decoder under test)."""
    h, w, _ = pixels.shape
    stride = (w * 3 + 3) & ~3
    rows = []
    order = range(h) if top_down else range(h - 1, -1, -1)
    for y in order:
        row = pixels[y, :, ::-1].tobytes()  # RGB -> BGR
        rows.append(row + b"\x00" * (stride - len(row)))
    pix = b"".join(rows)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, -h if top_down else h, 1, 24, 0, len(pix),
        2835, 2835, 0, 0,
    )
    hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pix), 0, 0, 14 + 40)
    return hdr + info + pix


def test_strict_decode_raises_for_undectable_formats():
    with pytest.raises(NotImplementedError):
        decode_image(1, b"abc", strict=True)
    # a "BM"-prefixed non-BMP must raise under strict, fall back otherwise
    with pytest.raises(ValueError):
        decode_image(1, b"BMnot really a bitmap", strict=True)
    meta = decode_image(1, b"BMnot really a bitmap")
    assert meta["fmt"] in ("jpeg", "png", "webp")  # fake fallback


def test_bmp_decodes_for_real():
    """Golden-bytes check: a hand-built 24-bit BMP decodes to its exact
    pixel array (both bottom-up and top-down row orders), and the metadata
    path reports the true dimensions -- the decode step is not a stub for
    this format."""
    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(3, 5, 3), dtype=np.uint8)
    for top_down in (False, True):
        payload = _make_bmp(px, top_down=top_down)
        w, h, got = decode_bmp_pixels(payload)
        assert (w, h) == (5, 3)
        np.testing.assert_array_equal(got, px)
        meta = decode_image(9, payload, strict=True)
        assert meta == {
            "doc_id": 9, "n_bytes": len(payload), "width": 5, "height": 3,
            "n_frames": 1, "fmt": "bmp",
        }
    # malformed variants are rejected, not mis-decoded
    with pytest.raises(ValueError):
        decode_bmp_pixels(_make_bmp(px)[:40])          # truncated header
    with pytest.raises(ValueError):
        decode_bmp_pixels(_make_bmp(px)[:-8])          # truncated pixels


def test_bmp_payloads_through_mapinpandas(spark):
    """The SAME mapInPandas contract carries real BMP bytes end-to-end:
    schema, batching, and metadata all come from the actual header."""
    rng = np.random.RandomState(11)
    rows = [
        (int(i), bytearray(_make_bmp(
            rng.randint(0, 256, size=(4 + i, 6 + i, 3), dtype=np.uint8)
        )))
        for i in range(3)
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, payload BINARY")
    got = {r.doc_id: r for r in decode_batches(df).collect()}
    for i in range(3):
        assert got[i].fmt == "bmp"
        assert (got[i].width, got[i].height) == (6 + i, 4 + i)
        assert got[i].n_frames == 1


def test_payload_is_binary_and_roundtrips(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    p = attach_payload(docs)
    assert dict(p.dtypes)["payload"] == "binary"
    row = p.join(docs, "doc_id").select("payload", "text").first()
    assert bytes(row.payload) == row.text.encode("utf-8")


def test_decode_batches_schema_and_determinism(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = decode_batches(attach_payload(docs))
    assert out.columns == ["doc_id", "n_bytes", "width", "height", "n_frames", "fmt"]
    a = sorted(out.collect())
    b = sorted(decode_batches(attach_payload(docs)).collect())
    assert a == b  # deterministic across runs/partitionings
    r = a[0]
    assert 16 <= r.width < 640 and 16 <= r.height < 480
    assert 1 <= r.n_frames <= 24


def test_frame_offsets_bounds(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = frame_sample_offsets(decode_batches(attach_payload(docs)))
    for r in out.collect():
        assert len(r.frame_offsets) == 4
        assert all(0 <= o < r.n_bytes for o in r.frame_offsets)
        assert r.frame_offsets == sorted(r.frame_offsets)
