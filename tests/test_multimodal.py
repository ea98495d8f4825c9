"""Multimodal plumbing tests: binary columns through Arrow batches, stub
decode contract, frame sampling arithmetic."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_cloudfront_realtime_monitoring_spark.operators.multimodal import (
    attach_payload,
    decode_batches,
    decode_image_stub,
    frame_sample_offsets,
)
from aws_cloudfront_realtime_monitoring_spark.sources.tables import load_table


def test_strict_decode_raises():
    with pytest.raises(NotImplementedError):
        decode_image_stub(1, b"abc", strict=True)


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
