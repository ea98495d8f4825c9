"""Hostile-input property tests for the MP4/ISO-BMFF and Matroska/EBML
container parsers (r11 verdict task: fuzz the EBML vint reader and the
box-size arithmetic -- 64-bit sizes, size-0 boxes, unknown-size
elements nested in known-size parents -- against the visit caps).

Builders are imported from the golden suites (independent, spec-written
there); adversarial structures are assembled here by hand.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from aws_cloudfront_realtime_monitoring_spark.operators import mkv as mkv_mod
from aws_cloudfront_realtime_monitoring_spark.operators import mp4 as mp4_mod
from aws_cloudfront_realtime_monitoring_spark.operators.mkv import (
    _read_vint,
    parse_webm_meta,
)
from aws_cloudfront_realtime_monitoring_spark.operators.mp4 import (
    parse_mp4_meta,
)
from test_mkv import _ebml_header, _el, _uint_el, _vint_size, make_webm
from test_mkv import _video_track as _webm_video_track
from test_mp4 import _box, _ftyp, _full, _mvhd, _trak, _visual_entry, make_mp4


def _assert_contract(parse, payload: bytes) -> None:
    """The executor-task contract: a dict back or ValueError -- never
    any other exception, never a hang (bounded by the visit caps)."""
    try:
        out = parse(payload)
    except ValueError:
        return
    assert isinstance(out, dict)
    # every numeric field must fit the downstream LongType column
    for k, v in out.items():
        if isinstance(v, int):
            assert -(1 << 63) <= v < (1 << 63), (k, v)


# ------------------------------------------------------------- EBML vint


def test_ebml_vint_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.integers(1, 8).flatmap(lambda n: st.tuples(
        st.just(n), st.integers(0, (1 << (7 * n)) - 2))))
    def check(args):
        n, value = args
        enc = _vint_size(value, width=n)
        got, nxt = _read_vint(enc + b"tail", 0, keep_marker=False)
        assert (got, nxt) == (value, len(enc))
        # stored form keeps the marker bit
        raw, nxt2 = _read_vint(enc, 0, keep_marker=True)
        assert nxt2 == len(enc)
        assert raw == int.from_bytes(enc, "big")

    check()


def test_ebml_vint_all_ones_is_unknown_size():
    for n in range(1, 9):
        enc = ((1 << (7 * n)) | ((1 << (7 * n)) - 1)).to_bytes(n, "big")
        got, nxt = _read_vint(enc, 0, keep_marker=False)
        assert (got, nxt) == (-1, n)


def test_ebml_vint_hostile_bytes_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.binary(min_size=0, max_size=12), st.integers(0, 12))
    def check(data, pos):
        for keep in (True, False):
            try:
                val, nxt = _read_vint(data, pos, keep_marker=keep)
            except ValueError:
                continue
            assert pos < nxt <= len(data)
            assert val >= (0 if keep else -1)

    check()


def test_ebml_vint_zero_first_byte_rejected():
    with pytest.raises(ValueError, match="varint"):
        _read_vint(b"\x00\xff\xff", 0, keep_marker=False)


# -------------------------------------------------- EBML structure fuzz


def test_webm_unknown_size_nested_in_known_parent():
    """RFC 8794's streaming case, nested the OTHER way round: an
    unknown-size Info (extends to its parent's end) inside a known-size
    Segment, and an unknown-size Segment holding known-size children --
    both must parse, never crash or escape the parent."""
    info_body = _uint_el(0x2AD7B1, 2_000_000) + _el(
        0x4489, struct.pack(">d", 1500.0))
    # unknown-size Info: id + all-ones size + body, last child of Segment
    unk_info = (0x1549A966).to_bytes(4, "big") + b"\xff" + info_body
    tracks = _el(0x1654AE6B, _webm_video_track(b"V_VP9", 64, 48))
    seg = _el(0x18538067, tracks + unk_info)
    meta = parse_webm_meta(_ebml_header() + seg)
    assert (meta["width"], meta["height"], meta["codec"]) == (64, 48, "V_VP9")
    assert meta["duration_ms"] == 3000  # 1500 ticks x 2ms

    # unknown-size Segment wrapping known-size children (the common
    # streamed layout) is already golden-tested; re-pin it here next to
    # its inverse
    blob = make_webm([_webm_video_track(b"V_AV1", 8, 6)],
                     unknown_segment_size=True)
    meta = parse_webm_meta(blob)
    assert meta["codec"] == "V_AV1"


def test_webm_element_cap_and_depth_cap(monkeypatch):
    # count cap: a flood of 2-byte Void elements inside the Segment
    monkeypatch.setattr(mkv_mod, "_MAX_ELEMENTS", 500)
    flood = _el(0x18538067, b"\xec\x80" * 600)
    with pytest.raises(ValueError, match="cap"):
        parse_webm_meta(_ebml_header() + flood)
    monkeypatch.setattr(mkv_mod, "_MAX_ELEMENTS", 1_000_000)
    # depth cap: Segments nested past _MAX_DEPTH
    inner = _uint_el(0x2AD7B1, 1)
    for _ in range(mkv_mod._MAX_DEPTH + 2):
        inner = _el(0x18538067, inner)
    with pytest.raises(ValueError, match="depth"):
        parse_webm_meta(_ebml_header() + inner)


def test_webm_crafted_duration_floats_clamp_to_zero():
    for bits in (struct.pack(">d", float("nan")),
                 struct.pack(">d", float("inf")),
                 struct.pack(">d", float("-inf")),
                 struct.pack(">d", -5.0),
                 struct.pack(">d", 1e300),
                 struct.pack(">f", np.float32(np.nan))):
        info = _uint_el(0x2AD7B1, 1_000_000) + _el(0x4489, bits)
        seg = _el(0x18538067, _el(0x1549A966, info))
        meta = parse_webm_meta(_ebml_header() + seg)
        assert meta["duration_ms"] == 0, bits.hex()
    # finite ticks x astronomically large tscale also clamps
    info = _uint_el(0x2AD7B1, (1 << 63) - 1) + _el(
        0x4489, struct.pack(">d", 1e15))
    seg = _el(0x18538067, _el(0x1549A966, info))
    assert parse_webm_meta(_ebml_header() + seg)["duration_ms"] == 0


def test_webm_mutation_fuzz_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    base = make_webm([_webm_video_track(b"V_VP9", 320, 240)])

    @settings(max_examples=250, deadline=None)
    @given(st.lists(st.tuples(st.integers(0, len(base) - 1),
                              st.integers(0, 255)),
                    min_size=1, max_size=6),
           st.integers(4, len(base)))
    def check(edits, cut):
        blob = bytearray(base[:cut])
        for off, val in edits:
            if off < len(blob):
                blob[off] = val
        _assert_contract(parse_webm_meta, bytes(blob))

    check()


# ----------------------------------------------- MP4 box-size arithmetic


def test_mp4_largesize_edge_values():
    moov = _box(b"moov", _mvhd(1000, 4000))
    # 64-bit size that exactly matches: parses
    blob = _ftyp() + _box(b"moov", _mvhd(1000, 4000), large=True)
    assert parse_mp4_meta(blob)["duration_ms"] == 4000
    for large in ((1 << 63), (1 << 64) - 1, 15, 17):
        # largesize escaping the file / below the 16-byte header / off
        # by one: ValueError, never a hang or wraparound
        hdr = struct.pack(">I", 1) + b"moov" + struct.pack(">Q", large)
        _assert_contract(parse_mp4_meta, _ftyp() + hdr + _mvhd(1000, 1)[8:])
        try:
            parse_mp4_meta(_ftyp() + hdr)
        except ValueError:
            continue
        raise AssertionError(f"largesize {large} accepted")
    # truncated largesize field (size==1 but fewer than 8 bytes left)
    _assert_contract(parse_mp4_meta,
                     _ftyp() + struct.pack(">I", 1) + b"moov" + b"\x00\x01")
    del moov


def test_mp4_size_zero_boxes():
    # size-0 as the FINAL box is golden-tested; size-0 in the MIDDLE of
    # a container swallows its siblings -- legal leniency, must not
    # crash, and the swallowed trailing garbage must not escape
    trak = _trak(b"vide", _visual_entry(b"av01", 32, 24), 7, w=32, h=24)
    inner = struct.pack(">I", 0) + b"stbl"  # size-0 inside moov
    blob = _ftyp() + _box(b"moov", _mvhd(1000, 100) + inner + trak)
    _assert_contract(parse_mp4_meta, blob)
    # size-0 box whose remaining space is exactly the 8-byte header
    blob = _ftyp() + _box(b"moov", _mvhd(1000, 100) + struct.pack(">I", 0)
                          + b"free")
    meta = parse_mp4_meta(blob)
    assert meta["duration_ms"] == 100


def test_mp4_box_and_depth_caps(monkeypatch):
    monkeypatch.setattr(mp4_mod, "_MAX_BOXES", 300)
    flood = _ftyp() + _box(b"free", b"") * 400
    with pytest.raises(ValueError, match="cap"):
        parse_mp4_meta(flood)
    monkeypatch.setattr(mp4_mod, "_MAX_BOXES", 1_000_000)
    nested = _mvhd(1000, 1)
    for _ in range(mp4_mod._MAX_DEPTH + 2):
        nested = _box(b"moov", nested)
    with pytest.raises(ValueError, match="depth"):
        parse_mp4_meta(_ftyp() + nested)


def test_mp4_real_cap_is_generous_for_flat_walks():
    """50k top-level boxes (a long fragmented tail without moov) stay
    WELL under the 1M cap and parse in bounded time."""
    blob = _ftyp() + _box(b"free", b"") * 50_000
    meta = parse_mp4_meta(blob)
    assert meta["codec"] == "" and meta["n_frames"] == 0


def test_mp4_duration_overflow_clamps_to_zero():
    # u64 duration at timescale 1: ~5.8e11 years in ms -- past int64;
    # the record must survive with duration 0, not kill a LongType
    # column downstream
    blob = _ftyp() + _box(b"moov", _mvhd(1, (1 << 64) - 2, version=1))
    assert parse_mp4_meta(blob)["duration_ms"] == 0
    # and the biggest sane duration still passes through untouched
    blob = _ftyp() + _box(b"moov", _mvhd(1000, 1 << 40, version=1))
    assert parse_mp4_meta(blob)["duration_ms"] == (1 << 40)


def test_mp4_mutation_fuzz_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    base = make_mp4(
        [_trak(b"vide", _visual_entry(b"avc1", 640, 360), 90, w=640, h=360)]
    )

    @settings(max_examples=250, deadline=None)
    @given(st.lists(st.tuples(st.integers(0, len(base) - 1),
                              st.integers(0, 255)),
                    min_size=1, max_size=6),
           st.integers(4, len(base)))
    def check(edits, cut):
        blob = bytearray(base[:cut])
        for off, val in edits:
            if off < len(blob):
                blob[off] = val
        _assert_contract(parse_mp4_meta, bytes(blob))

    check()
