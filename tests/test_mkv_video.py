"""WebM/Matroska VIDEO pixel decode (r15): VP8 keyframe extraction from
Clusters + the existing bit-exact VP8 decoder. The container bytes are
built HERE by an independent spec-written muxer (RFC 8794 EBML + the
Matroska element registry), never by the parser under test; the VP8
frame bytes are the libwebp-encoded goldens from test_vp8.

Reference parity note: the reference (128-line log-parsing Lambda,
/root/reference/log-processor/lambda_function.py) performs no media
decoding; this covers the training-data-pipeline multimodal surface."""

from __future__ import annotations

import base64
import struct

import numpy as np
import pytest

from test_vp8 import GOLDEN_GRADIENT, GOLDEN_NOISE

from aws_cloudfront_realtime_monitoring_spark.operators.mkv import (
    decode_webm_video_pixels,
    extract_video_keyframe,
    parse_webm_meta,
)
from aws_cloudfront_realtime_monitoring_spark.operators.vp8 import (
    decode_vp8_pixels,
)


# ------------------------------------------------ independent muxer

def _vint(value: int) -> bytes:
    n = 1
    while value >= (1 << (7 * n)) - 1:
        n += 1
    return ((1 << (7 * n)) | value).to_bytes(n, "big")


def _el(stored_id: int, body: bytes) -> bytes:
    eid = stored_id.to_bytes((stored_id.bit_length() + 7) // 8, "big")
    return eid + _vint(len(body)) + body


def _uint_el(stored_id: int, v: int) -> bytes:
    return _el(stored_id, v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big"))


def mux_webm(frames: list[tuple[int, bytes, bool]], codec: str = "V_VP8",
             track_no: int = 1, w: int = 24, h: int = 20,
             use_blockgroup: bool = False,
             extra_track_first: bool = False,
             clusters_first: bool = False,
             lacing_flags: int = 0) -> bytes:
    """Minimal WebM: EBML header + Segment(Info, Tracks(video),
    Cluster(Timestamp, blocks)). ``frames`` is (ts, payload, keyframe).
    ``use_blockgroup`` wraps frames in BlockGroup/Block (keyframe =
    no ReferenceBlock); otherwise SimpleBlocks with the 0x80 flag."""
    header = _el(0x1A45DFA3, _el(0x4282, b"webm"))
    info = _uint_el(0x2AD7B1, 1_000_000)
    video = _uint_el(0xB0, w) + _uint_el(0xBA, h)
    tracks_body = b""
    if extra_track_first:  # an AUDIO track the extractor must skip
        tracks_body += _el(0xAE, _uint_el(0xD7, 7)
                           + _uint_el(0x73C5, 7) + _uint_el(0x83, 2)
                           + _el(0x86, b"A_OPUS"))
    tracks_body += _el(0xAE, _uint_el(0xD7, track_no)
                       + _uint_el(0x73C5, 1) + _uint_el(0x83, 1)
                       + _el(0x86, codec.encode()) + _el(0xE0, video))
    blocks = b""
    for ts, payload, key in frames:
        flags = (0x80 if (key and not use_blockgroup) else 0) | lacing_flags
        blk = _vint(track_no) + struct.pack(">hB", ts, flags) + payload
        if use_blockgroup:
            body = _el(0xA1, blk)
            if not key:
                body += _uint_el(0xFB, 0)  # ReferenceBlock: not a keyframe
            blocks += _el(0xA0, body)
        else:
            blocks += _el(0xA3, blk)
    cluster = _el(0x1F43B675, _uint_el(0xE7, 0) + blocks)
    tracks = _el(0x1654AE6B, tracks_body)
    # clusters_first: the legal streamed layout where Clusters precede
    # Tracks inside the Segment (r15 ADVICE) — the extractor must resolve
    # the track in a first pass, then re-walk for blocks
    body = (cluster + tracks) if clusters_first else (tracks + cluster)
    seg = _el(0x18538067, _el(0x1549A966, info) + body)
    return header + seg


def _golden_vp8(b64: str) -> bytes:
    webp = base64.b64decode(b64)
    pos = 12
    while pos + 8 <= len(webp):
        tag = webp[pos:pos + 4]
        size = struct.unpack_from("<I", webp, pos + 4)[0]
        if tag == b"VP8 ":
            return webp[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)
    raise AssertionError("no VP8 chunk in golden")


def test_simpleblock_keyframe_decodes_identically_to_raw():
    vp8 = _golden_vp8(GOLDEN_GRADIENT)
    webm = mux_webm([(0, vp8, True)])
    codec, frame = extract_video_keyframe(webm)
    assert codec == "V_VP8" and frame == vp8
    w, h, px = decode_webm_video_pixels(webm)
    rw, rh, rpx = decode_vp8_pixels(vp8)
    assert (w, h) == (rw, rh) == (24, 20)
    assert np.array_equal(px, rpx)
    # and the metadata walk still reads the same container
    meta = parse_webm_meta(webm)
    assert (meta["width"], meta["height"], meta["codec"]) == (24, 20, "V_VP8")


def test_non_key_simpleblocks_are_skipped_until_a_keyframe():
    vp8 = _golden_vp8(GOLDEN_NOISE)
    junk = b"\x00" * 40  # an interframe payload the extractor must skip
    webm = mux_webm([(0, junk, False), (1, vp8, True)], w=16, h=16)
    codec, frame = extract_video_keyframe(webm)
    assert frame == vp8


def test_blockgroup_keyframe_via_absent_referenceblock():
    vp8 = _golden_vp8(GOLDEN_NOISE)
    webm = mux_webm([(0, b"\x01" * 30, False), (1, vp8, True)],
                    w=16, h=16, use_blockgroup=True)
    codec, frame = extract_video_keyframe(webm)
    assert frame == vp8
    w, h, px = decode_webm_video_pixels(webm)
    assert (w, h) == (16, 16)


def test_clusters_before_tracks_streamed_layout():
    # Matroska permits Clusters ahead of Tracks in streamed layouts; the
    # two-pass extractor must still find the keyframe (r15 ADVICE)
    vp8 = _golden_vp8(GOLDEN_GRADIENT)
    webm = mux_webm([(0, vp8, True)], clusters_first=True)
    codec, frame = extract_video_keyframe(webm)
    assert codec == "V_VP8" and frame == vp8
    w, h, px = decode_webm_video_pixels(webm)
    assert (w, h) == (24, 20)


def test_extractor_skips_non_video_tracks():
    vp8 = _golden_vp8(GOLDEN_GRADIENT)
    webm = mux_webm([(0, vp8, True)], extra_track_first=True)
    codec, frame = extract_video_keyframe(webm)
    assert codec == "V_VP8" and frame == vp8


def test_video_decode_scope_and_error_contract():
    vp8 = _golden_vp8(GOLDEN_GRADIENT)
    # non-VP8 codec: extraction works, pixel decode states the gate
    webm_vp9 = mux_webm([(0, vp8, True)], codec="V_VP9")
    assert extract_video_keyframe(webm_vp9)[0] == "V_VP9"
    with pytest.raises(ValueError, match="ffmpeg"):
        decode_webm_video_pixels(webm_vp9)
    # laced video block: refused, not mis-parsed
    with pytest.raises(ValueError, match="laced"):
        extract_video_keyframe(mux_webm([(0, vp8, True)], lacing_flags=0x02))
    # no keyframe at all
    with pytest.raises(ValueError, match="keyframe"):
        extract_video_keyframe(mux_webm([(0, b"\x00" * 10, False)]))
    # no video track
    audio_only = mux_webm([], extra_track_first=True)
    audio_only = audio_only.replace(b"V_VP8", b"A_VORB")  # break the video entry
    with pytest.raises(ValueError):
        extract_video_keyframe(mux_webm([(0, vp8, True)],
                                        codec="V_VP8")[:40])  # truncated
    # malformed bytes stay inside the ValueError contract
    with pytest.raises(ValueError):
        extract_video_keyframe(b"\x1a\x45\xdf\xa3" + b"\xff" * 8)
