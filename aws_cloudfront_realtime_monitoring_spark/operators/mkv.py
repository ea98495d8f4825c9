"""Matroska/WebM (EBML, RFC 8794 + the public Matroska spec) container
metadata parser in pure stdlib — the MP4 sibling for the other half of
real-world video corpora.

Scope mirrors ``operators/mp4.py``: CODEC payloads stay behind the
ffmpeg feature flag, but the metadata a curation pipeline filters on is
plain element structure:

- EBML elements are [id varint][size varint][payload]; the id keeps its
  length-marker bit (stored form), the size strips it. An all-ones size
  is "unknown" (streamed files) and extends to the parent's end;
- the EBML header's DocType says "webm" or "matroska";
- ``Segment > Info`` carries TimestampScale (ns per tick, default 1e6)
  and Duration (a float, in ticks);
- ``Segment > Tracks > TrackEntry`` carries TrackType (1 = video),
  CodecID ("V_VP9", "V_AV1", ...), and a Video element with
  PixelWidth/PixelHeight. First video track wins; audio-only files
  report the audio codec with zero dimensions;
- Clusters (the bulk) are skipped wholesale; per-frame counts would
  need a cluster walk, so ``n_frames`` is 0 — the honest "unknown",
  unlike MP4's stsz which states it outright.

Robustness contract as everywhere in the media family: malformed bytes
raise ``ValueError`` only; depth/element caps bound hostile inputs.
"""

from __future__ import annotations

import struct

_EBML_MAGIC = b"\x1a\x45\xdf\xa3"

#: containers worth descending into (stored-form ids)
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_VIDEO = 0xE0

_DOCTYPE = 0x4282
_TIMESTAMP_SCALE = 0x2AD7B1
_DURATION = 0x4489
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_PIXEL_WIDTH = 0xB0
_PIXEL_HEIGHT = 0xBA

#: generous (r11 review: 4096 counted every skipped Cluster, so a legal
#: 2-hour WebM with ~2s clusters was rejected as malformed); header
#: visits are O(1) and the walk stops once Info + Tracks are committed,
#: so the cap only bounds crafted payloads
_MAX_ELEMENTS = 1_000_000
_MAX_DEPTH = 16


def is_webm(payload: bytes) -> bool:
    return payload[:4] == _EBML_MAGIC


def _read_vint(data: bytes, pos: int, keep_marker: bool) -> tuple[int, int]:
    """(value, next_pos) of an EBML varint at ``pos``. ``keep_marker``
    keeps the length-descriptor bit (element IDs are matched in stored
    form); sizes strip it. Returns value -1 for an all-ones "unknown
    size" (only meaningful with keep_marker=False)."""
    if pos >= len(data):
        raise ValueError("truncated EBML varint")
    first = data[pos]
    if first == 0:
        raise ValueError("invalid EBML varint length")
    n = 8 - first.bit_length() + 1  # leading zeros + 1
    if pos + n > len(data):
        raise ValueError("truncated EBML varint")
    raw = int.from_bytes(data[pos : pos + n], "big")
    if keep_marker:
        return raw, pos + n
    marker = 1 << (7 * n)
    val = raw - marker
    if val == marker - 1:  # all value bits set: unknown size
        return -1, pos + n
    return val, pos + n


def _uint(body: bytes) -> int:
    if len(body) > 8:
        raise ValueError("oversized EBML uint")
    return int.from_bytes(body, "big")


def _float(body: bytes) -> float:
    if len(body) == 4:
        return struct.unpack(">f", body)[0]
    if len(body) == 8:
        return struct.unpack(">d", body)[0]
    if len(body) == 0:
        return 0.0
    raise ValueError("invalid EBML float width")


class _Walk:
    def __init__(self) -> None:
        self.elements = 0
        self.doctype = ""
        self.tscale = 1_000_000  # spec default: 1 ms ticks
        self.duration_ticks = 0.0
        self.width = 0
        self.height = 0
        self.codec = ""
        self.video_seen = False
        self.info_seen = False
        self.tracks_seen = False
        self._reset_track()

    def _reset_track(self) -> None:
        self.t_type = 0
        self.t_codec = ""
        self.t_width = 0
        self.t_height = 0


def _walk(w: _Walk, data: bytes, lo: int, hi: int, depth: int,
          in_track: bool, in_video: bool) -> None:
    if depth > _MAX_DEPTH:
        raise ValueError("EBML nesting exceeds the depth cap")
    pos = lo
    while pos < hi:
        w.elements += 1
        if w.elements > _MAX_ELEMENTS:
            raise ValueError("EBML element count exceeds the cap")
        eid, pos = _read_vint(data, pos, keep_marker=True)
        size, pos = _read_vint(data, pos, keep_marker=False)
        end = hi if size == -1 else pos + size
        if end > hi:
            raise ValueError("EBML element escapes its parent")
        # body sliced ONLY in the scalar branches (r11 review: slicing
        # every element copied entire Cluster bodies -- and the whole
        # Segment payload -- just to discard them, O(2x file size) of
        # memcpy per record)
        if eid in (0x1A45DFA3, _SEGMENT, _INFO, _TRACKS):
            _walk(w, data, pos, end, depth + 1, False, False)
            if eid == _INFO:
                w.info_seen = True
            elif eid == _TRACKS:
                w.tracks_seen = True
            if w.info_seen and w.tracks_seen and eid in (_INFO, _TRACKS):
                # everything after Info + Tracks is cluster payload in
                # every real muxing order: stop instead of visiting
                # thousands of skipped Cluster headers (r11 review)
                return
        elif eid == _TRACK_ENTRY:
            w._reset_track()
            _walk(w, data, pos, end, depth + 1, True, False)
            _commit_track(w)
        elif eid == _VIDEO and in_track:
            _walk(w, data, pos, end, depth + 1, True, True)
        elif eid == _DOCTYPE:
            w.doctype = data[pos:end].split(b"\x00")[0].decode("latin-1")
        elif eid == _TIMESTAMP_SCALE:
            w.tscale = _uint(data[pos:end]) or 1_000_000
        elif eid == _DURATION:
            w.duration_ticks = _float(data[pos:end])
        elif eid == _TRACK_TYPE and in_track:
            w.t_type = _uint(data[pos:end])
        elif eid == _CODEC_ID and in_track:
            w.t_codec = data[pos:end].split(b"\x00")[0].decode("latin-1")
        elif eid == _PIXEL_WIDTH and in_video:
            w.t_width = _uint(data[pos:end])
        elif eid == _PIXEL_HEIGHT and in_video:
            w.t_height = _uint(data[pos:end])
        pos = end


def _commit_track(w: _Walk) -> None:
    if w.t_type == 1 and not w.video_seen:
        w.video_seen = True
        w.width, w.height, w.codec = w.t_width, w.t_height, w.t_codec
    elif not w.video_seen and not w.codec:
        w.codec = w.t_codec


def parse_webm_meta(payload: bytes) -> dict:
    """Parse Matroska/WebM container metadata: ``{width, height,
    n_frames, codec, duration_ms, doctype}``. ``n_frames`` is always 0
    (a per-frame count needs a cluster walk; 0 is the honest unknown).
    Raises ``ValueError`` only, per the media family's executor-task
    contract."""
    try:
        if not is_webm(payload):
            raise ValueError("not an EBML payload")
        w = _Walk()
        _walk(w, payload, 0, len(payload), 0, False, False)
        ticks = w.duration_ticks
        if not 0.0 <= ticks < 9e18:
            # crafted Duration floats (NaN, +-inf, negatives, 1e300)
            # must not kill the record: int(NaN) raises OUTSIDE the
            # executor contract's except list, and a huge-but-finite
            # value overflows the int64 column that materializes
            # duration_ms downstream. Garbage -> the honest 0. (NaN
            # fails every comparison, so it lands here too.)
            ticks = 0.0
        dur_ms = int(ticks * w.tscale / 1e6)
        if dur_ms >= (1 << 62):  # finite ticks x huge tscale
            dur_ms = 0
        return {
            "width": w.width,
            "height": w.height,
            "n_frames": 0,
            "codec": w.codec,
            "duration_ms": dur_ms,
            "doctype": w.doctype,
        }
    except (struct.error, IndexError, OverflowError) as exc:
        raise ValueError(f"malformed EBML: {exc}") from exc


# ---------------------------------------- video PIXEL decode (r15, VP8)
#
# The "video pixel decode stays ffmpeg-gated" scope line (r11-r14) was
# broader than the code had to be: the repo already carries a complete
# VP8 key-frame decoder (operators/vp8.py, bit-exact in YUV vs libwebp,
# built for lossy WebP), and a WebM SimpleBlock's payload for a V_VP8
# track IS that exact bitstream. So VP8-in-WebM/Matroska keyframes now
# decode to real pixels; the ffmpeg gate (permanent scope verdict in
# TESTDATA.md) narrows to the codecs with no in-repo decoder
# (V_VP9 / V_AV1 / H.264 / HEVC — each a multi-thousand-line codec).

_CLUSTER = 0x1F43B675
_SIMPLE_BLOCK = 0xA3
_BLOCK_GROUP = 0xA0
_BLOCK = 0xA1
_REFERENCE_BLOCK = 0xFB
_TRACK_NUMBER = 0xD7


def _iter_children(data: bytes, lo: int, hi: int):
    """(stored-id, body_lo, body_hi) for each child element of the
    [lo, hi) span — the one sibling-walk spelling for the block
    extractor (parse_webm_meta keeps its committed early-stop walk)."""
    pos, count = lo, 0
    while pos < hi:
        count += 1
        if count > _MAX_ELEMENTS:
            raise ValueError("EBML element count exceeds the cap")
        eid, pos = _read_vint(data, pos, keep_marker=True)
        size, pos = _read_vint(data, pos, keep_marker=False)
        end = hi if size == -1 else pos + size
        if end > hi:
            raise ValueError("EBML element escapes its parent")
        yield eid, pos, end
        pos = end


def _block_frame(data: bytes, lo: int, hi: int, track_no: int,
                 need_key: bool) -> bytes | None:
    """Frame bytes of a (Simple)Block if it belongs to ``track_no`` and
    (for SimpleBlocks) carries the keyframe flag; None otherwise.
    Laced video blocks are refused — real-world muxers lace only audio
    (lacing exists to amortize tiny-frame overhead), so a laced VIDEO
    block is out of the supported profile, stated rather than
    mis-parsed."""
    t_no, pos = _read_vint(data, lo, keep_marker=False)
    if t_no != track_no:
        return None
    if pos + 3 > hi:
        raise ValueError("truncated Matroska block header")
    flags = data[pos + 2]  # after the 2-byte relative timestamp
    if need_key and not (flags & 0x80):
        return None
    if (flags >> 1) & 0x3:
        raise ValueError("laced video blocks unsupported")
    return data[pos + 3 : hi]


def extract_video_keyframe(payload: bytes) -> tuple[str, bytes]:
    """(codec_id, frame_bytes) of the FIRST video keyframe in a
    Matroska/WebM stream: the first video TrackEntry's number is
    resolved from Segment > Tracks, then Clusters are walked in order
    for a SimpleBlock with the keyframe flag (0x80) or a BlockGroup
    without a ReferenceBlock (the spec's keyframe criterion for
    grouped blocks). Raises ``ValueError`` when the stream has no
    video track or no keyframe."""
    try:
        if not is_webm(payload):
            raise ValueError("not an EBML payload")
        seg = next(
            ((lo, hi) for eid, lo, hi in
             _iter_children(payload, 0, len(payload)) if eid == _SEGMENT),
            None,
        )
        if seg is None:
            raise ValueError("EBML stream has no Segment")
        # pass 1: resolve the first video track from Segment > Tracks.
        # A separate pass, not one fused walk: Matroska permits Clusters
        # BEFORE Tracks in streamed layouts, and a fused walk would skip
        # those Clusters while track_no is still unresolved (r15 ADVICE).
        track_no, codec = 0, ""
        for eid, lo, hi in _iter_children(payload, *seg):
            if eid != _TRACKS or track_no:
                continue
            for eid2, lo2, hi2 in _iter_children(payload, lo, hi):
                if eid2 != _TRACK_ENTRY:
                    continue
                t_no = t_type = 0
                t_codec = ""
                for eid3, lo3, hi3 in _iter_children(payload, lo2, hi2):
                    if eid3 == _TRACK_NUMBER:
                        t_no = _uint(payload[lo3:hi3])
                    elif eid3 == _TRACK_TYPE:
                        t_type = _uint(payload[lo3:hi3])
                    elif eid3 == _CODEC_ID:
                        t_codec = (payload[lo3:hi3]
                                   .split(b"\x00")[0].decode("latin-1"))
                if t_type == 1 and t_no:
                    track_no, codec = t_no, t_codec
                    break
        if not track_no:
            raise ValueError("EBML stream has no video track")
        # pass 2: walk Clusters in stream order for the first keyframe
        for eid, lo, hi in _iter_children(payload, *seg):
            if eid == _CLUSTER:
                for eid2, lo2, hi2 in _iter_children(payload, lo, hi):
                    if eid2 == _SIMPLE_BLOCK:
                        frame = _block_frame(
                            payload, lo2, hi2, track_no, need_key=True)
                        if frame is not None:
                            return codec, frame
                    elif eid2 == _BLOCK_GROUP:
                        block, has_ref = None, False
                        for eid3, lo3, hi3 in _iter_children(
                                payload, lo2, hi2):
                            if eid3 == _BLOCK:
                                block = (lo3, hi3)
                            elif eid3 == _REFERENCE_BLOCK:
                                has_ref = True
                        if block and not has_ref:
                            frame = _block_frame(
                                payload, *block, track_no, need_key=False)
                            if frame is not None:
                                return codec, frame
        raise ValueError("EBML stream has no video keyframe")
    except (struct.error, IndexError, OverflowError) as exc:
        raise ValueError(f"malformed EBML: {exc}") from exc


def decode_webm_video_pixels(payload: bytes):
    """REAL pixel decode of a WebM/Matroska video stream's first
    keyframe: (width, height, RGBA uint8 HxWx4) for V_VP8 tracks via
    :func:`operators.vp8.decode_vp8_pixels` (the identical bitstream
    WebP lossy carries — bit-exact YUV, documented BT.601 RGB).
    Every other codec raises ``ValueError``: V_VP9/V_AV1/H.264/HEVC
    have no in-repo decoder and remain behind the ffmpeg feature flag
    (permanent scope verdict, TESTDATA.md)."""
    codec, frame = extract_video_keyframe(payload)
    if codec != "V_VP8":
        raise ValueError(
            f"video pixel decode supports V_VP8 keyframes; {codec or '?'} "
            "stays behind the ffmpeg feature flag")
    from .vp8 import decode_vp8_pixels

    return decode_vp8_pixels(frame)
