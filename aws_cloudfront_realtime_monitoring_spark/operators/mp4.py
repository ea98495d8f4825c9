"""ISO Base Media File Format (MP4/MOV, ISO/IEC 14496-12) metadata
parser in pure stdlib — no codec library.

Closes the last all-fake branch of the multimodal contract: video
payloads. CODEC DATA stays out of scope (an H.264/AV1 pixel decode
needs ffmpeg, behind the documented feature flag), but the container
METADATA a curation pipeline filters on — dimensions, frame count,
duration, codec fourcc — is plain box structure:

- boxes are [size:u32][type:4cc][payload], size==1 switches to a
  64-bit largesize after the type, size==0 means "to end of file"
  (legal only for the last top-level box);
- ``moov/mvhd`` carries the movie timescale + duration (version 0:
  u32 fields; version 1: u64);
- each ``moov/trak`` holds ``tkhd`` (visual width/height as 16.16
  fixed point), ``mdia/hdlr`` (handler fourcc — 'vide' marks the
  video track), ``mdia/mdhd`` (media timescale) and
  ``mdia/minf/stbl`` with ``stsd`` (sample description: codec
  fourcc; visual entries embed width/height at fixed offsets) and
  ``stsz``/``stz2`` (sample_count == the track's frame count);
- the first video track wins; an audio-only file reports the audio
  codec with zero dimensions.

Robustness follows the image decoders' contract: malformed bytes can
only raise ``ValueError`` (box sizes are validated against their
parents, the walk is strictly forward, depth/box-count caps bound
hostile inputs), so one bad record never kills an executor task.
"""

from __future__ import annotations

#: containers worth descending into for metadata (everything else is
#: skipped wholesale -- mdat in particular is the bulk of the file)
_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}

#: hostile-input bounds. The box cap is generous (r11 review: 4096
#: rejected legal fragmented MP4s, whose moof/mdat pairs accumulate
#: 2-3 top-level boxes per 1-2s fragment) -- each header visit is O(1)
#: work, so 1M bounds crafted million-box payloads without touching
#: real files; the walk also STOPS at the end of the (unique) top-level
#: moov, so ordinary files never scan their fragment tail at all.
_MAX_BOXES = 1_000_000
_MAX_DEPTH = 16

#: brands that mark an ISO-BMFF file we can sniff (major_brand or any
#: compatible brand beginning with one of these prefixes)
_FTYP_PREFIXES = (b"isom", b"iso2", b"iso4", b"iso5", b"iso6", b"mp41",
                  b"mp42", b"avc1", b"av01", b"qt  ", b"M4V ", b"M4A ",
                  b"3gp", b"mmp4", b"hev1", b"heic", b"mif1")


def is_mp4(payload: bytes) -> bool:
    """Cheap signature sniff: byte 4 onward of a well-formed file is
    ``ftyp`` + a known brand (the box SIZE varies, so the magic is not
    at offset 0 like the image formats). Checks the major_brand AND the
    compatible_brands list (r11 review: 'dash'/'M4B ' majors with
    'isom' in compatibles were rejected)."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        return False
    size = int.from_bytes(payload[0:4], "big")
    end = min(len(payload), size if size >= 16 else 16, 16 + 16 * 4)
    brands = [payload[8:12]] + [
        payload[o : o + 4] for o in range(16, end - 3, 4)
    ]
    return any(
        b.startswith(p) for b in brands for p in _FTYP_PREFIXES
    )


class _Walk:
    def __init__(self) -> None:
        self.boxes = 0
        # movie-level
        self.timescale: int | None = None
        self.duration: int | None = None
        # first VIDEO track wins; fallback: first track of any kind
        self.width = 0
        self.height = 0
        self.n_frames = 0
        self.codec = ""
        self.video_seen = False
        # per-trak scratch, committed at trak end
        self._reset_trak()

    def _reset_trak(self) -> None:
        self.t_width = 0
        self.t_height = 0
        self.t_frames = 0
        self.t_codec = ""
        self.t_handler = b""


def _u(data: bytes, off: int, n: int) -> int:
    if off + n > len(data):
        raise ValueError("truncated MP4 box payload")
    return int.from_bytes(data[off : off + n], "big")


def _full_box(body: bytes) -> tuple[int, bytes]:
    """(version, payload-after-version/flags) of a full box."""
    if len(body) < 4:
        raise ValueError("truncated MP4 full box")
    return body[0], body[4:]


def _parse_mvhd(w: _Walk, body: bytes) -> None:
    ver, p = _full_box(body)
    if ver == 1:
        w.timescale = _u(p, 16, 4)
        w.duration = _u(p, 20, 8)
        unknown = (1 << 64) - 1
    else:
        w.timescale = _u(p, 8, 4)
        w.duration = _u(p, 12, 4)
        unknown = (1 << 32) - 1
    if w.duration == unknown:
        # all-ones is the spec's 'duration unknown' sentinel (live /
        # fragmented recordings, 14496-12); report the honest 0, not
        # an 83-day movie (r11 review)
        w.duration = 0


def _parse_tkhd(w: _Walk, body: bytes) -> None:
    ver, p = _full_box(body)
    # u32/u64 times + ids + reserved + matrix put width/height at the
    # tail: the LAST 8 bytes are width/height as 16.16 fixed point
    need = 92 if ver == 1 else 80
    if len(p) < need:
        raise ValueError("truncated MP4 tkhd box")
    w.t_width = _u(p, need - 8, 4) >> 16
    w.t_height = _u(p, need - 4, 4) >> 16


def _parse_hdlr(w: _Walk, body: bytes) -> None:
    _ver, p = _full_box(body)
    if len(p) < 8:
        raise ValueError("truncated MP4 hdlr box")
    w.t_handler = p[4:8]


def _parse_stsd(w: _Walk, body: bytes) -> None:
    _ver, p = _full_box(body)
    n = _u(p, 0, 4)
    if n < 1:
        return
    # first sample entry: [size:u32][format:4cc]...
    if len(p) < 12:
        raise ValueError("truncated MP4 stsd box")
    w.t_codec = p[8:12].decode("latin-1").strip()
    if w.t_handler == b"vide" and len(p) >= 12 + 78:
        # VisualSampleEntry: 6 reserved + u16 data_ref, 16 bytes of
        # pre_defined/reserved, then u16 width, u16 height (14496-12
        # 12.1.3) -- entry-relative offsets 24/26, stsd-relative 36/38
        ew = _u(p, 12 + 24, 2)
        eh = _u(p, 12 + 26, 2)
        # prefer the coded dims when the tkhd presentation size is
        # missing (some writers zero tkhd for non-displayed tracks)
        if not w.t_width:
            w.t_width, w.t_height = ew, eh


def _parse_stsz(w: _Walk, body: bytes) -> None:
    ver_flags_skipped = _full_box(body)[1]
    # stsz: u32 sample_size, u32 sample_count; stz2 shares the count
    # position after a 4-byte field
    w.t_frames = _u(ver_flags_skipped, 4, 4)


_LEAF_PARSERS = {
    b"mvhd": _parse_mvhd,
    b"tkhd": _parse_tkhd,
    b"hdlr": _parse_hdlr,
    b"stsd": _parse_stsd,
    b"stsz": _parse_stsz,
    b"stz2": _parse_stsz,
}


def _walk_boxes(w: _Walk, data: bytes, lo: int, hi: int, depth: int) -> None:
    if depth > _MAX_DEPTH:
        raise ValueError("MP4 box nesting exceeds the depth cap")
    pos = lo
    while pos < hi:
        w.boxes += 1
        if w.boxes > _MAX_BOXES:
            raise ValueError("MP4 box count exceeds the cap")
        if pos + 8 > hi:
            raise ValueError("truncated MP4 box header")
        size = _u(data, pos, 4)
        btype = data[pos + 4 : pos + 8]
        head = 8
        if size == 1:
            size = _u(data, pos + 8, 8)
            head = 16
        elif size == 0:  # to end of the enclosing space
            size = hi - pos
        if size < head or pos + size > hi:
            raise ValueError("MP4 box size escapes its container")
        if btype == b"trak":
            w._reset_trak()
            _walk_boxes(w, data, pos + head, pos + size, depth + 1)
            _commit_trak(w)
        elif btype in _CONTAINERS:
            _walk_boxes(w, data, pos + head, pos + size, depth + 1)
            if btype == b"moov" and depth == 0:
                # moov is unique: everything after it at the top level
                # is fragment/media payload -- stop instead of walking
                # thousands of moof/mdat headers (r11 review)
                return
        else:
            parser = _LEAF_PARSERS.get(btype)
            if parser is not None:
                parser(w, data[pos + head : pos + size])
        pos += size


def _commit_trak(w: _Walk) -> None:
    is_video = w.t_handler == b"vide"
    if is_video and not w.video_seen:
        w.video_seen = True
        w.width, w.height = w.t_width, w.t_height
        w.n_frames = w.t_frames
        w.codec = w.t_codec
    elif not w.video_seen and not w.codec:
        # audio-only (or metadata-only) file: report the first track's
        # codec with zero dimensions
        w.codec = w.t_codec
        w.n_frames = w.t_frames


def parse_mp4_meta(payload: bytes) -> dict:
    """Parse ISO-BMFF container metadata: returns ``{width, height,
    n_frames, codec, duration_ms}`` where n_frames is the FIRST video
    track's sample count (real data, like GIF's frame count), codec its
    sample-entry fourcc, and duration_ms the movie duration from mvhd
    (0 when absent). Raises ``ValueError`` on malformed structure --
    never anything else (the image decoders' executor-task contract)."""
    try:
        if not is_mp4(payload):
            raise ValueError("not an ISO-BMFF payload")
        w = _Walk()
        _walk_boxes(w, payload, 0, len(payload), 0)
        dur_ms = 0
        if w.timescale:
            dur_ms = w.duration * 1000 // w.timescale
        if not 0 <= dur_ms < (1 << 62):
            # a crafted u64 duration with timescale 1 yields ~1.8e22 ms
            # -- past int64, which would blow up ONLY downstream when a
            # LongType column materializes it (an executor-task crash
            # escaping the ValueError-only contract at a layer this
            # parser cannot see). Garbage duration -> the honest 0,
            # like the unknown-duration sentinel (r12 fuzz review).
            dur_ms = 0
        return {
            "width": w.width,
            "height": w.height,
            "n_frames": w.n_frames,
            "codec": w.codec,
            "duration_ms": dur_ms,
        }
    except (IndexError, OverflowError) as exc:
        # defensive fold for the ValueError-only executor contract: the
        # bounds checks above should make these unreachable, but a
        # future edit must not escape the contract (struct.error was
        # dead -- nothing here uses struct; r11 review)
        raise ValueError(f"malformed MP4: {exc}") from exc
