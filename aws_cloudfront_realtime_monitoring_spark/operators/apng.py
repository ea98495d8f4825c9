"""APNG (animated PNG) frame decoding: acTL/fcTL/fdAT over the static
PNG machinery.

The APNG extension (PNG specification third edition, chapter
"Animation information"; originally the Mozilla APNG spec) stores an
animation as ancillary chunks an APNG-unaware reader ignores: one
``acTL`` (frame/play counts, before the first IDAT), one ``fcTL`` per
frame (sequence number, region geometry, delay, dispose/blend ops), and
``fdAT`` chunks carrying each non-first frame's pixel stream. A frame
region is encoded EXACTLY like a standalone PNG image of its own
dimensions under the IHDR depth/color/interlace -- so frame decode here
is :func:`multimodal._decode_subimage` reused verbatim, and only the
chunk walk, validation, and compositing are new.

Compositing follows the spec's state machine: the output buffer (always
RGBA; gray/palette sources expand) starts fully-transparent black, each
frame draws into its region with ``blend_op`` SOURCE (replace) or OVER
(Porter-Duff over, non-premultiplied), and before the NEXT frame draws,
``dispose_op`` NONE keeps the region, BACKGROUND clears it to
transparent black, PREVIOUS reverts it to its pre-draw content (first
frame: PREVIOUS degrades to BACKGROUND, per spec).

Memory contract matches :func:`operators.gif.decode_gif_frames`: only
requested frames are retained while every frame composites through one
reused canvas; with no bound, files past ``DEFAULT_MAX_FRAMES`` are
REFUSED, never silently trimmed. Malformed ANIMATION data raises
``ValueError``; ``decode_image`` catches it and reports the payload as
the static image an APNG-unaware viewer would show (the spec's own
fallback posture).

Reference parity: the reference (aws-cloudfront-realtime-monitoring)
delegates media handling entirely; this mirrors the GIF animation path's
role as the repo's real frame-sampling substrate.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from .multimodal import (
    _PNG_CHANNELS,
    _PNG_DEPTHS,
    _PNG_SIG,
    _decode_subimage,
    _expand_png_samples,
)

#: same retention contract as the GIF decoder
DEFAULT_MAX_FRAMES = 256

_DISPOSE_NONE, _DISPOSE_BACKGROUND, _DISPOSE_PREVIOUS = 0, 1, 2
_BLEND_SOURCE, _BLEND_OVER = 0, 1

#: the animation control chunks: ancillary to a static reader, but a
#: CRC/shape error in one means the ANIMATION is corrupt -- raise (the
#: caller falls back to the static image) instead of skip-and-continue
_ANIM_CHUNKS = (b"acTL", b"fcTL", b"fdAT")


class _Frame:
    __slots__ = ("w", "h", "x", "y", "delay_num", "delay_den",
                 "dispose", "blend", "data", "from_idat")

    def __init__(self, fctl: bytes, from_idat: bool) -> None:
        (_seq, self.w, self.h, self.x, self.y, self.delay_num,
         self.delay_den, self.dispose, self.blend) = struct.unpack(
            ">IIIIIHHBB", fctl)
        self.data: list[bytes] = []
        self.from_idat = from_idat


def _parse(payload: bytes) -> tuple[tuple, bytes | None, bytes | None,
                                    int, list[_Frame]]:
    """Chunk walk -> (ihdr fields, plte, trns, num_plays, frames).
    Raises ValueError when the payload is not a PNG, carries no acTL, or
    the animation chunks are malformed (bad CRC, out-of-order sequence
    numbers, geometry outside the canvas, fcTL count != acTL's)."""
    if len(payload) < len(_PNG_SIG) + 12 or payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, ended = len(_PNG_SIG), None, False
    plte = trns = None
    actl = None
    frames: list[_Frame] = []
    next_seq = 0
    saw_idat = False
    idat_frame: _Frame | None = None  # the fcTL-before-IDAT frame, if any
    pending_fctl: bytes | None = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) < length or pos + 12 + length > len(payload):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if crc != zlib.crc32(ctype + data) & 0xFFFFFFFF:
            if ctype[:1].isupper() or ctype in _ANIM_CHUNKS:
                raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
            pos += 12 + length
            continue
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"tRNS":
            trns = data
        elif ctype == b"acTL":
            if saw_idat or actl is not None or len(data) != 8:
                raise ValueError("misplaced or malformed acTL")
            actl = struct.unpack(">II", data)
        elif ctype == b"fcTL":
            if len(data) != 26 or pending_fctl is not None:
                raise ValueError("malformed or doubled fcTL")
            (seq,) = struct.unpack_from(">I", data)
            if seq != next_seq:
                raise ValueError(
                    f"APNG sequence number {seq}, expected {next_seq}")
            next_seq += 1
            pending_fctl = data
        elif ctype == b"IDAT":
            if pending_fctl is not None and not frames:
                idat_frame = _Frame(pending_fctl, from_idat=True)
                frames.append(idat_frame)
                pending_fctl = None
            if idat_frame is not None:
                idat_frame.data.append(data)
            saw_idat = True
        elif ctype == b"fdAT":
            if len(data) < 4:
                raise ValueError("malformed fdAT")
            (seq,) = struct.unpack_from(">I", data)
            if seq != next_seq:
                raise ValueError(
                    f"APNG sequence number {seq}, expected {next_seq}")
            next_seq += 1
            if pending_fctl is not None:
                frames.append(_Frame(pending_fctl, from_idat=False))
                pending_fctl = None
            if not frames or frames[-1].from_idat:
                raise ValueError("fdAT with no owning fcTL")
            frames[-1].data.append(data[4:])
        elif ctype == b"IEND":
            ended = True
            break
        pos += 12 + length
    if ihdr is None or len(ihdr) != 13 or not saw_idat or not ended:
        raise ValueError("PNG missing IHDR/IDAT/IEND")
    if actl is None:
        raise ValueError("not an APNG (no acTL)")
    if pending_fctl is not None:
        raise ValueError("fcTL with no frame data")
    num_frames, num_plays = actl
    if num_frames != len(frames) or num_frames < 1:
        raise ValueError(
            f"acTL declares {num_frames} frames, stream has {len(frames)}")
    width, height, depth, color, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr)
    if width <= 0 or height <= 0:
        raise ValueError("degenerate PNG dimensions")
    from . import SLOW_PATH_MAX_PIXELS

    if width * height > SLOW_PATH_MAX_PIXELS:
        raise ValueError("PNG dimensions exceed the decode cap")
    if (color not in _PNG_CHANNELS or depth not in _PNG_DEPTHS[color]
            or comp != 0 or filt != 0 or interlace not in (0, 1)):
        raise ValueError("invalid PNG IHDR combination")
    for i, f in enumerate(frames):
        if (f.w <= 0 or f.h <= 0 or f.x + f.w > width or f.y + f.h > height
                or f.dispose > 2 or f.blend > 1):
            raise ValueError(f"APNG frame {i} geometry/ops invalid")
        if not f.data:
            raise ValueError(f"APNG frame {i} has no pixel data")
    if frames[0].from_idat and (
        frames[0].w != width or frames[0].h != height
        or frames[0].x or frames[0].y
    ):
        raise ValueError("APNG first (IDAT) frame must cover the canvas")
    return ((width, height, depth, color, interlace), plte, trns,
            num_plays, frames)


def apng_frame_count(payload: bytes) -> int | None:
    """Frame count from the animation chunks, WITHOUT inflating any
    pixel data (chunk walk only) -- the decode_image metadata hook.
    Returns None for a static PNG (no acTL); raises ValueError when the
    animation data is malformed (caller falls back to static).

    Contract nuance (r15): the ``acTL``-substring fast path below
    returns None WITHOUT re-validating the chunk stream, so a payload
    that is malformed *and* contains no acTL bytes reads as a clean
    static PNG here even though _parse would have raised. That is safe
    for the production call site because decode_image has already run
    (and CRC'd) the static decode on the same payload -- corrupt chunk
    streams never reach this gate -- but a future caller that wants
    malformed-vs-static discrimination on raw payloads must call
    _parse directly."""
    # cheap gate before the full walk: _parse re-CRCs every chunk
    # (including all IDAT bytes the static decode just CRC'd), which is
    # pure duplicate per-byte work on the production decode_batches hot
    # path for the overwhelmingly-common static case (r14 review). A
    # C-speed substring scan can false-POSITIVE on compressed pixel
    # bytes (then the full parse decides, semantics unchanged) but never
    # false-negative: a real acTL chunk always contains these bytes.
    if b"acTL" not in payload:
        return None
    try:
        _hdr, _plte, _trns, _plays, frames = _parse(payload)
    except ValueError as exc:
        if "no acTL" in str(exc):
            return None
        raise
    return len(frames)


def _to_rgba(px: np.ndarray, color: int, depth: int,
             plte: bytes | None, trns: bytes | None) -> np.ndarray:
    """Native-channel samples -> RGBA at the source depth's dtype: the
    static decoder's expansion rules (:func:`multimodal.
    _expand_png_samples` -- ONE copy, r14 review) plus the forced-RGBA
    presentation compositing needs (gray replicates to 3 channels,
    missing alpha fills opaque)."""
    px, alpha = _expand_png_samples(px, color, depth, plte, trns)
    if color == 3:
        if alpha is None:
            alpha = np.full(px.shape[:2], 255, np.uint8)
        return np.dstack([px, alpha])
    if color in (0, 2):
        rgb = np.repeat(px, 3, axis=2) if color == 0 else px
        if alpha is None:
            amax = 65535 if depth == 16 else 255
            alpha = np.full(px.shape[:2], amax, px.dtype)
        return np.dstack([rgb, alpha])
    if color == 4:  # gray + alpha
        return np.dstack([np.repeat(px[:, :, :1], 3, axis=2), px[:, :, 1]])
    return px  # color 6: already RGBA


def _blend_over(dst: np.ndarray, src: np.ndarray, amax: int) -> np.ndarray:
    """Porter-Duff OVER with non-premultiplied alpha (APNG spec's blend
    formula), integer samples in/out. Rounding is floor(x + 0.5) --
    half-AWAY-from-zero on these nonnegative values -- spelled out
    because np.round is half-to-even (r11 review class)."""
    sa = src[:, :, 3].astype(np.float64) / amax
    da = dst[:, :, 3].astype(np.float64) / amax
    oa = sa + da * (1.0 - sa)
    sc = src[:, :, :3].astype(np.float64)
    dc = dst[:, :, :3].astype(np.float64)
    num = sc * sa[..., None] + dc * (da * (1.0 - sa))[..., None]
    with np.errstate(invalid="ignore"):
        oc = np.where(oa[..., None] > 0, num / np.where(
            oa[..., None] > 0, oa[..., None], 1.0), 0.0)
    out = np.empty_like(dst)
    out[:, :, :3] = np.floor(oc + 0.5).astype(dst.dtype)
    out[:, :, 3] = np.floor(oa * amax + 0.5).astype(dst.dtype)
    return out


def count_apng_frames(payload: bytes) -> tuple[int, int, int]:
    """(width, height, n_frames) from the chunk walk alone -- the
    sampling pre-pass twin of :func:`gif.count_gif_frames`."""
    (width, height, *_rest), _plte, _trns, _plays, frames = _parse(payload)
    return width, height, len(frames)


def decode_apng_frames(
    payload: bytes, max_frames: int | None = None,
    keep_indices: set | None = None,
) -> tuple[int, int, list[np.ndarray]]:
    """Decode COMPOSITED animation frames: returns (width, height,
    [canvas[h, w, 4] RGBA, ...]) -- frame k is what a viewer sees at
    step k. Same retention contract as ``decode_gif_frames``:
    ``max_frames`` keeps the first k, ``keep_indices`` an explicit set;
    with neither, files past ``DEFAULT_MAX_FRAMES`` frames are REFUSED
    (never silently trimmed). Peak memory is one canvas (plus one
    PREVIOUS-dispose snapshot) plus the kept copies."""
    hdr, plte, trns, _plays, frames = _parse(payload)
    width, height, depth, color, interlace = hdr
    if keep_indices is not None:
        def keep(i: int) -> bool:
            return i in keep_indices
    elif max_frames is None:
        if len(frames) > DEFAULT_MAX_FRAMES:
            raise ValueError(
                f"APNG has {len(frames)} frames, over the default "
                f"retention cap of {DEFAULT_MAX_FRAMES}; pass max_frames "
                "or keep_indices explicitly to decode it")

        def keep(i: int) -> bool:
            return True
    else:
        def keep(i: int) -> bool:
            return i < max_frames
    ch = _PNG_CHANNELS[color]
    bpp = max(1, ch * depth // 8)
    dt = np.uint16 if depth == 16 else np.uint8
    amax = 65535 if depth == 16 else 255
    canvas = np.zeros((height, width, 4), dt)  # transparent black
    screens: list[np.ndarray] = []
    for i, f in enumerate(frames):
        region = (slice(f.y, f.y + f.h), slice(f.x, f.x + f.w))
        dispose = f.dispose
        if i == 0 and dispose == _DISPOSE_PREVIOUS:
            dispose = _DISPOSE_BACKGROUND  # spec: first-frame degrade
        snapshot = canvas[region].copy() if dispose == _DISPOSE_PREVIOUS \
            else None
        src = _to_rgba(
            _decode_subimage(b"".join(f.data), f.w, f.h, ch, depth,
                             interlace, bpp),
            color, depth, plte, trns,
        )
        if f.blend == _BLEND_SOURCE or i == 0:
            canvas[region] = src
        else:
            canvas[region] = _blend_over(canvas[region], src, amax)
        if keep(i):
            screens.append(canvas.copy())
        if dispose == _DISPOSE_BACKGROUND:
            canvas[region] = 0
        elif dispose == _DISPOSE_PREVIOUS:
            canvas[region] = snapshot
    return width, height, screens
