"""GIF (87a/89a) decoder in pure Python + numpy — completes the
real-decode set (BMP/PNG/JPEG: images, WAV: audio) with the one common
format that carries MULTIPLE frames, so the multimodal contract's
``n_frames`` column is real data for it, not metadata guesswork.

Scope (the full baseline format): logical screen + global/local color
tables, variable-width LSB-first LZW with CLEAR/EOI and the 12-bit cap,
Adam-style 4-pass interlacing, 0x21 extension blocks (skipped via their
sub-block chains), any number of image descriptors (animation frames).
Malformed data raises ``ValueError`` — same contract as the sibling
decoders.

Per-payload Python executed inside Arrow-batched ``mapInPandas`` workers;
a narrow map, nothing driver-side.
"""

from __future__ import annotations

import struct

import numpy as np

# the shared decompression-bomb cap now lives at the package level
# (it is format-neutral); re-exported here for the existing importers
from . import MAX_PIXELS  # noqa: F401

#: frame-retention bound used when decode_gif_frames is called with
#: neither max_frames nor keep_indices; longer files raise rather than
#: silently trim (r11 advice)
DEFAULT_MAX_FRAMES = 256

#: GIF interlace passes: (start row, step)
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _lzw_decode(data: bytes, min_code_size: int, expect: int) -> bytes:
    """GIF-variant LZW: variable code width from ``min_code_size + 1`` up
    to 12 bits, LSB-first packing, CLEAR resets the table, EOI ends the
    stream. Decodes at most ``expect`` pixels (trailing junk ignored)."""
    if not 2 <= min_code_size <= 8:
        # 8 is the real GIF ceiling (pixel indices are one byte); 9-11
        # used to pass the guard and crash reset() with a misleading
        # bytes-range ValueError instead of this diagnostic (r11 review)
        raise ValueError(f"bad GIF LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = nbits = pos = 0
    width = min_code_size + 1
    table: list[bytes] = []
    prev: bytes | None = None

    def reset() -> None:
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        prev = None

    reset()
    while len(out) < expect:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF LZW stream ended before EOI")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            reset()
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table) or code >= clear:
                raise ValueError("GIF LZW first code not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("GIF LZW code beyond table")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    return bytes(out[:expect])


def _sub_blocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a GIF sub-block chain starting at ``pos``; returns
    (data, position after the 0x00 terminator)."""
    chunks = []
    while True:
        if pos >= len(payload):
            raise ValueError("GIF sub-block chain ran off the end")
        n = payload[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        chunks.append(payload[pos : pos + n])
        if len(chunks[-1]) < n:
            raise ValueError("truncated GIF sub-block")
        pos += n


def decode_gif(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """REAL decoder for GIF87a/89a: returns (width, height, n_frames,
    first_frame[h, w, 3] uint8 RGB on the logical screen). Raises
    ``ValueError`` on malformed data."""
    width, height, n_frames, screens = _decode_frames(payload, keep=1)
    return width, height, n_frames, screens[0]


def count_gif_frames(payload: bytes) -> tuple[int, int, int]:
    """(width, height, n_frames) by walking the block structure only --
    no LZW decode, no pixel buffers; the cheap first pass of two-pass
    frame sampling."""
    width, height, n_frames, _screens = _decode_frames(
        payload, keep=set(), count_only=True
    )
    return width, height, n_frames


def decode_gif_frames(
    payload: bytes, max_frames: int | None = None,
    keep_indices: set | None = None,
) -> tuple[int, int, list[np.ndarray]]:
    """Decode COMPOSITED animation frames: each frame draws onto the
    running logical screen honoring the Graphic Control Extension --
    transparent pixels (GCE transparency flag + index) leave the
    underlying screen untouched (the common GIF89a transparency-delta
    encoding), and disposal methods 2 (restore to background) and 3
    (restore to previous) are applied to the frame's rectangle before
    the next frame draws -- so frame k is what a viewer sees at step k.
    Returns (width, height, [screen[h, w, 3] uint8, ...]).

    Memory contract: only the REQUESTED frames are retained --
    ``max_frames`` keeps the first k, ``keep_indices`` keeps an explicit
    index set (the frame-sampling path: count first, then fetch the
    picks) -- while every frame still composites through one reused
    screen buffer, so peak memory is one screen plus the kept copies,
    never n_frames x frame_size (a 100-frame GIF near the MAX_PIXELS cap
    would otherwise hold gigabytes). With neither argument, files up to
    ``DEFAULT_MAX_FRAMES`` frames decode fully and longer files raise
    ``ValueError`` (never a silent trim) -- pass a bound explicitly for
    those."""
    if keep_indices is not None:
        keep = keep_indices
    elif max_frames is None:
        # a bounded DEFAULT (r11 review: the old unlimited default
        # re-enabled the n_frames x frame_size blowup the memory
        # contract above forbids -- a ~10 KB payload with hundreds of
        # near-cap frames could allocate tens of GB). A file whose frame
        # count exceeds the default is REFUSED, not silently trimmed
        # (r11 advice: returning 256 of 300 screens with no signal is a
        # correctness trap); the count pre-pass is a block walk only --
        # no LZW, no pixel buffers -- so the refusal costs no decode work
        _w, _h, n, _s = _decode_frames(payload, keep=set(), count_only=True)
        if n > DEFAULT_MAX_FRAMES:
            raise ValueError(
                f"GIF has {n} frames, over the default retention cap of "
                f"{DEFAULT_MAX_FRAMES}; pass max_frames or keep_indices "
                "explicitly to decode it"
            )
        keep = DEFAULT_MAX_FRAMES
    else:
        keep = max_frames  # 0 is a real bound, not "unlimited"
    width, height, _n, screens = _decode_frames(payload, keep=keep)
    return width, height, screens


def _decode_frames(payload: bytes, keep, count_only: bool = False):
    try:
        return _decode_frames_impl(payload, keep, count_only)
    except (struct.error, IndexError, TypeError) as exc:
        # fuzzed/corrupt bytes must surface as ValueError only (the
        # mapInPandas fallback contract), never crash an executor task
        raise ValueError(f"malformed GIF: {exc}") from exc


def _decode_frames_impl(payload: bytes, keep, count_only: bool):
    wanted = keep if isinstance(keep, (set, frozenset)) else None
    # frames AFTER the last requested index cannot affect any retained
    # screen (compositing only looks backward), so their pixel work
    # (LZW + composite) is skipped entirely -- decode_gif's keep=1 on a
    # 100-frame file costs ONE frame decode + a block walk, not 100
    # (r8 review); frames up to the last kept index still composite
    if wanted is not None:
        last_wanted = max(wanted) if wanted else -1
    else:
        last_wanted = keep - 1
    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    width, height = struct.unpack_from("<HH", payload, 6)
    if width <= 0 or height <= 0:
        raise ValueError("degenerate GIF dimensions")
    if width * height > MAX_PIXELS:
        raise ValueError("GIF dimensions exceed the decode cap")
    packed, bg = payload[10], payload[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 ** ((packed & 0x07) + 1)
        gct = np.frombuffer(payload, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    bg_fill = gct[bg] if gct is not None and bg < len(gct) else None
    n_frames = 0
    screen = None
    screens: list[np.ndarray] = []
    gce: tuple[int, int | None] | None = None  # (disposal, transparent idx)
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label byte + sub-block chain
            if pos >= len(payload):
                raise ValueError("truncated GIF extension")
            label = payload[pos]
            data, pos = _sub_blocks(payload, pos + 1)
            if label == 0xF9 and len(data) >= 4:
                # Graphic Control Extension: packed byte carries the
                # disposal method (bits 2-4) and transparency flag
                # (bit 0); byte 3 is the transparent color index.
                # Applies to the NEXT image descriptor only.
                disposal = (data[0] >> 2) & 0x07
                t_idx = data[3] if data[0] & 0x01 else None
                gce = (disposal, t_idx)
        elif block == 0x2C:  # image descriptor
            if pos + 9 > len(payload):
                raise ValueError("truncated GIF image descriptor")
            left, top, iw, ih = struct.unpack_from("<HHHH", payload, pos)
            ipacked = payload[pos + 8]
            pos += 9
            ct = gct
            if ipacked & 0x80:  # local color table
                n = 2 ** ((ipacked & 0x07) + 1)
                ct = np.frombuffer(payload, np.uint8, 3 * n, pos).reshape(n, 3)
                pos += 3 * n
            if ct is None:
                raise ValueError("GIF frame has no color table")
            if pos >= len(payload):
                raise ValueError("truncated GIF frame")
            min_code = payload[pos]
            lzw, pos = _sub_blocks(payload, pos + 1)
            if iw <= 0 or ih <= 0 or left + iw > width or top + ih > height:
                raise ValueError("GIF frame exceeds logical screen")
            n_frames += 1
            disposal, t_idx = gce if gce is not None else (0, None)
            gce = None  # a GCE governs exactly one image descriptor
            if count_only or n_frames - 1 > last_wanted:
                continue  # block walk only: no LZW, no pixel buffers
            idx = np.frombuffer(
                _lzw_decode(lzw, min_code, iw * ih), np.uint8
            ).reshape(ih, iw)
            if ipacked & 0x40:  # interlaced: reorder the 4 passes
                ordered = np.empty_like(idx)
                src = 0
                for start, step in _INTERLACE_PASSES:
                    rows = range(start, ih, step)
                    ordered[list(rows)] = idx[src : src + len(rows)]
                    src += len(rows)
                idx = ordered
            if idx.max(initial=0) >= len(ct):
                raise ValueError("GIF pixel index beyond color table")
            if n_frames == 1:
                screen = np.zeros((height, width, 3), np.uint8)
                if bg_fill is not None:
                    screen[:, :] = bg_fill
            # EVERY frame composites onto the one reused screen buffer;
            # transparent pixels leave the underlying screen (GIF89a
            # transparency-delta animation); only requested frames copy
            region = screen[top : top + ih, left : left + iw]
            if disposal == 3:
                saved = region.copy()  # restore-to-previous needs it
            if t_idx is not None:
                opaque = idx != t_idx
                # palette-lookup only the opaque pixels: ct[idx][opaque]
                # materialized the full rectangle's RGB first and threw
                # the transparent majority away (r11 review; delta
                # frames are mostly transparent)
                region[opaque] = ct[idx[opaque]]
            else:
                region[:, :] = ct[idx]
            if (n_frames - 1 in wanted) if wanted is not None                     else (n_frames <= keep):
                screens.append(screen.copy())
            # disposal applies AFTER the frame is displayed, before the
            # next frame draws (T.81-analog: GIF89a spec section 23)
            if disposal == 2:  # restore the rect to background
                region[:, :] = bg_fill if bg_fill is not None else 0
            elif disposal == 3:  # restore the rect to prior content
                region[:, :] = saved
        else:
            raise ValueError(f"unknown GIF block {block:#x}")
    if n_frames == 0:
        raise ValueError("GIF contains no image data")
    return width, height, n_frames, screens
