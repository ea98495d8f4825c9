"""WebP decoder in pure Python + numpy -- closes the last fake media
path (reference parity note: the reference Lambda treats payloads as
opaque bytes, lambda_function.py:60-128; media decode is part of this
repo's multimodal curation surface, not the reference's).

Scope, written from the public container / bitstream specifications
(RIFF container spec + "WebP Lossless Bitstream Specification"):

- **VP8L (lossless) decodes REAL pixels** -- the full bitstream:
  LSB-first bit reader, simple and normal prefix codes (code-length
  codes with the 16/17/18 repeat symbols and the ``max_symbol`` early
  stop), color cache, LZ77 backward references including the 120-entry
  close-neighbor plane map, meta prefix groups (entropy image), and all
  four transforms (predictor, color, subtract-green, color-indexing
  with sub-byte bundling).
- **VP8 (lossy) decodes REAL pixels too** (as of r9): the full
  key-frame path lives in :mod:`vp8` (boolean arithmetic decoder,
  token/coefficient decoding, intra prediction, IDCT/IWHT, in-loop
  deblocking), validated BIT-EXACTLY in YUV space against the system
  libwebp decoder; the RGB conversion is a documented BT.601 +
  nearest-upsample simplification. VP8X canvases decode their wrapped
  still image (lossless or lossy), and an ALPH chunk accompanying a
  lossy still or animation frame decodes to a REAL alpha plane (r10):
  raw or headless-VP8L-compressed per the container spec, with all
  three pre-compression filters inverted.

Malformed data raises ``ValueError`` -- the same contract as the
sibling decoders (the ``mapInPandas`` skip_invalid fallback path).
Per-payload Python executed inside Arrow-batched workers; a narrow
map, nothing driver-side.  Because every VP8L pixel costs Python-side
bit reads (unlike PNG, where only defiltering is Python), the whole
decode is bounded by the stricter ``SLOW_PATH_MAX_PIXELS`` cap.
"""

from __future__ import annotations

import struct

import numpy as np

from . import MAX_PIXELS, SLOW_PATH_MAX_PIXELS

#: code-length-code transmission order (spec section on normal codes)
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

#: LZ77 length alphabet size (prefix symbols 256..279 of the green code)
_NUM_LENGTH_CODES = 24
#: distance alphabet size
_NUM_DIST_CODES = 40
#: distance codes 1..120 address a close-neighbor (dx, dy) window
_NUM_PLANE_CODES = 120


def _make_plane_map() -> list[tuple[int, int]]:
    """The spec's 120-entry distance-code -> (dx, dy) neighbor table,
    generated from its construction rule: all offsets with dy in 0..7
    (dx 1..8 on the current row, dx -7..8 above), sorted by squared
    Euclidean distance, ties broken by larger dy then larger dx.  The
    first 40 entries are spot-pinned against the spec table verbatim in
    tests/test_webp.py so a rule error cannot self-cancel."""
    pts = [(dx, 0) for dx in range(1, 9)]
    pts += [(dx, dy) for dy in range(1, 8) for dx in range(-7, 9)]
    pts.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], -p[0]))
    return pts


_PLANE_MAP = _make_plane_map()


class _Bits:
    """LSB-first bit reader over the VP8L stream (post-signature)."""

    __slots__ = ("data", "i", "acc", "nacc")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.i = 0
        self.acc = 0
        self.nacc = 0

    def read(self, n: int) -> int:
        while self.nacc < n:
            if self.i >= len(self.data):
                raise ValueError("VP8L bitstream truncated")
            self.acc |= self.data[self.i] << self.nacc
            self.i += 1
            self.nacc += 8
        v = self.acc & ((1 << n) - 1)
        self.acc >>= n
        self.nacc -= n
        return v


class _Prefix:
    """Canonical prefix code, DEFLATE bit order (the first bit read is
    the most significant bit of the canonical code).  A code with a
    single used symbol reads zero bits per symbol (the simple-code
    num_symbols=1 form); any other code must be complete (Kraft sum
    exactly 1) or the stream is rejected.

    Decode is table-driven (r17 optimization round): a primary table
    indexed by the next ``fast_bits`` STREAM bits (LSB-first, so the
    index is the bit-reversed canonical code plus don't-care padding)
    resolves any symbol whose code is <= fast_bits long in ONE lookup
    instead of a per-bit dict walk — the classic zlib/libwebp primary-
    table shape. Symbols with longer codes (and reads near the end of
    the stream) fall back to the original bit-by-bit walk, so decoded
    symbols and error behavior are bit-identical (pinned by the
    libwebp-golden suite and the pixel-content oracle rows); the
    profile showed the per-bit walk at ~75% of VP8L decode wall."""

    __slots__ = ("table", "single", "fast", "fast_bits")

    #: primary-table width cap: 2^8 entries build in microseconds while
    #: covering every code the synth corpus and typical encoders emit;
    #: longer codes (up to the format's 15) take the fallback walk
    FAST_BITS_MAX = 8

    def __init__(self, lengths: list[int]) -> None:
        nz = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if not nz:
            raise ValueError("VP8L prefix code with no symbols")
        if len(nz) == 1:
            self.table = None
            self.single = nz[0][1]
            self.fast = None
            self.fast_bits = 0
            return
        self.single = -1
        max_len = max(ln for ln, _ in nz)
        if max_len > 15:
            raise ValueError("VP8L prefix code length beyond 15")
        bl_count = [0] * (max_len + 1)
        for ln, _ in nz:
            bl_count[ln] += 1
        kraft = sum(c << (max_len - ln) for ln, c in enumerate(bl_count) if ln)
        if kraft != 1 << max_len:
            raise ValueError("VP8L prefix code is not complete")
        code = 0
        next_code = [0] * (max_len + 1)
        for ln in range(1, max_len + 1):
            code = (code + bl_count[ln - 1]) << 1
            next_code[ln] = code
        table: dict[tuple[int, int], int] = {}
        fast_bits = min(max_len, self.FAST_BITS_MAX)
        fast: list[tuple[int, int] | None] = [None] * (1 << fast_bits)
        # walk only the used symbols (nz is already in symbol order, so
        # canonical code assignment is identical to an alphabet scan)
        for ln, sym in nz:
            code = next_code[ln]
            table[(ln, code)] = sym
            next_code[ln] += 1
            if ln <= fast_bits:
                # stream order is MSB-of-code first, reader is
                # LSB-first: the table index's low ln bits are the
                # bit-reversed code; higher bits are don't-care
                rev = 0
                for b in range(ln):
                    rev |= ((code >> b) & 1) << (ln - 1 - b)
                for pad in range(1 << (fast_bits - ln)):
                    fast[rev | (pad << ln)] = (sym, ln)
        self.table = table
        self.fast = fast
        self.fast_bits = fast_bits

    def read(self, br: _Bits) -> int:
        if self.table is None:
            return self.single
        # inlined peek (per-symbol hot path): fill the accumulator to
        # fast_bits if the stream still has bytes, then one table lookup
        n = self.fast_bits
        while br.nacc < n and br.i < len(br.data):
            br.acc |= br.data[br.i] << br.nacc
            br.i += 1
            br.nacc += 8
        e = self.fast[br.acc & ((1 << n) - 1)]
        if e is not None and e[1] <= br.nacc:
            br.acc >>= e[1]
            br.nacc -= e[1]
            return e[0]
        # fallback: code longer than the primary table (or the stream
        # ends mid-code) — the original per-bit canonical walk, so
        # symbols and truncation errors are unchanged
        code = 0
        ln = 0
        while ln < 15:
            code = (code << 1) | br.read(1)
            ln += 1
            sym = self.table.get((ln, code), -1)
            if sym >= 0:
                return sym
        raise ValueError("VP8L prefix code walk exceeded 15 bits")


#: _Prefix-by-lengths memo (r18, guide §4.5 — the bpe encode-memo
#: precedent): a prefix decoder is a PURE function of its code-length
#: list, and real corpora repeat codebooks heavily across images (the
#: synth corpus measures 2400 builds but only 483 distinct length
#: tuples — an 80% hit rate), yet ~38% of decode wall was rebuilding
#: canonical tables per image. Process-lifetime memo, bounded: on
#: overflow it clears and rebuilds the hot set (decode stays correct
#: either way — construction errors are raised before anything is
#: stored, so invalid streams still fail identically).
_PREFIX_MEMO: dict[tuple, _Prefix] = {}
_PREFIX_MEMO_CAP = 4096


def _prefix_for(lengths: list[int]) -> _Prefix:
    # FAST_BITS_MAX rides the key: the table-off parity test (and any
    # A/B instrumentation) flips the class attribute, and a memo hit
    # built under the other width would silently undo the flip
    key = (_Prefix.FAST_BITS_MAX, tuple(lengths))
    p = _PREFIX_MEMO.get(key)
    if p is None:
        p = _Prefix(lengths)
        if len(_PREFIX_MEMO) >= _PREFIX_MEMO_CAP:
            _PREFIX_MEMO.clear()
        _PREFIX_MEMO[key] = p
    return p


def _read_code_lengths(
    br: _Bits, cl: _Prefix, alphabet_size: int
) -> list[int]:
    """Symbol code lengths via the code-length code: literals 0..15,
    16 = repeat previous nonzero (2 extra bits, offset 3), 17/18 =
    zero runs (3/7 extra bits, offsets 3/11), with the optional
    max_symbol early stop."""
    if br.read(1):
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
        if max_symbol > alphabet_size:
            # libwebp's ReadHuffmanCodeLengths rejects this as a
            # bitstream error; accepting it would decode streams the
            # reference decoder refuses (r11 review)
            raise ValueError("VP8L max_symbol exceeds the alphabet")
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    symbol = 0
    prev = 8
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = cl.read(br)
        if code_len < 16:
            lengths[symbol] = code_len
            symbol += 1
            if code_len:
                prev = code_len
        else:
            if code_len == 16:
                repeat, fill = 3 + br.read(2), prev
            elif code_len == 17:
                repeat, fill = 3 + br.read(3), 0
            else:
                repeat, fill = 11 + br.read(7), 0
            if symbol + repeat > alphabet_size:
                raise ValueError("VP8L code-length repeat overruns alphabet")
            for _ in range(repeat):
                lengths[symbol] = fill
                symbol += 1
    return lengths


def _read_prefix_code(br: _Bits, alphabet_size: int) -> _Prefix:
    if br.read(1):  # simple code: 1 or 2 symbols stored verbatim
        num_symbols = br.read(1) + 1
        first = br.read(8) if br.read(1) else br.read(1)
        syms = [first]
        if num_symbols == 2:
            syms.append(br.read(8))
        if len(set(syms)) != len(syms):
            raise ValueError("VP8L simple code repeats a symbol")
        if any(s >= alphabet_size for s in syms):
            raise ValueError("VP8L simple code symbol beyond alphabet")
        lengths = [0] * alphabet_size
        for s in syms:
            lengths[s] = 1
        return _prefix_for(lengths)
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl = _prefix_for(cl_lengths)
    return _prefix_for(_read_code_lengths(br, cl, alphabet_size))


def _prefix_value(br: _Bits, prefix: int) -> int:
    """LZ77 length/distance prefix decoding: symbols 0..3 map to 1..4;
    beyond that each symbol covers a power-of-two range with extra
    bits."""
    if prefix < 4:
        return prefix + 1
    extra = (prefix - 2) >> 1
    offset = (2 + (prefix & 1)) << extra
    return offset + br.read(extra) + 1


def _plane_to_dist(code: int, xsize: int) -> int:
    if code < 1:
        raise ValueError("VP8L distance code 0")
    if code > _NUM_PLANE_CODES:
        return code - _NUM_PLANE_CODES
    dx, dy = _PLANE_MAP[code - 1]
    dist = dy * xsize + dx
    return dist if dist >= 1 else 1


def _subsample(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _read_prefix_group(br: _Bits, cache_size: int) -> tuple:
    """The five prefix codes of one meta group: green (literals +
    length prefixes + cache indices), red, blue, alpha, distance."""
    green = _read_prefix_code(br, 256 + _NUM_LENGTH_CODES + cache_size)
    red = _read_prefix_code(br, 256)
    blue = _read_prefix_code(br, 256)
    alpha = _read_prefix_code(br, 256)
    dist = _read_prefix_code(br, _NUM_DIST_CODES)
    return green, red, blue, alpha, dist


def _decode_pixels(
    br: _Bits,
    xsize: int,
    ysize: int,
    groups: list[tuple],
    meta,
    meta_bits: int,
    cache_bits: int,
) -> list[int]:
    total = xsize * ysize
    out = [0] * total
    cache = [0] * (1 << cache_bits) if cache_bits else None
    shift = 32 - cache_bits if cache_bits else 0
    pos = 0
    g = groups[0]
    meta_w = 0 if meta is None else meta.shape[1]
    while pos < total:
        if meta is not None:
            y, x = divmod(pos, xsize)
            g = groups[meta[(y >> meta_bits) * meta_w + (x >> meta_bits)]]
        green, red, blue, alpha, dist_code = g
        sym = green.read(br)
        if sym < 256:
            r = red.read(br)
            b = blue.read(br)
            a = alpha.read(br)
            px = (a << 24) | (r << 16) | (sym << 8) | b
            out[pos] = px
            pos += 1
            if cache is not None:
                cache[((0x1E35A7BD * px) & 0xFFFFFFFF) >> shift] = px
        elif sym < 256 + _NUM_LENGTH_CODES:
            length = _prefix_value(br, sym - 256)
            dist = _plane_to_dist(_prefix_value(br, dist_code.read(br)), xsize)
            if dist > pos:
                raise ValueError("VP8L backward reference before image start")
            if pos + length > total:
                raise ValueError("VP8L backward reference overruns image")
            for _ in range(length):
                px = out[pos - dist]
                out[pos] = px
                pos += 1
                if cache is not None:
                    cache[((0x1E35A7BD * px) & 0xFFFFFFFF) >> shift] = px
        else:
            if cache is None:
                raise ValueError("VP8L cache symbol without a color cache")
            out[pos] = cache[sym - 256 - _NUM_LENGTH_CODES]
            pos += 1
    return out


def _decode_image_stream(
    br: _Bits, xsize: int, ysize: int, is_level0: bool
) -> np.ndarray:
    """One spatially-coded image; the level-0 (main) image may carry
    transforms and a meta prefix image, sub-images may not.  Returns
    the (ysize', xsize') uint32 ARGB array AFTER inverse transforms
    (xsize' is the pre-bundling width for color-indexed images)."""
    transforms: list[tuple] = []
    if is_level0:
        seen: set[int] = set()
        while br.read(1):
            ttype = br.read(2)
            if ttype in seen:
                raise ValueError("VP8L transform repeated")
            seen.add(ttype)
            if ttype in (0, 1):  # predictor / color: tiled sub-image
                size_bits = br.read(3) + 2
                sub = _decode_image_stream(
                    br,
                    _subsample(xsize, size_bits),
                    _subsample(ysize, size_bits),
                    False,
                )
                transforms.append((ttype, size_bits, sub))
            elif ttype == 2:  # subtract green: no data
                transforms.append((2, None, None))
            else:  # color indexing: palette + sub-byte bundling
                n_colors = br.read(8) + 1
                pal_img = _decode_image_stream(br, n_colors, 1, False)
                # palette entries are delta-coded componentwise mod 256
                raw = pal_img.reshape(-1).astype(np.uint32)
                comps = [
                    np.cumsum((raw >> s) & 0xFF, dtype=np.uint32) & 0xFF
                    for s in (24, 16, 8, 0)
                ]
                palette = (
                    (comps[0] << 24) | (comps[1] << 16)
                    | (comps[2] << 8) | comps[3]
                )
                if n_colors <= 2:
                    width_bits = 3
                elif n_colors <= 4:
                    width_bits = 2
                elif n_colors <= 16:
                    width_bits = 1
                else:
                    width_bits = 0
                transforms.append((3, width_bits, (palette, xsize)))
                if width_bits:
                    xsize = _subsample(xsize, width_bits)
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"VP8L color cache bits {cache_bits} out of range")
    meta = None
    meta_bits = 0
    n_groups = 1
    if is_level0 and br.read(1):  # meta prefix image
        meta_bits = br.read(3) + 2
        sub = _decode_image_stream(
            br,
            _subsample(xsize, meta_bits),
            _subsample(ysize, meta_bits),
            False,
        )
        meta2d = ((sub >> 8) & 0xFFFF).astype(np.int64)
        n_groups = int(meta2d.max()) + 1
        meta = _MetaIndex(meta2d)
    groups = [
        _read_prefix_group(br, (1 << cache_bits) if cache_bits else 0)
        for _ in range(n_groups)
    ]
    pixels = _decode_pixels(br, xsize, ysize, groups, meta, meta_bits, cache_bits)
    arr = np.array(pixels, np.uint32).reshape(ysize, xsize)
    for ttype, size_bits, data in reversed(transforms):
        if ttype == 0:
            arr = _inverse_predictor(arr, size_bits, data)
        elif ttype == 1:
            arr = _inverse_color_transform(arr, size_bits, data)
        elif ttype == 2:
            arr = _inverse_subtract_green(arr)
        else:
            arr = _inverse_color_index(arr, size_bits, *data)
    return arr


class _MetaIndex:
    """Flattened meta-image lookup (kept row-major so the pixel loop
    indexes a python list, not per-element numpy scalars)."""

    __slots__ = ("flat", "shape")

    def __init__(self, arr2d: np.ndarray) -> None:
        self.flat = arr2d.reshape(-1).tolist()
        self.shape = arr2d.shape

    def __getitem__(self, i: int) -> int:
        return self.flat[i]


def _inverse_subtract_green(arr: np.ndarray) -> np.ndarray:
    g = (arr >> 8) & 0xFF
    r = (((arr >> 16) & 0xFF) + g) & 0xFF
    b = ((arr & 0xFF) + g) & 0xFF
    return (arr & np.uint32(0xFF00FF00)) | (r << 16) | b


def _s8(x: np.ndarray) -> np.ndarray:
    """Reinterpret a 0..255 integer array as signed int8 values."""
    x = x.astype(np.int32)
    return ((x + 128) & 0xFF) - 128


def _expand_tiles(sub: np.ndarray, size_bits: int, h: int, w: int) -> np.ndarray:
    """Repeat each tile value over its (1<<size_bits)^2 block, cropped
    to the image rectangle."""
    rep = 1 << size_bits
    return np.repeat(np.repeat(sub, rep, axis=0), rep, axis=1)[:h, :w]


def _inverse_color_transform(
    arr: np.ndarray, size_bits: int, sub: np.ndarray
) -> np.ndarray:
    h, w = arr.shape
    g2r = _s8(_expand_tiles(sub & 0xFF, size_bits, h, w))
    g2b = _s8(_expand_tiles((sub >> 8) & 0xFF, size_bits, h, w))
    r2b = _s8(_expand_tiles((sub >> 16) & 0xFF, size_bits, h, w))
    green = (arr >> 8) & 0xFF
    red = ((arr >> 16) & 0xFF).astype(np.int32)
    blue = (arr & 0xFF).astype(np.int32)
    sg = _s8(green)
    new_red = (red + ((g2r * sg) >> 5)) & 0xFF
    blue = blue + ((g2b * sg) >> 5)
    blue = (blue + ((r2b * _s8(new_red)) >> 5)) & 0xFF
    return (
        (arr & np.uint32(0xFF00FF00))
        | (new_red.astype(np.uint32) << 16)
        | blue.astype(np.uint32)
    )


def _inverse_color_index(
    arr: np.ndarray, width_bits: int, palette: np.ndarray, orig_w: int
) -> np.ndarray:
    h = arr.shape[0]
    if width_bits == 0:
        idx = (arr >> 8) & 0xFF
    else:
        per = 1 << width_bits
        bits = 8 >> width_bits
        g = (arr >> 8) & 0xFF
        parts = [(g >> (bits * k)) & ((1 << bits) - 1) for k in range(per)]
        idx = np.stack(parts, axis=2).reshape(h, -1)[:, :orig_w]
    # out-of-range indices decode as 0x00000000 per the spec
    safe = np.minimum(idx, len(palette) - 1)
    return np.where(idx < len(palette), palette[safe], np.uint32(0))


def _avg2(a: int, b: int) -> int:
    """Per-byte (a + b) >> 1 on packed ARGB without cross-byte carry."""
    return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)


def _bytes4(p: int) -> tuple[int, int, int, int]:
    return (p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF


def _pack4(a: int, r: int, g: int, b: int) -> int:
    return (a << 24) | (r << 16) | (g << 8) | b


def _clamp(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _select(left: int, top: int, topleft: int) -> int:
    l4, t4, tl4 = _bytes4(left), _bytes4(top), _bytes4(topleft)
    # manhattan distance of each candidate to the gradient estimate
    p_l = sum(abs(t4[i] - tl4[i]) for i in range(4))
    p_t = sum(abs(l4[i] - tl4[i]) for i in range(4))
    return left if p_l < p_t else top


def _clamp_add_sub_full(left: int, top: int, topleft: int) -> int:
    l4, t4, tl4 = _bytes4(left), _bytes4(top), _bytes4(topleft)
    return _pack4(*(_clamp(l4[i] + t4[i] - tl4[i]) for i in range(4)))


def _clamp_add_sub_half(left: int, top: int, topleft: int) -> int:
    av, tl4 = _bytes4(_avg2(left, top)), _bytes4(topleft)
    out = []
    for i in range(4):
        d = av[i] - tl4[i]
        # C's / 2 truncates toward zero (negative deltas round up)
        out.append(_clamp(av[i] + (d // 2 if d >= 0 else -((-d) // 2))))
    return _pack4(*out)


def _inverse_predictor(
    arr: np.ndarray, size_bits: int, sub: np.ndarray
) -> np.ndarray:
    """Sequential scan-order reconstruction: each pixel adds (per byte,
    mod 256) a prediction computed from already-reconstructed
    neighbors.  Spec edge rules: (0,0) predicts 0xff000000, the top row
    predicts L, the left column predicts T, and TR on the rightmost
    column is the current row's leftmost pixel."""
    h, w = arr.shape
    modes = ((sub >> 8) & 0xFF).astype(np.int64).reshape(-1).tolist()
    sub_w = sub.shape[1]
    px = arr.reshape(-1).tolist()
    for y in range(h):
        row = y * w
        mrow = (y >> size_bits) * sub_w
        for x in range(w):
            i = row + x
            if y == 0:
                pred = 0xFF000000 if x == 0 else px[i - 1]
            elif x == 0:
                pred = px[i - w]
            else:
                mode = modes[mrow + (x >> size_bits)]
                if mode == 0:
                    pred = 0xFF000000
                elif mode == 1:
                    pred = px[i - 1]
                elif mode == 2:
                    pred = px[i - w]
                elif mode == 3:
                    pred = px[i - w + 1] if x + 1 < w else px[row]
                elif mode == 4:
                    pred = px[i - w - 1]
                elif mode == 5:
                    tr = px[i - w + 1] if x + 1 < w else px[row]
                    pred = _avg2(_avg2(px[i - 1], tr), px[i - w])
                elif mode == 6:
                    pred = _avg2(px[i - 1], px[i - w - 1])
                elif mode == 7:
                    pred = _avg2(px[i - 1], px[i - w])
                elif mode == 8:
                    pred = _avg2(px[i - w - 1], px[i - w])
                elif mode == 9:
                    tr = px[i - w + 1] if x + 1 < w else px[row]
                    pred = _avg2(px[i - w], tr)
                elif mode == 10:
                    tr = px[i - w + 1] if x + 1 < w else px[row]
                    pred = _avg2(
                        _avg2(px[i - 1], px[i - w - 1]), _avg2(px[i - w], tr)
                    )
                elif mode == 11:
                    pred = _select(px[i - 1], px[i - w], px[i - w - 1])
                elif mode == 12:
                    pred = _clamp_add_sub_full(
                        px[i - 1], px[i - w], px[i - w - 1]
                    )
                elif mode == 13:
                    pred = _clamp_add_sub_half(
                        px[i - 1], px[i - w], px[i - w - 1]
                    )
                else:
                    raise ValueError(f"VP8L predictor mode {mode} undefined")
            v = px[i]
            # per-byte add mod 256: alternating masks stop carries
            px[i] = (
                (((v & 0x00FF00FF) + (pred & 0x00FF00FF)) & 0x00FF00FF)
                | (((v & 0xFF00FF00) + (pred & 0xFF00FF00)) & 0xFF00FF00)
            ) & 0xFFFFFFFF
    return np.array(px, np.uint32).reshape(h, w)


def decode_vp8l_pixels(data: bytes) -> tuple[int, int, np.ndarray]:
    """REAL decoder for a VP8L chunk payload: returns (width, height,
    rgba[h, w, 4] uint8).  Raises ``ValueError`` on malformed data or
    outside the slow-path pixel cap."""
    try:
        return _decode_vp8l(data)
    except (IndexError, OverflowError) as exc:
        raise ValueError(f"malformed VP8L: {exc}") from exc


def _decode_vp8l(data: bytes) -> tuple[int, int, np.ndarray]:
    if not data or data[0] != 0x2F:
        raise ValueError("missing VP8L signature byte")
    br = _Bits(data[1:])
    width = br.read(14) + 1
    height = br.read(14) + 1
    br.read(1)  # alpha_is_used hint: informational only
    if br.read(3) != 0:
        raise ValueError("unknown VP8L version")
    # every pixel costs Python-side bit reads: the stricter cap applies
    if width * height > SLOW_PATH_MAX_PIXELS:
        raise ValueError("VP8L dimensions exceed the decode cap")
    arr = _decode_image_stream(br, width, height, True)
    if arr.shape != (height, width):
        raise ValueError("VP8L decoded shape mismatch")
    rgba = np.dstack(
        [
            (arr >> 16) & 0xFF,
            (arr >> 8) & 0xFF,
            arr & 0xFF,
            (arr >> 24) & 0xFF,
        ]
    ).astype(np.uint8)
    return width, height, rgba


def _vp8_dimensions(body: bytes) -> tuple[int, int]:
    """Lossy VP8 keyframe dimensions from the uncompressed frame header
    (3-byte frame tag, 3-byte start code 9D 01 2A, two 16-bit fields
    whose low 14 bits are width/height)."""
    if len(body) < 10:
        raise ValueError("truncated VP8 frame header")
    if body[0] & 0x01:
        raise ValueError("VP8 stream does not start with a key frame")
    if body[3:6] != b"\x9d\x01\x2a":
        raise ValueError("bad VP8 keyframe start code")
    width = struct.unpack_from("<H", body, 6)[0] & 0x3FFF
    height = struct.unpack_from("<H", body, 8)[0] & 0x3FFF
    if width == 0 or height == 0:
        raise ValueError("degenerate VP8 dimensions")
    return width, height


def _subchunks(data: bytes) -> list[tuple[bytes, bytes]]:
    """Walk a sequence of even-padded RIFF chunks (container payload
    after the WEBP fourcc, or ANMF frame data)."""
    chunks: list[tuple[bytes, bytes]] = []
    pos = 0
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError("truncated WebP chunk")
        chunks.append((tag, body))
        pos += 8 + size + (size & 1)  # chunks are even-padded
    return chunks


def _riff_chunks(payload: bytes) -> list[tuple[bytes, bytes]]:
    if (
        len(payload) < 21
        or payload[:4] != b"RIFF"
        or payload[8:12] != b"WEBP"
    ):
        raise ValueError("not a WebP payload")
    riff_size = struct.unpack_from("<I", payload, 4)[0]
    if riff_size < 4:
        raise ValueError("WebP RIFF size too small")
    # bound the walk by the declared RIFF extent, not the payload
    # length: a chunk may not consume bytes outside the container
    end = min(len(payload), 8 + riff_size)
    chunks = _subchunks(payload[12:end])
    if not chunks:
        raise ValueError("WebP container has no chunks")
    return chunks


def _unfilter_alpha(plane: np.ndarray, method: int) -> np.ndarray:
    """Invert the ALPH pre-compression filter (container spec 'Alpha'
    section): 1 = horizontal (pred = left; row starts predict from the
    pixel above; origin predicts 0), 2 = vertical (pred = above; the
    first row falls back to horizontal), 3 = gradient (pred =
    clip(left + above - above_left, 0..255); first row horizontal,
    row starts predict from above). All sums are mod 256."""
    h, w = plane.shape
    p = plane.astype(np.int64)
    if method == 1:
        p[0] = np.cumsum(p[0]) & 0xFF
        for y in range(1, h):
            row = p[y]
            row[0] = (row[0] + p[y - 1, 0]) & 0xFF
            # left-dependency chain: a cumsum from the row start IS the
            # mod-256 horizontal unfilter for the rest of the row
            row[1:] = (np.cumsum(row[1:]) + row[0]) & 0xFF
    elif method == 2:
        p[0] = np.cumsum(p[0]) & 0xFF
        p[1:] = np.cumsum(p, axis=0)[1:] & 0xFF
    else:  # gradient
        p[0] = np.cumsum(p[0]) & 0xFF
        for y in range(1, h):
            # plain-int lists for the per-pixel dependency chain: numpy
            # scalar indexing in this loop is several times slower (the
            # file's standing pattern -- see _inverse_predictor)
            row = p[y].tolist()
            above = p[y - 1].tolist()
            row[0] = (row[0] + above[0]) & 0xFF
            for x in range(1, w):
                g = row[x - 1] + above[x] - above[x - 1]
                pred = 0 if g < 0 else (255 if g > 255 else g)
                row[x] = (row[x] + pred) & 0xFF
            p[y] = row
    return p.astype(np.uint8)


def _decode_alpha_plane(body: bytes, width: int, height: int) -> np.ndarray:
    """Decode an ALPH chunk to an (height, width) uint8 alpha plane
    (container spec 'Alpha' section). Header byte: 2 reserved bits, 2
    preprocessing bits (informational -- level reduction happens at
    encode time, nothing to invert), 2 filtering bits, 2 compression
    bits. Compression 0 = raw width*height bytes row-major; 1 = a
    HEADLESS VP8L stream (no signature or dimension header -- dims come
    from the frame) whose GREEN channel carries the alpha values; the
    existing level-0 image-stream decoder handles it, transforms and
    all. Filtering is inverted after decompression."""
    if not body:
        raise ValueError("empty ALPH chunk")
    filt = (body[0] >> 2) & 0x3
    comp = body[0] & 0x3
    data = body[1:]
    if comp == 0:
        if len(data) < width * height:
            raise ValueError("raw ALPH plane truncated")
        plane = (
            np.frombuffer(data[: width * height], np.uint8)
            .reshape(height, width)
            .copy()
        )
    elif comp == 1:
        try:
            # the same IndexError/OverflowError -> ValueError fold the
            # decode_vp8l_pixels wrapper applies to this machinery: a
            # malformed headless stream must take the documented
            # fallback, not escape as a non-ValueError (r11 review)
            arr = _decode_image_stream(_Bits(data), width, height, True)
        except (IndexError, OverflowError) as exc:
            raise ValueError(f"malformed ALPH lossless stream: {exc}") from exc
        if arr.shape != (height, width):
            raise ValueError("ALPH lossless plane dims disagree with frame")
        plane = ((arr >> 8) & 0xFF).astype(np.uint8)
    else:
        raise ValueError(f"ALPH compression method {comp} undefined")
    if filt:
        plane = _unfilter_alpha(plane, filt)
    return plane


def _decode_embedded_image(
    sub: list,
) -> tuple[int, int, np.ndarray] | None:
    """Decode the first VP8L/VP8 image chunk of a chunk list,
    compositing a sibling ALPH plane onto lossy pixels (a lossless
    chunk carries its own alpha, so ALPH is ignored for VP8L per the
    container spec). The ONE implementation behind both the VP8X still
    path and the ANMF frame loop (r11 review: two hand-maintained
    copies had to receive the r10 per-frame-alpha fix separately).
    Returns (w, h, rgba) or None when no image chunk is present."""
    alph = next((b for t, b in sub if t == b"ALPH"), None)
    for t, b in sub:
        if t in (b"VP8L", b"VP8 "):
            if t == b"VP8L":
                w, h, rgba = decode_vp8l_pixels(b)
            else:
                from .vp8 import decode_vp8_pixels

                w, h, rgba = decode_vp8_pixels(b)
                if alph is not None:
                    rgba = rgba.copy()
                    rgba[..., 3] = _decode_alpha_plane(alph, w, h)
            return w, h, rgba
    return None


def decode_webp(
    payload: bytes,
) -> tuple[int, int, int, np.ndarray | None, str]:
    """Decode a WebP container: returns (width, height, n_frames,
    rgba_or_None, codec) where codec is 'vp8l', 'vp8' or 'vp8x'.
    Pixels are real for VP8L and VP8 stills; a VP8X container decodes
    its wrapped still image (``None`` only for animated canvases,
    whose composited frames come from :func:`decode_webp_frames`)."""
    chunks = _riff_chunks(payload)
    tag, body = chunks[0]
    if tag == b"VP8L":
        width, height, rgba = decode_vp8l_pixels(body)
        return width, height, 1, rgba, "vp8l"
    if tag == b"VP8 ":
        from .vp8 import decode_vp8_pixels

        width, height, rgba = decode_vp8_pixels(body)
        return width, height, 1, rgba, "vp8"
    if tag == b"VP8X":
        if len(body) < 10:
            raise ValueError("truncated VP8X chunk")
        width = 1 + int.from_bytes(body[4:7], "little")
        height = 1 + int.from_bytes(body[7:10], "little")
        if width * height > MAX_PIXELS:
            raise ValueError("VP8X canvas exceeds the decode cap")
        n_frames = sum(1 for t, _ in chunks if t == b"ANMF") or 1
        # a still VP8X (alpha/ICC/EXIF wrapper) carries one image chunk
        # at the top level
        got = _decode_embedded_image(chunks[1:])
        rgba = None
        if got is not None:
            in_w, in_h, rgba = got
            # the returned dims must describe the returned pixels: a
            # still image whose frame disagrees with the declared
            # canvas is malformed, not silently mismatched
            if (in_w, in_h) != (width, height):
                raise ValueError(
                    "VP8X still frame dims disagree with the canvas"
                )
        return width, height, n_frames, rgba, "vp8x"
    raise ValueError(f"WebP leading chunk {tag!r} is not an image")


def count_webp_frames(payload: bytes) -> tuple[int, int, int]:
    """(canvas width, height, n_frames) by walking the chunk structure
    only -- no pixel decode; the cheap first pass of two-pass frame
    sampling (the GIF analog is :func:`gif.count_gif_frames`)."""
    chunks = _riff_chunks(payload)
    tag, body = chunks[0]
    if tag == b"VP8L":
        if not body or body[0] != 0x2F:
            raise ValueError("missing VP8L signature byte")
        br = _Bits(body[1:])
        return br.read(14) + 1, br.read(14) + 1, 1
    if tag == b"VP8 ":
        width, height = _vp8_dimensions(body)
        return width, height, 1
    if tag == b"VP8X":
        if len(body) < 10:
            raise ValueError("truncated VP8X chunk")
        width = 1 + int.from_bytes(body[4:7], "little")
        height = 1 + int.from_bytes(body[7:10], "little")
        return width, height, sum(1 for t, _ in chunks if t == b"ANMF") or 1
    raise ValueError(f"WebP leading chunk {tag!r} is not an image")


def _blend_over(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Source-over alpha compositing per the extended-format spec's
    blending formula, in exact integer arithmetic (floor of the
    rational): a = aS + aD*(255-aS)/255; rgb = (rgbS*aS*255 +
    rgbD*aD*(255-aS)) / (255*a), 0 where a == 0."""
    a_s = src[..., 3].astype(np.int64)
    a_d = dst[..., 3].astype(np.int64)
    inv = 255 - a_s
    a_out = a_s * 255 + a_d * inv  # scaled by 255
    rgb_num = (
        src[..., :3].astype(np.int64) * (a_s * 255)[..., None]
        + dst[..., :3].astype(np.int64) * (a_d * inv)[..., None]
    )
    safe = np.maximum(a_out, 1)
    out = np.empty_like(src)
    out[..., :3] = np.where(
        a_out[..., None] > 0, rgb_num // safe[..., None], 0
    ).astype(np.uint8)
    out[..., 3] = (a_out // 255).astype(np.uint8)
    return out


def decode_webp_frames(
    payload: bytes, keep_indices: set | None = None
) -> tuple[int, int, int, list[np.ndarray]]:
    """Decode COMPOSITED animation frames of an extended (VP8X + ANMF)
    WebP: each frame draws onto the running
    canvas at its (2-pixel-unit) offset, honoring the per-frame
    blending flag (bit 1: 1 = overwrite, 0 = source-over alpha blend)
    and disposal flag (bit 0: 1 = restore the frame rectangle to the
    ANIM background color) -- so frame k is what a viewer sees at step
    k.  Returns (width, height, n_frames, [canvas[h, w, 4] uint8 for
    each kept index]).  Both VP8L-coded (lossless) and VP8-coded
    (lossy key-frame) ANMF payloads decode real pixels.  Frames after
    the last kept index are counted but never pixel-decoded -- same
    memory/CPU contract as the GIF sibling."""
    chunks = _riff_chunks(payload)
    tag, body = chunks[0]
    if tag == b"VP8L":  # a still image is its own single frame
        width, height, rgba = decode_vp8l_pixels(body)
        keep = keep_indices if keep_indices is not None else {0}
        return width, height, 1, [rgba] if 0 in keep else []
    if tag == b"VP8 ":  # lossy still: also its own single frame (r11
        from .vp8 import decode_vp8_pixels  # review: count_webp_frames

        # counts it as 1, so the decode pass must accept it too)
        width, height, rgba = decode_vp8_pixels(body)
        keep = keep_indices if keep_indices is not None else {0}
        return width, height, 1, [rgba] if 0 in keep else []
    if tag != b"VP8X":
        raise ValueError("WebP payload has no decodable frames")
    if len(body) < 10:
        raise ValueError("truncated VP8X chunk")
    width = 1 + int.from_bytes(body[4:7], "little")
    height = 1 + int.from_bytes(body[7:10], "little")
    if width * height > SLOW_PATH_MAX_PIXELS:
        raise ValueError("WebP canvas exceeds the decode cap")
    frames = [b for t, b in chunks if t == b"ANMF"]
    if not frames:
        # a still VP8X: delegate to the single-image path
        w, h, n, rgba, _codec = decode_webp(payload)
        if rgba is None:
            raise ValueError("still VP8X carries no image chunk")
        keep = keep_indices if keep_indices is not None else {0}
        return w, h, 1, [rgba] if 0 in keep else []
    keep = keep_indices if keep_indices is not None else set(range(len(frames)))
    last_wanted = max(keep) if keep else -1
    # canvas starts as the ANIM background color (BGRA bytes), else
    # transparent black
    bg = np.zeros(4, np.uint8)
    for t, b in chunks:
        if t == b"ANIM":
            if len(b) < 6:
                raise ValueError("truncated ANIM chunk")
            bg = np.array([b[2], b[1], b[0], b[3]], np.uint8)  # BGRA->RGBA
            break
    canvas = np.tile(bg, (height, width, 1))
    screens: list[np.ndarray] = []
    for idx, fb in enumerate(frames):
        if idx > last_wanted:
            break  # later frames cannot affect any retained screen
        if len(fb) < 16:
            raise ValueError("truncated ANMF header")
        fx = int.from_bytes(fb[0:3], "little") * 2
        fy = int.from_bytes(fb[3:6], "little") * 2
        fw = 1 + int.from_bytes(fb[6:9], "little")
        fh = 1 + int.from_bytes(fb[9:12], "little")
        flags = fb[15]
        if fx + fw > width or fy + fh > height:
            raise ValueError("ANMF frame exceeds the canvas")
        got = _decode_embedded_image(list(_subchunks(fb[16:])))
        if got is None:
            raise ValueError("ANMF frame carries no image chunk")
        fw_d, fh_d, rgba = got
        if (fw_d, fh_d) != (fw, fh):
            raise ValueError("ANMF frame dims disagree with header")
        region = canvas[fy : fy + fh, fx : fx + fw]
        if flags & 0x02:  # no-blend: overwrite the rectangle
            region[:, :] = rgba
        else:
            region[:, :] = _blend_over(rgba, region)
        if idx in keep:
            screens.append(canvas.copy())
        if flags & 0x01:  # dispose to background before the next frame
            region[:, :] = bg
    return width, height, len(frames), screens
