"""Baseline JPEG (JFIF) decoder in pure numpy + stdlib — no codec library.

Completes the real-decode set of the multimodal contract
(``operators/multimodal.py``: BMP, PNG) with the most common payload
format a media pipeline actually ingests. Scope: baseline sequential DCT,
8-bit precision, Huffman entropy coding, grayscale or YCbCr with 4:4:4 /
4:2:2 / 4:2:0 sampling, restart markers. Progressive, arithmetic-coded,
12-bit, and CMYK variants raise ``ValueError`` (the multimodal layer
falls back to Pillow-if-present or the documented fake, exactly like the
other decoders' unsupported profiles).

Structure (ITU-T T.81):
- markers: SOI, DQT (quant tables), SOF0 (dims, components, sampling
  factors), DHT (Huffman tables), DRI (restart interval), SOS, EOI;
- the entropy-coded segment is a bitstream with 0xFF00 byte stuffing and
  optional RSTn markers that reset DC predictors on MCU boundaries;
- each MCU interleaves one 8x8 block per component per sampling factor;
  blocks decode as (Huffman DC diff, run-length AC), de-zigzag,
  dequantize, IDCT (an 8x8 cosine-basis matrix product), +128 level
  shift;
- chroma upsamples by sample replication; YCbCr -> RGB by the JFIF
  equations.

Like the PNG/BMP siblings this is per-payload Python executed inside
Arrow-batched ``mapInPandas`` workers — a narrow map; nothing here
touches the driver or shuffles.
"""

from __future__ import annotations

import struct

import numpy as np

#: zigzag order: index i of the scan -> position in the 8x8 block
_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])

#: 8x8 IDCT basis: pixel[x] = sum_u C[u] cos((2x+1)u pi/16) coef[u] / 2
_IDCT_M = np.array([
    [
        (np.sqrt(0.125) if u == 0 else 0.5)
        * np.cos((2 * x + 1) * u * np.pi / 16)
        for u in range(8)
    ]
    for x in range(8)
])


def _idct2(block: np.ndarray) -> np.ndarray:
    return _IDCT_M @ block @ _IDCT_M.T


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment, honoring
    0xFF00 byte stuffing; stops at any other 0xFF-marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy data truncated")
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise ValueError("JPEG entropy data truncated at marker")
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                raise _MarkerHit(0xFF00 | nxt)
        else:
            self.pos += 1
        self.bits = (self.bits << 8) | b
        self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.bits >> self.nbits) & ((1 << n) - 1)
        self.bits &= (1 << self.nbits) - 1
        return v

    def align(self) -> None:
        self.bits = 0
        self.nbits = 0


class _MarkerHit(Exception):
    """Raised when the bit reader lands on a real marker (RSTn / EOI)."""

    def __init__(self, marker: int):
        self.marker = marker


class _Huff:
    """Canonical Huffman table from a DHT segment: (length, code) -> symbol."""

    def __init__(self, counts: list[int], symbols: bytes):
        self.lut: dict[tuple[int, int], int] = {}
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lut[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read(1)
            sym = self.lut.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 F.12: map an s-bit magnitude to its signed value."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg_pixels(payload: bytes) -> tuple[int, int, np.ndarray]:
    """REAL decoder for baseline sequential JPEG: returns (width, height,
    pixels[h, w, 1 or 3] uint8 — grayscale or RGB). Raises ``ValueError``
    on malformed input or non-baseline variants (progressive SOF2,
    arithmetic coding, 12-bit, CMYK) — ONLY ValueError, whatever the
    corruption (struct/index errors from fuzzed bytes are remapped), so a
    malformed payload can never kill an executor task instead of taking
    the documented fallback."""
    try:
        return _decode_jpeg(payload)
    except (struct.error, IndexError, TypeError) as exc:
        raise ValueError(f"malformed JPEG: {exc}") from exc


def _decode_jpeg(payload: bytes) -> tuple[int, int, np.ndarray]:
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    restart_interval = 0
    frame = None  # (height, width, [(comp_id, h_samp, v_samp, qt_id)])
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"bad JPEG marker sync at byte {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI before SOS
            raise ValueError("JPEG ended before scan data")
        (seg_len,) = struct.unpack_from(">H", payload, pos + 2)
        seg = payload[pos + 4 : pos + 2 + seg_len]
        if len(seg) != seg_len - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            s = 0
            while s < len(seg):
                pq, tq = seg[s] >> 4, seg[s] & 15
                if pq != 0:
                    raise ValueError("16-bit quant tables not baseline")
                qt[tq] = np.frombuffer(
                    seg[s + 1 : s + 65], np.uint8
                ).astype(np.int32)
                s += 65
        elif marker == 0xC4:  # DHT
            s = 0
            while s < len(seg):
                tc, th = seg[s] >> 4, seg[s] & 15
                counts = list(seg[s + 1 : s + 17])
                n = sum(counts)
                table = _Huff(counts, seg[s + 17 : s + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = table
                s += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1: baseline
            prec, h, w, ncomp = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec != 8:
                raise ValueError(f"{prec}-bit JPEG not baseline")
            if ncomp not in (1, 3):
                raise ValueError(f"{ncomp}-component JPEG unsupported")
            comps = []
            for c in range(ncomp):
                cid, samp, tq = seg[6 + 3 * c : 9 + 3 * c]
                hs, vs = samp >> 4, samp & 15
                if not (1 <= hs <= 4 and 1 <= vs <= 4):
                    # a fuzzed 0 factor would divide-by-zero in the MCU
                    # arithmetic -- outside the ValueError-only contract
                    raise ValueError(
                        f"invalid JPEG sampling factors {hs}x{vs}"
                    )
                comps.append((cid, hs, vs, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("progressive/arithmetic JPEG not baseline")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS: entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan_tables = {}
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_tables[cid] = (tabs >> 4, tabs & 15)
            return _decode_scan(
                payload, pos + 2 + seg_len, frame, scan_tables,
                qt, huff_dc, huff_ac, restart_interval,
            )
        pos += 2 + seg_len
    raise ValueError("JPEG has no SOS segment")


def _decode_scan(data, pos, frame, scan_tables, qt, huff_dc, huff_ac,
                 restart_interval):
    h, w, comps = frame
    if h <= 0 or w <= 0:
        raise ValueError("degenerate JPEG dimensions")
    from .gif import MAX_PIXELS

    if h * w > MAX_PIXELS:
        raise ValueError("JPEG dimensions exceed the decode cap")
    if len(scan_tables) == 1:
        # T.81 A.2 / B.2.3: a scan with ONE component is non-interleaved
        # -- the MCU is a single 8x8 data unit and the grid is
        # ceil(w/8) x ceil(h/8) REGARDLESS of the SOF sampling factors
        # (grayscale files from color-to-gray encoders commonly keep a
        # 2x2 declaration; interleaved geometry would misdecode them).
        if len(comps) != 1:
            # one scan of a multi-component frame = multi-scan
            # sequential file; we decode single-scan baseline only
            raise ValueError("multi-scan sequential JPEG unsupported")
        cid0, _hs0, _vs0, tq0 = comps[0]
        comps = [(cid0, 1, 1, tq0)]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = {}
    for cid, hs, vs, _tq in comps:
        planes[cid] = np.zeros((mcus_y * vs * 8, mcus_x * hs * 8))
    br = _BitReader(data, pos)
    pred = {cid: 0 for cid, *_ in comps}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                _expect_rst(br, data)
                pred = {cid: 0 for cid in pred}
            for cid, hs, vs, tq in comps:
                try:
                    dc_t = huff_dc[scan_tables[cid][0]]
                    ac_t = huff_ac[scan_tables[cid][1]]
                    q = qt[tq]
                except KeyError as exc:
                    raise ValueError("JPEG references missing table") from exc
                for by in range(vs):
                    for bx in range(hs):
                        try:
                            block = _decode_block(br, dc_t, ac_t, q, pred, cid)
                        except _MarkerHit as exc:
                            raise ValueError(
                                f"JPEG scan data ended early "
                                f"(marker {exc.marker:#x})"
                            ) from exc
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1
    # upsample to full resolution by sample replication, crop, color-convert
    full = []
    for cid, hs, vs, _tq in comps:
        p = planes[cid]
        p = np.repeat(np.repeat(p, vmax // vs, 0), hmax // hs, 1)
        full.append(p[:h, :w])
    if len(full) == 1:
        # round like the RGB path: truncation would drift 1 LSB low on
        # coefficients landing epsilon under the true integer
        gray = np.clip(np.round(full[0] + 128), 0, 255)
        return w, h, gray.astype(np.uint8)[:, :, None]
    y, cb, cr = full[0] + 128, full[1], full[2]
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.clip(np.dstack([r, g, b]).round(), 0, 255)
    return w, h, rgb.astype(np.uint8)


def _expect_rst(br: _BitReader, data: bytes) -> None:
    br.align()
    if (br.pos + 1 >= len(data) or data[br.pos] != 0xFF
            or not (0xD0 <= data[br.pos + 1] <= 0xD7)):
        raise ValueError("expected JPEG restart marker")
    br.pos += 2


def _decode_block(br, dc_t, ac_t, q, pred, cid) -> np.ndarray:
    coef = np.zeros(64, np.int32)
    s = dc_t.decode(br)
    if s > 11:
        raise ValueError("invalid JPEG DC magnitude")
    pred[cid] += _extend(br.read(s), s)
    coef[0] = pred[cid]
    k = 1
    while k < 64:
        rs = ac_t.decode(br)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if rs == 0xF0:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG AC run past block end")
        coef[k] = _extend(br.read(s), s)
        k += 1
    block = np.zeros(64, np.int32)
    block[_ZIGZAG] = coef * q
    return _idct2(block.reshape(8, 8))
