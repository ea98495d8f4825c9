"""Deterministic spec-written media payload synthesis — the media
analog of the CloudFront wire-format synth side (sources/cf_logs.py's
``to_wire_line``): given a doc_id, build a REAL container payload whose
metadata fields are pure arithmetic over the id.

Purpose: the container/audio metadata parsers (operators/{mp4,mkv,
audio}.py) are golden-tested in pytest, but the registry's oracle
discipline wants a Spark-vs-DuckDB hash check — which needs payloads
whose EXPECTED metadata an ANSI-SQL oracle can recompute without
parsing bytes. These builders derive every field from doc_id with the
formulas below; plans/multimodal.py's ``container_audio_meta`` row runs
the payloads through the production decode surfaces and the oracle
mirrors the same arithmetic (r11 verdict task #4).

Formulas (shared with the oracle SQL — change BOTH or the hash check
fails, which is the point):

- kind        = doc_id % 4: 0 = MP4, 1 = WebM, 2 = FLAC, 3 = MP3
- video w/h   = doc_id % 320 + 16 / doc_id % 240 + 16
- mp4 frames  = doc_id % 50 + 1 (stsz sample count)
- flac rate   = 8000 + (doc_id % 5) * 8000, channels = doc_id % 2 + 1,
  samples     = (doc_id % 1000 + 1) * 100
- mp3 rate    = (44100, 48000, 32000)[doc_id % 3] (header sr index),
  mono        = doc_id % 2 == 1, Xing frames = doc_id % 200 + 1
  (n_samples = frames * 1152, MPEG1 Layer III)

Byte layouts follow the public specs: ISO/IEC 14496-12 box structure,
RFC 8794 EBML + the Matroska element registry, the FLAC format spec's
METADATA_BLOCK_STREAMINFO, and ISO 11172-3 frame headers with the
community-standard Xing VBR tag. They are written HERE, independently
of the parsers that will read them (the same independence contract the
test-suite golden builders follow).
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


# ------------------------------------------------------------ ISO-BMFF

def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def _full(btype: bytes, body: bytes) -> bytes:
    return _box(btype, b"\x00\x00\x00\x00" + body)  # version 0, flags 0


def mp4_payload(doc_id: int) -> bytes:
    """Minimal ISO-BMFF movie: ftyp + moov(mvhd, trak(tkhd, mdia(hdlr,
    minf(stbl(stsd visual entry, stsz))))); timescale 1000 so mvhd
    duration ticks ARE milliseconds."""
    w = doc_id % 320 + 16
    h = doc_id % 240 + 16
    frames = doc_id % 50 + 1
    dur_ms = doc_id % 9000 + 1000
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isom" + b"mp42")
    mvhd = _full(b"mvhd", struct.pack(">IIII", 0, 0, 1000, dur_ms)
                 + struct.pack(">IHH", 0x00010000, 0x0100, 0)
                 + b"\x00" * 8 + b"\x00" * 36 + b"\x00" * 24
                 + struct.pack(">I", 2))
    # version 0, flags 3 = track_enabled | track_in_movie (8.3.2.3: a
    # zero-flag track is DISABLED; r13 review)
    tkhd = _box(b"tkhd", struct.pack(">I", 3)
                + struct.pack(">II", 0, 0) + struct.pack(">I", 1)
                + b"\x00" * 4
                + struct.pack(">I", 0) + b"\x00" * 8
                + struct.pack(">HHHH", 0, 0, 0, 0) + b"\x00" * 36
                + struct.pack(">II", w << 16, h << 16))
    # mdhd is MANDATORY in mdia (14496-12 8.4.2; r12 review -- the
    # parser does not read it, but the payload must be conformant for
    # any stricter reader): media timescale 1000, duration in ms,
    # language 'und' (packed 5-bit letters)
    mdhd = _full(b"mdhd", struct.pack(">IIII", 0, 0, 1000, dur_ms)
                 + struct.pack(">HH", 0x55C4, 0))
    hdlr = _full(b"hdlr", struct.pack(">I", 0) + b"vide"
                 + b"\x00" * 12 + b"\x00")
    # av1C is mandatory inside an av01 sample entry (AV1-ISOBMFF 2.3):
    # marker|version byte 0x81, then profile/level/tier and config bytes
    # (a minimal still-valid config record; r13 review)
    av1c = _box(b"av1C", bytes([0x81, 0x00, 0x0C, 0x00]))
    entry = (b"\x00" * 6 + struct.pack(">H", 1)            # SampleEntry
             + struct.pack(">HH", 0, 0) + b"\x00" * 12     # pre_defined
             + struct.pack(">HH", w, h)                    # coded dims
             + b"\x00" * 50                                # rest of VSE
             + av1c)
    stsd = _full(b"stsd", struct.pack(">I", 1)
                 + struct.pack(">I", 8 + len(entry)) + b"av01" + entry)
    # NONZERO constant sample_size: with sample_size == 0 the spec
    # makes the per-entry size table mandatory (8.7.3.2), which the old
    # spelling omitted (r12 review) -- a constant size legally omits it
    stsz = _full(b"stsz", struct.pack(">II", 4096, frames))
    # stts/stsc/stco are MANDATORY in stbl (8.6.1.2/8.7.4/8.7.5; r13
    # review): constant per-frame delta covering every sample, one chunk
    # holding all samples, one chunk offset (nothing reads the mdat-less
    # offset, but the boxes must exist for a conformant reader)
    stts = _full(b"stts", struct.pack(">III", 1, frames,
                                      max(dur_ms // frames, 1)))
    stsc = _full(b"stsc", struct.pack(">IIII", 1, 1, frames, 1))
    stco = _full(b"stco", struct.pack(">II", 1, 0))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    # vmhd (version 0, flags 1 per 12.1.2) and dinf/dref (one
    # self-contained url entry) are mandatory in a video minf (r13)
    vmhd = _box(b"vmhd", struct.pack(">I", 1)
                + struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full(b"dref", struct.pack(">I", 1)
                 + struct.pack(">I", 12) + b"url " + struct.pack(">I", 1))
    dinf = _box(b"dinf", dref)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    return ftyp + _box(b"moov", mvhd + trak)


# ---------------------------------------------------------------- EBML

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


def webm_payload(doc_id: int) -> bytes:
    """Minimal WebM: EBML header (DocType webm) + Segment(Info(
    TimestampScale 1e6 ns = 1 ms ticks, Duration float) + Tracks(
    TrackEntry(TrackType video, CodecID, Video(PixelWidth/Height))))."""
    w = doc_id % 320 + 16
    h = doc_id % 240 + 16
    dur_ms = doc_id % 9000 + 1000
    header = _el(0x1A45DFA3, _el(0x4282, b"webm"))
    info = (_uint_el(0x2AD7B1, 1_000_000)
            + _el(0x4489, struct.pack(">d", float(dur_ms))))
    video = _uint_el(0xB0, w) + _uint_el(0xBA, h)
    # TrackNumber + TrackUID are mandatory with no default (Matroska
    # spec; r12 review -- the parser ignores them, but conformance is
    # this module's contract)
    track = _el(0xAE, _uint_el(0xD7, 1)
                + _uint_el(0x73C5, doc_id % 100_000 + 1)
                + _uint_el(0x83, 1) + _el(0x86, b"V_VP9")
                + _el(0xE0, video))
    seg = _el(0x18538067, _el(0x1549A966, info)
              + _el(0x1654AE6B, track))
    return header + seg


# ---------------------------------------------------------------- FLAC

def flac_payload(doc_id: int) -> bytes:
    """fLaC magic + the mandatory STREAMINFO block: min/max block +
    frame sizes, then rate(20) | channels-1(3) | bps-1(5) | total(36)
    packed big-endian, then the 16-byte (here zero) MD5."""
    rate = 8000 + (doc_id % 5) * 8000
    # (doc_id // 4) parity, NOT doc_id % 2: the % 4 format routing makes
    # FLAC ids all even, so the old formula pinned channels to 1 and the
    # oracle row never exercised the stereo STREAMINFO packing (r13)
    channels = (doc_id // 4) % 2 + 1
    n_samples = (doc_id % 1000 + 1) * 100
    packed = (rate << 44) | ((channels - 1) << 41) | (15 << 36) | n_samples
    streaminfo = (struct.pack(">HH", 4096, 4096) + b"\x00\x00\x10" * 2
                  + packed.to_bytes(8, "big") + b"\x00" * 16)
    assert len(streaminfo) == 34
    return b"fLaC" + bytes([0x80]) + len(streaminfo).to_bytes(3, "big") \
        + streaminfo


# ----------------------------------------------------------------- MP3

_MP3_SR_TABLE = (44100, 48000, 32000)


def mp3_payload(doc_id: int) -> bytes:
    """One MPEG1 Layer III frame header (no CRC, bitrate index 9 =
    128 kbps) + zeroed side info + a Xing tag carrying the frame
    count, so the parser's duration is exact rather than the CBR
    estimate."""
    sr_idx = doc_id % 3
    # (doc_id // 4) parity: MP3 ids are all odd under the % 4 routing,
    # so doc_id % 2 pinned every payload mono and the stereo side-info
    # and Xing offsets were never oracle-checked (r13)
    mono = (doc_id // 4) % 2 == 1
    frames = doc_id % 200 + 1
    h1 = 0xFB                      # MPEG1, Layer III, no CRC
    h2 = (9 << 4) | (sr_idx << 2)  # 128 kbps, sample-rate index
    h3 = 0xC0 if mono else 0x00    # channel mode
    side = 17 if mono else 32
    frame = bytearray(bytes([0xFF, h1, h2, h3]) + b"\x00" * side
                      + b"Xing" + struct.pack(">II", 0x1, frames))
    # pad the Xing frame to its header-declared length (ISO 11172-3:
    # 144 * bitrate / sample_rate at padding 0; r12 review -- a reader
    # stepping frame-by-frame must not hit EOF mid-frame)
    frame_len = 144 * 128_000 // _MP3_SR_TABLE[sr_idx]
    frame += b"\x00" * (frame_len - len(frame))
    return bytes(frame)


def _attach(docs: DataFrame, builder) -> DataFrame:
    """The ONE synth-map spelling (r13 review: the two attach functions
    were verbatim copies differing only in the per-id builder): NaN
    doc_ids dropped, negative ids refused -- Python's % is always
    nonnegative while SQL's is sign-preserving, so a negative id would
    route builders, oracle branches, and plan filters three different
    ways and fail the hash check with no visible cause (r12 review)."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = [int(i) for i in pdf["doc_id"] if not pd.isna(i)]
            if any(i < 0 for i in ids):
                raise ValueError("negative doc_id in media synthesis")
            yield pd.DataFrame({
                "doc_id": ids,
                "payload": [builder(i) for i in ids],
            })

    return docs.select("doc_id").mapInPandas(
        synth, "doc_id BIGINT, payload BINARY")


def attach_media_payload(docs: DataFrame) -> DataFrame:
    """(doc_id, payload BINARY): synthesize one container payload per
    document, format chosen by doc_id % 4 per the module formulas. A
    narrow Arrow-batched map — the same shape as attach_payload, with
    real container bytes instead of text stand-ins."""
    builders = (mp4_payload, webm_payload, flac_payload, mp3_payload)
    return _attach(docs, lambda i: builders[i % 4](i))


# ------------------------------------------------------ BMP (real pixels)

def bmp_payload(doc_id: int) -> bytes:
    """Uncompressed 24-bit BI_RGB BMP (14-byte file header +
    BITMAPINFOHEADER + bottom-up BGR rows padded to 4 bytes), width =
    doc_id % 100 + 1, height = doc_id % 64 + 1 — unlike the container
    formats above, decoding this payload parses REAL pixel data, so the
    oracle row exercises the full decode, not just header walks."""
    w = doc_id % 100 + 1
    h = doc_id % 64 + 1
    stride = (w * 3 + 3) & ~3
    row = (bytes([doc_id % 256, (doc_id * 7) % 256, (doc_id * 13) % 256])
           * w + b"\x00" * stride)[:stride]
    pixels = row * h
    header = (b"BM" + struct.pack("<IHHI", 54 + len(pixels), 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                            len(pixels), 2835, 2835, 0, 0))
    return header + pixels


# ------------------------------------------------- WAV (real samples)

def wav_payload(doc_id: int) -> bytes:
    """PCM 16-bit mono WAV of a full-rate square wave with amplitude
    A = 4096 << (doc_id % 3): every |sample| equals A, so the decoded
    rms is EXACTLY A/32768 (sqrt of a constant is exact in IEEE double
    for these dyadic rationals) and every adjacent pair flips sign, so
    zcr is exactly 1 — both integer-recomputable by the oracle, making
    this the one payload family whose DSP output (not just header
    metadata) is hash-checked cross-engine."""
    rate = (8000, 16000, 44100)[doc_id % 3]
    n = (doc_id % 500 + 2) * 10
    amp = 4096 << (doc_id % 3)
    frame = struct.pack("<hh", amp, -amp)
    data = (frame * ((n + 1) // 2))[: 2 * n]
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    # RIFF chunk size = bytes AFTER the 8-byte header, i.e. len(body)
    # exactly; the old +4 declared 4 bytes past EOF and every strict
    # RIFF reader saw a truncated file (r13 review -- decode_wav never
    # reads payload[4:8], so the hash gate could not catch it)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def attach_image_audio_payload(docs: DataFrame) -> DataFrame:
    """(doc_id, payload BINARY): REAL-decode payloads — BMP for even
    doc_ids, WAV for odd — per the module formulas; same narrow
    Arrow-batched map shape as attach_media_payload."""
    return _attach(
        docs, lambda i: bmp_payload(i) if i % 2 == 0 else wav_payload(i))


# --------------------------------------- PNG / APNG (r15 oracle tier)
#
# r14 made APNG compositing, PNG tRNS color-keys, and hierarchical JPEG
# real decodes, but only pytest-golden; these builders push them into
# the Spark-vs-DuckDB hash discipline (r14 verdict task #2). Formulas
# (shared with the oracle SQL in plans/multimodal.py):
#
# - APNG:  W = doc_id % 24 + 8, H = doc_id % 16 + 8,
#          n_frames = doc_id % 4 + 2; frame k is a SOLID full-canvas
#          color (r,g,b) = ((id*3 + 7k) % 256, (id*5 + 11k) % 256,
#          (id*7 + 13k) % 256), dispose NONE, blend SOURCE on even
#          frames / OVER on odd (fully opaque RGB, so OVER composites
#          to the identical result through the real Porter-Duff path)
#          -> composited frame k's channel MEANS are exactly (r,g,b).
# - tRNS:  RGB8 PNG, W = doc_id % 16 + 4, H = doc_id % 12 + 4; the
#          left floor(W/2) columns carry the tRNS KEY color
#          ((id*3) % 256, (id*5) % 256, (id*7) % 256) -> alpha 0, the
#          rest carry key + (1,2,3) per channel (mod 256, never equal
#          to the key) -> alpha 255.
# - hier JPEG: grayscale LOSSLESS two-level pyramid (DHP + SOF3 base
#          at half resolution + EXP(1,1) + SOF7 differential full-res
#          correction -- bit-exact by T.81 Annex J construction);
#          W = 2*(doc_id % 8 + 2), H = 2*(doc_id % 6 + 2), pixel
#          value px[y][x] = (doc_id % 100) + y + 2x (max 146 < 256,
#          no mod wrap, so the pixel SUM is closed-form integer
#          arithmetic: H*W*(id%100) + W*H*(H-1)/2 + H*W*(W-1)).

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def apng_frame_color(doc_id: int, k: int) -> tuple[int, int, int]:
    """Solid color of animation frame k — THE formula the oracle
    mirrors (one spelling, imported by tests)."""
    return ((doc_id * 3 + 7 * k) % 256, (doc_id * 5 + 11 * k) % 256,
            (doc_id * 7 + 13 * k) % 256)


def apng_payload(doc_id: int) -> bytes:
    """Animated PNG per the module formulas: IHDR (RGB8) + acTL +
    fcTL/IDAT for frame 0 (the first frame is part of the animation)
    + (fcTL, fdAT) pairs, sequence numbers consumed in spec order."""
    w = doc_id % 24 + 8
    h = doc_id % 16 + 8
    n = doc_id % 4 + 2

    def raster(k: int) -> bytes:
        row = b"\x00" + bytes(apng_frame_color(doc_id, k)) * w
        return zlib.compress(row * h)

    def fctl(seq: int, k: int) -> bytes:
        # dispose NONE (0); blend SOURCE (0) on even k, OVER (1) on odd
        return _png_chunk(b"fcTL", struct.pack(
            ">IIIIIHHBB", seq, w, h, 0, 0, 1, 10, 0, k % 2))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    out = bytearray(_PNG_SIG + _png_chunk(b"IHDR", ihdr))
    out += _png_chunk(b"acTL", struct.pack(">II", n, 0))
    out += fctl(0, 0)
    out += _png_chunk(b"IDAT", raster(0))
    seq = 1
    for k in range(1, n):
        out += fctl(seq, k)
        seq += 1
        out += _png_chunk(b"fdAT", struct.pack(">I", seq) + raster(k))
        seq += 1
    out += _png_chunk(b"IEND", b"")
    return bytes(out)


def trns_png_payload(doc_id: int) -> bytes:
    """Static RGB8 PNG with a tRNS COLOR-KEY: left half key-colored
    (decodes to alpha 0), right half key+(1,2,3) (alpha 255)."""
    w = doc_id % 16 + 4
    h = doc_id % 12 + 4
    kr, kg, kb = (doc_id * 3) % 256, (doc_id * 5) % 256, (doc_id * 7) % 256
    other = bytes(((kr + 1) % 256, (kg + 2) % 256, (kb + 3) % 256))
    wl = w // 2
    row = b"\x00" + bytes((kr, kg, kb)) * wl + other * (w - wl)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"tRNS", struct.pack(">HHH", kr, kg, kb))
            + _png_chunk(b"IDAT", zlib.compress(row * h))
            + _png_chunk(b"IEND", b""))


# ------------------------------- hierarchical lossless JPEG (Annex J)

class _JBits:
    """MSB-first bit accumulator with T.81 0xFF byte stuffing and
    1-padding on flush (B.1.1.5)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def done(self) -> bytes:
        while self.n:
            self.put(1, 1)
        return bytes(self.out)


def _jseg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _jlossless_scan(vals: np.ndarray, differential: bool) -> bytes:
    """Entropy bytes of one grayscale lossless scan: predictor 1 (Ra)
    with the H.1.2.1 first-row/first-column rules for non-differential
    frames, PRED = 0 for differential ones; SSSS categories coded with
    a uniform-length-5 canonical Huffman table (code == symbol)."""
    bw = _JBits()
    h, w = vals.shape
    for y in range(h):
        for x in range(w):
            if differential:
                pred = 0
            elif y == 0 and x == 0:
                pred = 128  # 1 << (P - 1), P = 8
            elif y == 0:
                pred = int(vals[y, x - 1])
            elif x == 0:
                pred = int(vals[y - 1, 0])
            else:
                pred = int(vals[y, x - 1])
            d = (int(vals[y, x]) - pred + 32768) % 65536 - 32768
            if d == -32768:
                bw.put(16, 5)  # SSSS 16: +32768, no extra bits (H.2)
                continue
            s = abs(d).bit_length()
            bw.put(s, 5)
            if s:
                bw.put(d if d >= 0 else d + (1 << s) - 1, s)
    return bw.done()


def _jexpand(p: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """The J.1.1.3 2x expansion filter, both axes: even taps copy,
    odd taps are the (a + b + 1) >> 1 neighbor average, last row/col
    replicates."""
    p = p.astype(np.int64)
    up = np.empty((2 * p.shape[0], p.shape[1]), np.int64)
    up[0::2] = p
    up[1:-1:2] = (p[:-1] + p[1:] + 1) // 2
    up[-1] = p[-1]
    p = up[:out_h]
    up = np.empty((p.shape[0], 2 * p.shape[1]), np.int64)
    up[:, 0::2] = p
    up[:, 1:-1:2] = (p[:, :-1] + p[:, 1:] + 1) // 2
    up[:, -1] = p[:, -1]
    return up[:, :out_w]


def hier_jpeg_payload(doc_id: int) -> bytes:
    """Two-level LOSSLESS hierarchical pyramid (bit-exact roundtrip by
    construction): DHP, SOF3 base at half resolution (predictor 1),
    EXP(1,1), SOF7 differential correction coding the mod-2^16 residue
    against this module's own spelling of the expansion filter."""
    w = 2 * (doc_id % 8 + 2)
    h = 2 * (doc_id % 6 + 2)
    yy = np.arange(h, dtype=np.int64).reshape(-1, 1)
    xx = np.arange(w, dtype=np.int64).reshape(1, -1)
    px = (doc_id % 100) + yy + 2 * xx  # max 146 < 256: no mod wrap
    base = px[::2, ::2]

    comp = bytes([1, 0x11, 0])

    def sof(marker: int, hh: int, ww: int) -> bytes:
        return _jseg(marker,
                     bytes([8]) + struct.pack(">HH", hh, ww)
                     + bytes([1]) + comp)

    def sos(ss: int) -> bytes:
        return _jseg(0xDA, bytes([1, 1, 0x00, ss, 0, 0]))

    counts = [0] * 16
    counts[4] = 17  # 17 SSSS symbols, all at code length 5
    out = bytearray(b"\xff\xd8")
    out += sof(0xDE, h, w)  # DHP: full-image dimensions
    out += _jseg(0xC4, bytes([0x00]) + bytes(counts) + bytes(range(17)))
    out += sof(0xC3, *base.shape)
    out += sos(1)  # Ss = predictor 1
    out += _jlossless_scan(base, differential=False)
    out += _jseg(0xDF, bytes([0x11]))  # EXP: expand both axes
    diff = (px - _jexpand(base, h, w)) & 0xFFFF
    out += sof(0xC7, h, w)
    out += sos(0)  # differential lossless: Ss = 0 (no prediction)
    out += _jlossless_scan(diff, differential=True)
    out += b"\xff\xd9"
    return bytes(out)


def attach_animation_payload(docs: DataFrame) -> DataFrame:
    """(doc_id, payload BINARY): one APNG animation per document."""
    return _attach(docs, apng_payload)


def attach_pixel_stats_payload(docs: DataFrame) -> DataFrame:
    """(doc_id, payload BINARY): BMP / hierarchical-lossless-JPEG /
    tRNS-color-key-PNG by doc_id % 3 — every payload's full pixel SUM
    is closed-form integer arithmetic over doc_id."""
    builders = (bmp_payload, hier_jpeg_payload, trns_png_payload)
    return _attach(docs, lambda i: builders[i % 3](i))


# --------------------------- PNG profile matrix (r15, oracle tier 2)
#
# The r15 pixel rows cover BMP / hierarchical-JPEG / tRNS; these
# builders push three more REAL decode paths through the hash
# discipline, each with content chosen so the POSITION-WEIGHTED sum
# (wsum_px) is oracle-recomputable — a permuted reassembly (the Adam7
# failure mode) cannot match it:
#
# - 16-BIT GRAY (color 0, depth 16): v(y, x) = (doc_id % 30000)
#   + 64*y + 16*x (max < 2^16, no wrap), W = doc_id % 12 + 4,
#   H = doc_id % 10 + 4.
# - PALETTE (color 3, depth 8, 4-entry PLTE): index(y, x) = x % 4,
#   entry k = ((3k + doc_id) % 256, (5k + doc_id) % 256,
#   (7k + doc_id) % 256); W = doc_id % 16 + 4, H = doc_id % 12 + 4.
# - ADAM7-INTERLACED RGB8: R = x % 256, G = y % 256,
#   B = doc_id % 256; W = doc_id % 20 + 5, H = doc_id % 14 + 5
#   (odd-ish dims exercise empty/ragged passes). The weighted sum is
#   what verifies the seven-pass REASSEMBLY — the plain sum is
#   interlace-invariant by construction.

_ADAM7 = (  # (x0, y0, dx, dy) per pass, PNG spec clause 8.2
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def gray16_png_payload(doc_id: int) -> bytes:
    """16-bit grayscale PNG, big-endian samples, filter 0."""
    w = doc_id % 12 + 4
    h = doc_id % 10 + 4
    base = doc_id % 30000
    rows = bytearray()
    for y in range(h):
        rows += b"\x00"
        for x in range(w):
            rows += struct.pack(">H", base + 64 * y + 16 * x)
    ihdr = struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(rows)))
            + _png_chunk(b"IEND", b""))


def palette_png_payload(doc_id: int) -> bytes:
    """Palette PNG (color 3, depth 8) with a 4-entry PLTE; pixel
    index = x % 4."""
    w = doc_id % 16 + 4
    h = doc_id % 12 + 4
    plte = b"".join(
        bytes(((3 * k + doc_id) % 256, (5 * k + doc_id) % 256,
               (7 * k + doc_id) % 256))
        for k in range(4)
    )
    row = b"\x00" + bytes(x % 4 for x in range(w))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"PLTE", plte)
            + _png_chunk(b"IDAT", zlib.compress(row * h))
            + _png_chunk(b"IEND", b""))


def adam7_png_payload(doc_id: int) -> bytes:
    """Adam7-interlaced RGB8 PNG: the seven pass sub-images emitted in
    spec order, each scanline filter 0 — position-dependent content so
    a mis-reassembled pass flips wsum_px."""
    w = doc_id % 20 + 5
    h = doc_id % 14 + 5
    b_val = doc_id % 256
    out = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue  # empty pass emits nothing (PNG spec 8.2)
        for yy in range(ph):
            y = y0 + yy * dy
            out += b"\x00"
            for xx in range(pw):
                x = x0 + xx * dx
                out += bytes((x % 256, y % 256, b_val))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)  # interlace 1
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(out)))
            + _png_chunk(b"IEND", b""))


def attach_png_profile_payload(docs: DataFrame) -> DataFrame:
    """(doc_id, payload BINARY): 16-bit gray / palette / Adam7 RGB by
    doc_id % 3 — the PNG profile matrix under the weighted-sum oracle."""
    builders = (gray16_png_payload, palette_png_payload, adam7_png_payload)
    return _attach(docs, lambda i: builders[i % 3](i))


# ------------------------------------------------ GIF (r15, real LZW)
#
# The last real-decode image format without an oracle-checked pixel
# row: a spec-written GIF89a encoder (variable-width LSB-first LZW per
# the GIF spec appendix) so the repo's LZW DECODER output flows through
# the weighted-sum hash discipline. Content: 4-color global table,
# entry k = ((3k + doc_id) % 256, (5k + doc_id) % 256,
# (7k + doc_id) % 256) (the palette-PNG formula), pixel index
# (x + y) % 4 — 2-D position-dependent so wsum_px pins placement.
# W = doc_id % 18 + 4, H = doc_id % 12 + 4.

def _gif_lzw(indices: list[int], min_code_size: int) -> bytes:
    """GIF variable-width LZW: codes packed LSB-first; CLEAR emitted
    first; width grows when the next code to assign would not fit
    (after assigning code 2^width - 1); 12-bit cap with a CLEAR +
    dictionary reset (tiny images never hit it, but the spec path is
    implemented, not assumed)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh() -> tuple[dict, int, int]:
        return ({(i,): i for i in range(clear)}, eoi + 1,
                min_code_size + 1)

    table, next_code, width = fresh()
    emit(clear, width)
    buf: tuple = ()
    for c in indices:
        nxt = buf + (int(c),)
        if nxt in table:
            buf = nxt
            continue
        emit(table[buf], width)
        if next_code < 4096:
            table[nxt] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            emit(clear, width)
            table, next_code, width = fresh()
        buf = (int(c),)
    if buf:
        emit(table[buf], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def gif_payload(doc_id: int) -> bytes:
    """Single-image GIF89a: LSD with a 4-entry global color table,
    image descriptor, min-code-size 2 LZW data in <=255-byte
    sub-blocks, trailer."""
    w = doc_id % 18 + 4
    h = doc_id % 12 + 4
    gct = b"".join(
        bytes(((3 * k + doc_id) % 256, (5 * k + doc_id) % 256,
               (7 * k + doc_id) % 256))
        for k in range(4)
    )
    indices = [(x + y) % 4 for y in range(h) for x in range(w)]
    lzw = _gif_lzw(indices, 2)
    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        blocks += bytes([len(chunk)]) + chunk
    blocks += b"\x00"
    return (b"GIF89a"
            + struct.pack("<HH", w, h) + bytes([0x81, 0, 0]) + gct
            + b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
            + bytes([2]) + bytes(blocks)
            + b"\x3b")


def attach_gif_payload(docs: DataFrame) -> DataFrame:
    """(doc_id, payload BINARY): one real-LZW GIF per document."""
    return _attach(docs, gif_payload)


def gif_anim_frame_color(doc_id: int, k: int) -> tuple[int, int, int]:
    """Solid color of GIF animation frame k (the oracle mirrors it)."""
    return ((doc_id * 3 + 11 * k) % 256, (doc_id * 5 + 13 * k) % 256,
            (doc_id * 7 + 17 * k) % 256)


def gif_anim_payload(doc_id: int) -> bytes:
    """Animated GIF89a: n = doc_id % 3 + 2 full-canvas frames, each a
    solid color via a 2-entry LOCAL color table (both entries the
    frame color; indices all 0), GCE disposal=1 (leave in place) —
    composited frame k is exactly frame k's color. W = doc_id % 16 + 6,
    H = doc_id % 10 + 6."""
    w = doc_id % 16 + 6
    h = doc_id % 10 + 6
    n = doc_id % 3 + 2
    out = bytearray(b"GIF89a" + struct.pack("<HH", w, h)
                    + bytes([0x00, 0, 0]))  # no global color table
    for k in range(n):
        color = bytes(gif_anim_frame_color(doc_id, k))
        # GCE: intro + label + size-4 data (packed disposal=1, delay,
        # transparent idx) + the 0x00 sub-block terminator
        out += bytes([0x21, 0xF9, 4, 0x04, 10, 0, 0, 0x00])
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
        out += bytes([0x80])  # local color table flag, size field 0 (2)
        out += color + color  # both entries the frame color
        out += bytes([2])     # LZW minimum code size (spec floor)
        lzw = _gif_lzw([0] * (w * h), 2)
        for i in range(0, len(lzw), 255):
            out += bytes([len(lzw[i:i + 255])]) + lzw[i:i + 255]
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def attach_gif_anim_payload(docs: DataFrame) -> DataFrame:
    """(doc_id, payload BINARY): one animated GIF per document."""
    return _attach(docs, gif_anim_payload)


# --------------------------- WebP / VP8L (r17, the last oracle gap)
#
# r16 verdict #4: WebP was the one decoder family verified only by
# pytest goldens (bit-exact vs libwebp) because "an encoder would be a
# codec in itself" -- true for lossy VP8, NOT for lossless VP8L. This
# encoder writes a spec-conformant VP8L still (RFC 9649 / the WebP
# lossless bitstream spec): no transforms, no color cache, no meta
# prefix image, no backward references -- every pixel is a prefix-coded
# ARGB literal. It is NOT the trivial spelling though: green/red/blue
# use FULL (non-simple) prefix codes, so decoding exercises the
# code-length code (zero-run symbols 17/18, literal lengths, canonical
# reconstruction) and real multi-bit canonical walks; alpha and
# distance use the simple-code form, so both header paths run in one
# stream. Written independently of operators/webp.py from the spec
# (the _gif_lzw precedent): the encoder knows the BIT LAYOUT, the
# decoder its own tables, and the pixel formulas below are what the
# DuckDB oracle recomputes.
#
# Content (closed-form, oracle-recomputable): W = doc_id % 20 + 4,
# H = doc_id % 14 + 4; per pixel (x, y):
#   g = (doc_id      % 240) + ((x + y)     % 16)
#   r = (doc_id * 7  % 240) + ((2*x + y)   % 16)
#   b = (doc_id * 13 % 240) + ((x + 3*y)   % 16)
#   a = 255
# Each channel uses exactly the 16 contiguous values base..base+15, so
# its full prefix code is the complete 16-symbol/4-bit canonical code;
# the 2-D position-dependence makes the POSITION-WEIGHTED sum pin pixel
# placement, the wsum_px discipline.

#: (code, nbits) -> bit-reversed code, shared across writers: a pure
#: bit-arithmetic memo (codes are <= 15 bits, so the table is tiny)
_REV_CODES: dict[tuple[int, int], int] = {}


class _LBits:
    """LSB-first bit writer -- the exact inverse of webp._Bits."""

    __slots__ = ("acc", "n", "out")

    def __init__(self) -> None:
        self.acc = 0
        self.n = 0
        self.out = bytearray()

    def put(self, value: int, nbits: int) -> None:
        self.acc |= (value & ((1 << nbits) - 1)) << self.n
        self.n += nbits
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def put_code(self, code: int, nbits: int) -> None:
        """A canonical PREFIX code: DEFLATE bit order, the MSB of the
        code is the first bit on the wire. One put() of the bit-reversed
        code (r17: the bit-at-a-time loop was the synth hot spot;
        LSB-first packing of the reversal writes the identical bit
        sequence), with the reversal memoized — codes repeat heavily."""
        key = (code, nbits)
        r = _REV_CODES.get(key)
        if r is None:
            r = 0
            for i in range(nbits):
                r |= ((code >> i) & 1) << (nbits - 1 - i)
            _REV_CODES[key] = r
        self.put(r, nbits)

    def done(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc, self.n = 0, 0
        return bytes(self.out)


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, nbits), the canonical assignment webp._Prefix
    reconstructs: codes count up within a length, lengths ordered by
    ascending symbol."""
    max_len = max(lengths.values())
    bl_count = [0] * (max_len + 1)
    for ln in lengths.values():
        bl_count[ln] += 1
    code = 0
    next_code = [0] * (max_len + 1)
    for ln in range(1, max_len + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    out = {}
    for sym in sorted(lengths):
        ln = lengths[sym]
        out[sym] = (next_code[ln], ln)
        next_code[ln] += 1
    return out


#: code-length-code lengths the full codes below ship: literal "4"
#: every pixel-value symbol, "0" for short zero gaps, 17/18 for zero
#: runs. Kraft-complete: 1/2 + 1/4 + 1/8 + 1/8 = 1.
_VP8L_CL_LENGTHS = {4: 1, 0: 2, 17: 3, 18: 3}
_VP8L_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12,
                  13, 14, 15)


def _write_full_code(bw: _LBits, base: int, alphabet_size: int) -> None:
    """A full (non-simple) prefix code over exactly the 16 contiguous
    symbols base..base+15, each at length 4 (complete: 16 * 2^-4 = 1):
    code-length-code header, then the length stream as zero runs +
    sixteen literal '4's."""
    cl = _canonical_codes(_VP8L_CL_LENGTHS)
    bw.put(0, 1)  # not a simple code
    # cl lengths ride in _VP8L_CL_ORDER; symbols 17,18,0,...,4 need the
    # first 7 slots
    bw.put(7 - 4, 4)
    for sym in _VP8L_CL_ORDER[:7]:
        bw.put(_VP8L_CL_LENGTHS.get(sym, 0), 3)
    bw.put(0, 1)  # no max_symbol early stop: runs cover the tail

    def zeros(n: int) -> None:
        # 18 = zero-run 11..138 (7 extra bits), 17 = zero-run 3..10
        # (THREE extra bits -- the first encoder draft wrote 2 and its
        # replica trace faithfully reproduced the same bug; the
        # decoder's spec-correct br.read(3) caught it)
        while n > 0:
            if n >= 11:
                r = min(n, 138)
                bw.put_code(*cl[18])
                bw.put(r - 11, 7)
            elif n >= 3:
                r = min(n, 10)
                bw.put_code(*cl[17])
                bw.put(r - 3, 3)
            else:
                r = 1
                bw.put_code(*cl[0])
            n -= r

    zeros(base)
    for _ in range(16):
        bw.put_code(*cl[4])
    zeros(alphabet_size - base - 16)


def _write_simple_code(bw: _LBits, symbol: int) -> None:
    """The 1-symbol simple-code form (0 bits per decoded symbol)."""
    bw.put(1, 1)  # simple
    bw.put(0, 1)  # num_symbols - 1 = 0
    if symbol > 1:
        bw.put(1, 1)  # 8-bit first symbol
        bw.put(symbol, 8)
    else:
        bw.put(0, 1)  # 1-bit first symbol
        bw.put(symbol, 1)


def webp_channel_bases(doc_id: int) -> tuple[int, int, int]:
    """(gbase, rbase, bbase) — THE formula the oracle mirrors."""
    return (doc_id % 240, (doc_id * 7) % 240, (doc_id * 13) % 240)


def vp8l_webp_payload(doc_id: int) -> bytes:
    """Lossless-WebP still per the module formulas: RIFF/WEBP container
    around one VP8L chunk of prefix-coded ARGB literals."""
    w = doc_id % 20 + 4
    h = doc_id % 14 + 4
    gbase, rbase, bbase = webp_channel_bases(doc_id)
    bw = _LBits()
    bw.put(w - 1, 14)
    bw.put(h - 1, 14)
    bw.put(0, 1)  # alpha_is_used hint (informational)
    bw.put(0, 3)  # version
    bw.put(0, 1)  # no transforms
    bw.put(0, 1)  # no color cache
    bw.put(0, 1)  # no meta prefix image
    # green's alphabet carries the literals + 24 length prefixes (+ no
    # cache): 280 symbols; red/blue/alpha are plain 256-symbol bytes
    _write_full_code(bw, gbase, 256 + 24)
    _write_full_code(bw, rbase, 256)
    _write_full_code(bw, bbase, 256)
    _write_simple_code(bw, 255)  # alpha: constant, 0 bits/pixel
    _write_simple_code(bw, 0)    # distance: never read (no back-refs)
    gcode = _canonical_codes({gbase + j: 4 for j in range(16)})
    rcode = _canonical_codes({rbase + j: 4 for j in range(16)})
    bcode = _canonical_codes({bbase + j: 4 for j in range(16)})
    # one 12-bit word per pixel (r18): every channel code here is
    # exactly 4 bits, so the three put_code calls per pixel (each a
    # memo lookup + a method call — the measured synth hot spot after
    # the r17 one-put fix) collapse into ONE inline LSB-first pack of
    # (g | r << 4 | b << 8) with writer state in locals. Identical bit
    # placement and byte flush order to sequential put_code calls
    # (g's 4 bits land at n, r's at n+4, b's at n+8); alpha stays the
    # zero-bit single-symbol code.
    def _rev4(code: int) -> int:
        return ((code & 1) << 3) | ((code & 2) << 1) \
            | ((code & 4) >> 1) | ((code & 8) >> 3)

    gr = [_rev4(gcode[gbase + j][0]) for j in range(16)]
    rr = [_rev4(rcode[rbase + j][0]) for j in range(16)]
    br_ = [_rev4(bcode[bbase + j][0]) for j in range(16)]
    acc, n, out = bw.acc, bw.n, bw.out
    for y in range(h):
        for x in range(w):
            acc |= (gr[(x + y) % 16]
                    | rr[(2 * x + y) % 16] << 4
                    | br_[(x + 3 * y) % 16] << 8) << n
            n += 12
            while n >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                n -= 8
    bw.acc, bw.n = acc, n
    data = b"\x2f" + bw.done()
    chunk = b"VP8L" + struct.pack("<I", len(data)) + data
    if len(data) % 2:
        chunk += b"\x00"  # RIFF even-byte padding
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def attach_webp_payload(docs: DataFrame) -> DataFrame:
    """(doc_id, payload BINARY): one lossless-WebP still per document."""
    return _attach(docs, vp8l_webp_payload)
