"""Baseline-JPEG decoder tests: golden bytes from an INDEPENDENT encoder
written from ITU-T T.81 (forward DCT + canonical-Huffman entropy coding +
marker layout built here, not from the decoder under test)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from aws_cloudfront_realtime_monitoring_spark.operators.jpeg import (
    _IDCT_M,
    _ZIGZAG,
    decode_jpeg_pixels,
)

# encoder Huffman design: uniform-length canonical tables (valid per
# T.81, just inefficient). DC: 12 symbols at length 4; AC: the 162
# standard symbols at length 8 (codes 0..161, the all-ones code unused).
_AC_SYMBOLS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        while self.n:
            self.write(1, 1)  # pad with 1s
        return bytes(self.out)


def _dc_code(sym: int) -> tuple[int, int]:
    return sym, 4  # canonical code == symbol index at uniform length 4


def _ac_code(sym: int) -> tuple[int, int]:
    return _AC_SYMBOLS.index(sym), 8


def _magnitude(v: int) -> tuple[int, int]:
    """(size s, s-bit magnitude code) per T.81 F.1.2.1."""
    s = int(v != 0 and int(np.floor(np.log2(abs(v)))) + 1)
    if v < 0:
        v = v + (1 << s) - 1
    return s, v


def _fdct_quant(block: np.ndarray, q: np.ndarray) -> np.ndarray:
    coef = _IDCT_M.T @ block @ _IDCT_M
    return np.round(coef / q.reshape(8, 8)).astype(np.int32)


def _encode_blocks(bw, blocks, q, pred_holder):
    for block in blocks:
        # zz[i] = block position _ZIGZAG[i]: the scan-order coefficient list
        zz = _fdct_quant(block, q).reshape(64)[_ZIGZAG]
        diff = int(zz[0]) - pred_holder[0]
        pred_holder[0] = int(zz[0])
        s, mag = _magnitude(diff)
        code, n = _dc_code(s)
        bw.write(code, n)
        bw.write(mag, s)
        run = 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, n = _ac_code(0xF0)
                bw.write(code, n)
                run -= 16
            s, mag = _magnitude(v)
            code, n = _ac_code((run << 4) | s)
            bw.write(code, n)
            bw.write(mag, s)
            run = 0
        if run:
            code, n = _ac_code(0x00)
            bw.write(code, n)


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _dht(tc: int, th: int, lengths: list[int], symbols: list[int]) -> bytes:
    counts = [0] * 16
    for ln in lengths:
        counts[ln - 1] += 1
    return _seg(0xC4, bytes([tc << 4 | th] + counts + symbols))


def make_jpeg(pixels: np.ndarray, quant: int = 1, subsample: int = 1,
              restart: int = 0) -> bytes:
    """Encode an [h, w, 1|3] uint8 array as baseline JFIF. ``quant``:
    uniform quantization step; ``subsample`` 2 = 4:2:0 chroma;
    ``restart``: insert RSTn every N MCUs (0 = none)."""
    h, w, nc = pixels.shape
    q = np.full(64, quant, np.int32)
    px = pixels.astype(np.float64)
    if nc == 3:
        r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
        comps_full = [
            0.299 * r + 0.587 * g + 0.114 * b - 128.0,
            -0.168736 * r - 0.331264 * g + 0.5 * b,
            0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
        sampling = [(subsample, subsample), (1, 1), (1, 1)]
    else:
        comps_full = [px[:, :, 0] - 128.0]
        sampling = [(1, 1)]
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcus_x, mcus_y = -(-w // (8 * hmax)), -(-h // (8 * vmax))

    planes = []
    for plane, (hs, vs) in zip(comps_full, sampling):
        if (hs, vs) != (hmax, vmax):  # downsample chroma by box average
            fy, fx = vmax // vs, hmax // hs
            ph = -(-plane.shape[0] // fy) * fy
            pw = -(-plane.shape[1] // fx) * fx
            padded = np.pad(plane, ((0, ph - plane.shape[0]),
                                    (0, pw - plane.shape[1])), mode="edge")
            plane = padded.reshape(ph // fy, fy, pw // fx, fx).mean((1, 3))
        th, tw = mcus_y * vs * 8, mcus_x * hs * 8
        plane = np.pad(plane, ((0, th - plane.shape[0]),
                               (0, tw - plane.shape[1])), mode="edge")
        planes.append(plane)

    bw = _BitWriter()
    preds = [[0] for _ in planes]
    data = bytearray()
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and mcu_count and mcu_count % restart == 0:
                data += bw.flush()
                bw = _BitWriter()
                data += bytes([0xFF, 0xD0 + ((mcu_count // restart - 1) % 8)])
                preds = [[0] for _ in planes]
            for ci, (plane, (hs, vs)) in enumerate(zip(planes, sampling)):
                blocks = []
                for by in range(vs):
                    for bx in range(hs):
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        blocks.append(plane[y0 : y0 + 8, x0 : x0 + 8])
                _encode_blocks(bw, blocks, q, preds[ci])
            mcu_count += 1
    data += bw.flush()

    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0]) + bytes(q.astype(np.uint8)))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for ci, (hs, vs) in enumerate(sampling):
        out_q = 0
        sof += bytes([ci + 1, (hs << 4) | vs, out_q])
    out += _seg(0xC0, sof)
    out += _dht(0, 0, [4] * 12, list(range(12)))
    out += _dht(1, 0, [8] * len(_AC_SYMBOLS), list(_AC_SYMBOLS))
    if restart:
        out += _seg(0xDD, struct.pack(">H", restart))
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += data
    out += b"\xff\xd9"
    return bytes(out)


def test_jpeg_grayscale_near_lossless_roundtrip():
    """quant=1 grayscale: the only loss is integer rounding of DCT
    coefficients, bounded at a few gray levels per pixel."""
    rng = np.random.RandomState(31)
    px = rng.randint(96, 160, size=(24, 17, 1), dtype=np.uint8)
    w, h, got = decode_jpeg_pixels(make_jpeg(px))
    assert (w, h) == (17, 24)
    assert got.shape == (24, 17, 1)
    err = np.abs(got.astype(int) - px.astype(int))
    assert err.max() <= 4 and err.mean() <= 1.0


def test_jpeg_color_444_roundtrip():
    rng = np.random.RandomState(37)
    px = rng.randint(80, 176, size=(16, 16, 3), dtype=np.uint8)
    w, h, got = decode_jpeg_pixels(make_jpeg(px))
    assert (w, h, got.shape[2]) == (16, 16, 3)
    err = np.abs(got.astype(int) - px.astype(int))
    assert err.max() <= 6 and err.mean() <= 1.5  # + color-convert rounding


def test_jpeg_420_subsampled_smooth_image():
    """4:2:0: chroma is box-downsampled at encode and replicated at
    decode, so use a smooth gradient where that round trip is tight."""
    yy, xx = np.mgrid[0:32, 0:24]
    px = np.dstack([
        (96 + xx * 2).astype(np.uint8),
        (96 + yy).astype(np.uint8),
        (128 + (xx + yy) // 2).astype(np.uint8),
    ])
    w, h, got = decode_jpeg_pixels(make_jpeg(px, subsample=2))
    assert (w, h) == (24, 32)
    err = np.abs(got.astype(int) - px.astype(int))
    assert err.mean() <= 3.0 and err.max() <= 24  # chroma edges


def test_jpeg_restart_markers_and_quant():
    rng = np.random.RandomState(41)
    px = rng.randint(90, 166, size=(24, 40, 1), dtype=np.uint8)
    blob = make_jpeg(px, quant=2, restart=2)
    assert b"\xff\xd0" in blob or b"\xff\xd1" in blob  # RSTn really present
    w, h, got = decode_jpeg_pixels(blob)
    assert (w, h) == (40, 24)
    err = np.abs(got.astype(int) - px.astype(int))
    assert err.max() <= 8 and err.mean() <= 2.0


def test_jpeg_rejects_malformed_and_nonbaseline():
    px = np.full((8, 8, 1), 128, np.uint8)
    good = make_jpeg(px)
    with pytest.raises(ValueError):
        decode_jpeg_pixels(b"\xff\xd8\xff\xd9")          # no scan
    with pytest.raises(ValueError):
        decode_jpeg_pixels(good[:30])                     # truncated segment
    progressive = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError):
        decode_jpeg_pixels(progressive)                   # SOF2 declined
    with pytest.raises(ValueError):
        decode_jpeg_pixels(b"not a jpeg")


def test_jpeg_through_decode_image_and_mapinpandas(spark):
    """The multimodal contract carries real JPEG bytes end-to-end:
    metadata (fmt/width/height) comes from actual marker parsing."""
    from aws_cloudfront_realtime_monitoring_spark.operators.multimodal import (
        decode_batches,
        decode_image,
    )

    rng = np.random.RandomState(43)
    px = rng.randint(100, 156, size=(10, 14, 3), dtype=np.uint8)
    blob = make_jpeg(px)
    meta = decode_image(7, blob, strict=True)
    assert meta == {
        "doc_id": 7, "n_bytes": len(blob), "width": 14, "height": 10,
        "n_frames": 1, "fmt": "jpeg",
    }
    df = spark.createDataFrame(
        [(1, bytearray(blob))], "doc_id BIGINT, payload BINARY"
    )
    [row] = decode_batches(df).collect()
    assert (row.fmt, row.width, row.height) == ("jpeg", 14, 10)


def test_jpeg_grayscale_ignores_declared_sampling_factors():
    """T.81 A.2: a scan with ONE component is non-interleaved -- the MCU
    is a single 8x8 data unit and the grid is ceil(w/8) x ceil(h/8)
    regardless of the SOF sampling factors. Color-to-gray encoders
    commonly keep a 2x2 declaration; interleaved geometry would
    misdecode such files."""
    rng = np.random.RandomState(7)
    px = rng.randint(50, 200, size=(20, 13, 1), dtype=np.uint8)
    blob = bytearray(make_jpeg(px))
    i = blob.find(b"\xff\xc0")
    # SOF0: marker(2) len(2) prec(1) h(2) w(2) nc(1) [id samp tq]...
    assert blob[i + 9] == 1 and blob[i + 11] == 0x11
    blob[i + 11] = 0x22  # declare 2x2 sampling factors
    w, h, got = decode_jpeg_pixels(bytes(blob))
    w0, h0, ref = decode_jpeg_pixels(make_jpeg(px))
    assert (w, h) == (w0, h0) == (13, 20)
    np.testing.assert_array_equal(got, ref)
