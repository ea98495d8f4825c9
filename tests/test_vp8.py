"""VP8 key-frame decoder tests (operators/vp8.py).

Three independent verification layers:

1. **Golden payloads**: small lossy-WebP files (produced once by the
   reference libwebp encoder) embedded below with pinned SHA-256 plane
   hashes -- runs everywhere, no external library needed.
2. **Handcrafted bitstreams**: a minimal spec-faithful bool ENCODER
   (below) writes frames with chosen modes/coefficients; the decoder
   must reproduce the intended prediction exactly. This layer needs no
   oracle at all and pins each intra predictor and the context rules in
   isolation (it is how the (LD,RD,VR) context-index permutation was
   found).
3. **Bit-exact differential vs libwebp** (gated on the shared library
   being present): random images -> system libwebp encoder -> both
   decoders -> Y/U/V planes must match bit-for-bit. A single wrong
   table byte, filter clamp, or context index desyncs the arithmetic
   decoder, so this certifies the full table set and pipeline.
"""

from __future__ import annotations

import base64
import ctypes
import ctypes.util
import hashlib
import struct

import numpy as np
import pytest

from aws_cloudfront_realtime_monitoring_spark.operators import vp8 as m
from aws_cloudfront_realtime_monitoring_spark.operators.webp import decode_webp

# --------------------------------------------------------------------------
# golden payloads (libwebp-encoded; hashes = sha256(plane.tobytes())[:16])

GOLDEN_GRADIENT = (  # gradient 24x20 q50
    "UklGRnoAAABXRUJQVlA4IG4AAAAwBACdASoYABQAPrVInUuypCKht+gCUBaJaACdMoRwAD5+"
    "51PuNrXvl3wA/veXb3vksA62YFvYqTkAnLtCyfLyv3QOY8zwzeZ4sNdsDH7H1DZfj/XYQZsM"
    "pJmSYs03c+voC2c4LlriW5K2j5kAAA=="
)
GOLDEN_GRADIENT_HASHES = ("9d77e15572eb8e18", "9fae8ab7687d50f6", "03e9624f03d81b42")
GOLDEN_NOISE = (  # noise 16x16 q80
    "UklGRiIBAABXRUJQVlA4IBYBAACwBQCdASoQABAAAUAmJbACdDiAN4A/a/9gCmSfQBzBPGX+"
    "39wD+OfzT/O8Ap+lZXA5HkYdXAAA+xuFrt8ebuFc6Tw5m+Xb6uQkbNKjhrNsaVF54RBz89Qu"
    "9ISznsZsZ22KrDLkNhd3necJf+1u/6nJ1aR3elEYMrhr9Hr/z2XC8Ox7aVz+d/VzlZrZ966X"
    "oxeQCjwBDPNbu+15D369f9jzaJjN6Z6039Sm7yIk7+fKrmeiE/iJxPEkfumDHDazk8Vjcd/s"
    "wR0pgD2/FRay8MvP/neP+MIoftuZHVx1i3ycLJbexv8M/arLDnQ9/TMcl38HJt1yLOix3vSK"
    "wQ9ntOfKiuLmrxI7lftmam51/P/HKz/X5mAAAA=="
)
GOLDEN_NOISE_HASHES = ("614ed704dbe3f56a", "500dc969b5cd1d26", "4a596f3435030376")
GOLDEN_BLOCKS = (  # blocks 33x17 q40 (odd dims: crop + edge MBs)
    "UklGRngAAABXRUJQVlA4IGwAAABwBACdASohABEAPs1WoE2npSMiOrzIAPAZiWgAnTKEeL+0"
    "8MxX4EB2xgyfYAD+3Q0H0k//zHTgFMxFsgSQw/yr9I3/9v8uaY4iHrTMdH0FqF1CFro4eEO1"
    "xbjFuqfemoaagra/O9mV/X8YAAA="
)
GOLDEN_BLOCKS_HASHES = ("8e924c9bf27c1a45", "3b8fa2de154f53f2", "c4173dbdaf31598f")


def _vp8_chunk(payload: bytes) -> bytes:
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WEBP"
    pos = 12
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        if tag == b"VP8 ":
            return payload[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    raise AssertionError("no VP8 chunk")


@pytest.mark.parametrize(
    "b64,hashes,dims",
    [
        (GOLDEN_GRADIENT, GOLDEN_GRADIENT_HASHES, (24, 20)),
        (GOLDEN_NOISE, GOLDEN_NOISE_HASHES, (16, 16)),
        (GOLDEN_BLOCKS, GOLDEN_BLOCKS_HASHES, (33, 17)),
    ],
)
def test_golden_payloads_decode_to_pinned_planes(b64, hashes, dims):
    body = _vp8_chunk(base64.b64decode(b64))
    w, h, y, u, v = m.decode_vp8_yuv(body)
    assert (w, h) == dims
    assert y.shape == (h, w)
    assert u.shape == ((h + 1) // 2, (w + 1) // 2)
    got = tuple(
        hashlib.sha256(p.tobytes()).hexdigest()[:16] for p in (y, u, v)
    )
    assert got == hashes


def test_golden_through_container_yields_rgba():
    payload = base64.b64decode(GOLDEN_GRADIENT)
    w, h, n, rgba, codec = decode_webp(payload)
    assert (w, h, n, codec) == (24, 20, 1, "vp8")
    assert rgba is not None and rgba.shape == (20, 24, 4)
    assert (rgba[..., 3] == 255).all()


# --------------------------------------------------------------------------
# handcrafted bitstream writer (RFC 6386 section 8 boolean encoder)


class BoolEncoder:
    def __init__(self):
        self.low = 0
        self.range_ = 255
        self.count = -24
        self.buf = bytearray()

    def put(self, prob, bit):
        split = 1 + (((self.range_ - 1) * prob) >> 8)
        if bit:
            self.low += split
            self.range_ -= split
        else:
            self.range_ = split
        shift = 0
        r = self.range_
        while r < 128:
            r <<= 1
            shift += 1
        self.range_ = r
        count = self.count + shift
        lowvalue = self.low
        if count >= 0:
            offset = shift - count
            if offset >= 1 and ((lowvalue << (offset - 1)) & 0x80000000):
                x = len(self.buf) - 1
                while x >= 0 and self.buf[x] == 0xFF:
                    self.buf[x] = 0
                    x -= 1
                if x >= 0:
                    self.buf[x] += 1
            self.buf.append((lowvalue >> (24 - offset)) & 0xFF)
            lowvalue <<= offset
            shift = count
            lowvalue &= 0xFFFFFF
            count -= 8
        self.low = (lowvalue << shift) & 0xFFFFFFFF
        self.count = count

    def literal(self, n, v):
        for i in range(n - 1, -1, -1):
            self.put(128, (v >> i) & 1)

    def tree(self, tree, probs, leaf):
        path = None

        def walk(i, bits):
            nonlocal path
            for b in (0, 1):
                t = tree[i + b]
                if t <= 0:
                    if -t == leaf:
                        path = bits + [(i >> 1, b)]
                else:
                    walk(t, bits + [(i >> 1, b)])

        walk(0, [])
        assert path is not None
        for pi, b in path:
            self.put(probs[pi], b)

    def stop(self):
        for _ in range(32):
            self.put(128, 0)
        return bytes(self.buf)


def _bmode_probs(above, left):
    row = m.BMODE_CTX_IDX[above] * 10 + m.BMODE_CTX_IDX[left]
    return m.KF_BMODE_PROBS[row * 9 : row * 9 + 9]


def build_frame(mb_w, mb_h, bmodes_per_mb, y_dcs_per_mb=None, uvmode=0,
                qi=40, filter_level=0, filter_simple=False):
    """A valid single-partition key frame with default probabilities,
    B_PRED macroblocks with the given 4x4 modes, and optional DC-only
    Y residuals (raw token values in -4..4; None = all MBs skipped)."""
    e = BoolEncoder()
    e.literal(1, 0)  # color space
    e.literal(1, 0)  # clamping
    e.put(128, 0)  # segmentation off
    e.literal(1, 1 if filter_simple else 0)  # filter type
    e.literal(6, filter_level)
    e.literal(3, 0)  # sharpness
    e.put(128, 0)  # lf deltas off
    e.literal(2, 0)  # one token partition
    e.literal(7, qi)
    for _ in range(5):
        e.put(128, 0)  # no quantizer deltas
    e.put(128, 0)  # refresh entropy
    for i in range(1056):
        e.put(m.COEFF_UPDATE_PROBS[i], 0)  # keep default token probs
    e.put(128, 1)  # mb_no_coeff_skip on
    e.literal(8, 128)  # prob_skip
    above = [[0] * 4 for _ in range(mb_w)]
    for mb_y in range(mb_h):
        left = [0] * 4
        for mb_x in range(mb_w):
            bm = bmodes_per_mb[mb_y * mb_w + mb_x]
            e.put(128, 0 if y_dcs_per_mb else 1)  # skip flag
            e.tree(m.KF_YMODE_TREE, m.KF_YMODE_PROB, m.B_PRED)
            cur = []
            for sb in range(16):
                r, c = sb >> 2, sb & 3
                am = above[mb_x][c] if r == 0 else cur[sb - 4]
                lm = left[r] if c == 0 else cur[sb - 1]
                e.tree(m.BMODE_TREE, _bmode_probs(am, lm), bm[sb])
                cur.append(bm[sb])
            above[mb_x] = cur[12:16]
            left = [cur[3], cur[7], cur[11], cur[15]]
            e.tree(m.UV_MODE_TREE, m.KF_UV_MODE_PROB, uvmode)
    part1 = e.stop()

    if y_dcs_per_mb:
        te = BoolEncoder()
        probs = [
            [
                [
                    [m.COEFF_PROBS[((t * 8 + b) * 3 + c) * 11 + p]
                     for p in range(11)]
                    for c in range(3)
                ]
                for b in range(8)
            ]
            for t in range(4)
        ]

        def write_block(plane, ctx, dc):
            p = probs[plane][m.BANDS[0]][ctx]
            if dc == 0:
                te.put(p[0], 0)
                return 0
            te.put(p[0], 1)
            te.put(p[1], 1)
            v = abs(dc)
            if v == 1:
                te.put(p[2], 0)
                nctx = 1
            else:
                te.put(p[2], 1)
                te.put(p[3], 0)
                if v == 2:
                    te.put(p[4], 0)
                else:
                    te.put(p[4], 1)
                    te.put(p[5], 1 if v == 4 else 0)
                nctx = 2
            te.put(128, 1 if dc < 0 else 0)
            te.put(probs[plane][m.BANDS[1]][nctx][0], 0)  # EOB at coeff 1
            return 1

        a_y = [[0] * 4 for _ in range(mb_w)]
        a_u = [[0] * 2 for _ in range(mb_w)]
        a_v = [[0] * 2 for _ in range(mb_w)]
        for mb_y in range(mb_h):
            l_y = [0] * 4
            l_u = [0] * 2
            l_v = [0] * 2
            for mb_x in range(mb_w):
                dcs = y_dcs_per_mb[mb_y * mb_w + mb_x]
                for sb in range(16):
                    r, c = sb >> 2, sb & 3
                    nz = write_block(3, l_y[r] + a_y[mb_x][c], dcs[sb])
                    l_y[r] = a_y[mb_x][c] = nz
                for lu, au in ((l_u, a_u[mb_x]), (l_v, a_v[mb_x])):
                    for sb in range(4):
                        r, c = sb >> 1, sb & 1
                        nz = write_block(2, lu[r] + au[c], 0)
                        lu[r] = au[c] = nz
        part2 = te.stop() + b"\x00" * 4
    else:
        part2 = b"\x00" * 8

    width, height = mb_w * 16, mb_h * 16
    # version 1 = bilinear + SIMPLE loop filter per RFC 6386 9.1's table,
    # keeping the fixture self-consistent with the simple-filter bit
    version = 1 if filter_simple else 3
    tag = (version << 1) | (1 << 4) | (len(part1) << 5)
    body = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
    body += b"\x9d\x01\x2a" + struct.pack("<HH", width, height)
    return body + part1 + part2


def _expected_prediction(bmodes_grid, mb_w, mb_h):
    """Reference-build the pure prediction (no residuals) with the
    decoder's own predictor functions over spec borders."""
    P = np.empty((mb_h * 16 + 1, mb_w * 16 + 5), dtype=np.uint8)
    P[:, 0] = 129
    P[0, :] = 127
    for mb_y in range(mb_h):
        for mb_x in range(mb_w):
            bm = bmodes_grid[mb_y * mb_w + mb_x]
            yy, yx = 1 + mb_y * 16, 1 + mb_x * 16
            if mb_x == mb_w - 1 and mb_y > 0:
                P[yy - 1, yx + 16 : yx + 20] = P[yy - 1, yx + 15]
            tr = P[yy - 1, yx + 16 : yx + 20].copy()
            for sb in range(16):
                r, c = sb >> 2, sb & 3
                by, bx = yy + 4 * r, yx + 4 * c
                ar = tr if c == 3 else P[by - 1, bx + 4 : bx + 8]
                m._pred_b(P, by, bx, bm[sb], ar)
    return P[1 : 1 + mb_h * 16, 1 : 1 + mb_w * 16]


@pytest.mark.parametrize("mode", range(10))
def test_handcrafted_flat_mode_frames(mode):
    """Every 4x4 intra predictor in isolation: a frame whose subblocks
    all use ``mode`` must decode to exactly the chained prediction."""
    bm = [mode] * 16
    body = build_frame(1, 1, [bm])
    w, h, y, u, v = m.decode_vp8_yuv(body)
    assert (w, h) == (16, 16)
    assert np.array_equal(y, _expected_prediction([bm], 1, 1))
    # chroma DC with no neighbors = flat 128
    assert (u == 128).all() and (v == 128).all()


def test_handcrafted_mixed_modes_multi_mb():
    grids = [
        [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 0, 1, 2, 3, 4, 5],
        [9, 8, 7, 6, 5, 4, 3, 2, 1, 0, 9, 8, 7, 6, 5, 4],
        [4, 4, 6, 6, 5, 5, 4, 6, 5, 4, 6, 5, 4, 5, 6, 4],
        [1] * 16,
        [3] * 8 + [7] * 8,
        [2, 9] * 8,
    ]
    body = build_frame(3, 2, grids)
    w, h, y, u, v = m.decode_vp8_yuv(body)
    assert (w, h) == (48, 32)
    assert np.array_equal(y, _expected_prediction(grids, 3, 2))


def test_handcrafted_dc_tokens_roundtrip():
    """DC-only residuals of every representable raw size land on the
    right subblocks with the right dequantized magnitudes. B_PRED
    chains predictions through the residual-APPLIED neighbors, so the
    expectation replays prediction + DC add block by block."""
    dcs = [3, -4, 2, -1, 0, 1, 0, -2, 4, 0, -3, 0, 1, -1, 2, -4]
    body = build_frame(1, 1, [[0] * 16], y_dcs_per_mb=[dcs], qi=100)
    w, h, y, u, v = m.decode_vp8_yuv(body)
    q = m.DC_QLOOKUP[100]
    P = np.empty((17, 21), dtype=np.uint8)
    P[:, 0] = 129
    P[0, :] = 127
    tr = P[0, 17:21].copy()
    for sb in range(16):
        r, c = sb >> 2, sb & 3
        by, bx = 1 + 4 * r, 1 + 4 * c
        ar = tr if c == 3 else P[by - 1, bx + 4 : bx + 8]
        m._pred_b(P, by, bx, m.B_DC, ar)
        delta = (dcs[sb] * q + 4) >> 3
        blk = P[by : by + 4, bx : bx + 4].astype(np.int32) + delta
        P[by : by + 4, bx : bx + 4] = np.clip(blk, 0, 255).astype(np.uint8)
    assert np.array_equal(y, P[1:17, 1:17])


def test_handcrafted_simple_filter_vs_independent_replica():
    """The simple in-loop filter path (h.filter_simple) was never
    exercised before r10 (r9 advice): build_frame hardcoded the normal-
    filter bit and libwebp's encoder default emits the normal filter, so
    the differential suite could not cover it. Decode the same DC-step
    frame with the filter off and with the SIMPLE filter at level 63,
    and require the filtered output to equal an independent test-local
    implementation of RFC 6386 section 15.1 applied to the unfiltered
    plane in the decoder's mandated edge order (per MB: vertical inner
    edges left-to-right, then horizontal top-to-bottom; Y plane only)."""
    dcs = [3, -4, 2, -1, 0, 1, 0, -2, 4, 0, -3, 0, 1, -1, 2, -4]
    kw = dict(y_dcs_per_mb=[dcs], qi=100)
    _, _, y0, u0, v0 = m.decode_vp8_yuv(build_frame(1, 1, [[0] * 16], **kw))
    _, _, y1, u1, v1 = m.decode_vp8_yuv(
        build_frame(1, 1, [[0] * 16], filter_level=63, filter_simple=True,
                    **kw)
    )
    # the simple filter touches ONLY luma (RFC 15: chroma unfiltered)
    assert np.array_equal(u0, u1) and np.array_equal(v0, v1)
    assert not np.array_equal(y0, y1), "level-63 filter must change pixels"

    level = 63
    i_limit = level  # sharpness 0
    sub_e = level * 2 + i_limit  # inner-edge limit; single MB: no MB edges

    def c8(v):
        return -128 if v < -128 else (127 if v > 127 else v)

    def line(p1, p0, q0, q1, edge_limit):
        """RFC 6386 15.1 simple_segment, written independently of the
        decoder's helpers; returns (new_p0, new_q0)."""
        if abs(p0 - q0) * 2 + abs(p1 - q1) // 2 > edge_limit:
            return p0, q0
        a = c8(c8(p1 - q1) + 3 * (q0 - p0))
        f = c8(a + 4) >> 3
        e = c8(a + 3) >> 3
        return c8(p0 + e), c8(q0 - f)

    ys = y0.astype(np.int32) - 128
    for x in (4, 8, 12):
        for r in range(16):
            p1, p0, q0, q1 = (int(ys[r, x - 2 + k]) for k in range(4))
            ys[r, x - 1], ys[r, x] = line(p1, p0, q0, q1, sub_e)
    for yy in (4, 8, 12):
        for col in range(16):
            p1, p0, q0, q1 = (int(ys[yy - 2 + k, col]) for k in range(4))
            ys[yy - 1, col], ys[yy, col] = line(p1, p0, q0, q1, sub_e)
    assert np.array_equal(y1, (ys + 128).astype(np.uint8))


# --------------------------------------------------------------------------
# malformed input contract


def test_rejects_interframe_and_bad_start_code():
    body = bytearray(build_frame(1, 1, [[0] * 16]))
    inter = bytes([body[0] | 1]) + bytes(body[1:])
    with pytest.raises(ValueError, match="key frame"):
        m.decode_vp8_yuv(inter)
    bad = bytes(body[:3]) + b"\x00\x01\x2a" + bytes(body[6:])
    with pytest.raises(ValueError, match="start code"):
        m.decode_vp8_yuv(bad)
    with pytest.raises(ValueError, match="truncated"):
        m.decode_vp8_yuv(bytes(body[:8]))


def test_rejects_oversized_dimensions():
    from aws_cloudfront_realtime_monitoring_spark.operators import SLOW_PATH_MAX_PIXELS

    body = bytearray(build_frame(1, 1, [[0] * 16]))
    side = int(SLOW_PATH_MAX_PIXELS**0.5) + 1
    struct.pack_into("<HH", body, 6, side, side)
    with pytest.raises(ValueError, match="decode cap"):
        m.decode_vp8_yuv(bytes(body))


def test_mutation_fuzz_valueerror_only():
    """Corrupted payloads must raise ValueError (or decode to garbage
    pixels), never crash with an internal exception or hang."""
    payload = base64.b64decode(GOLDEN_NOISE)
    body = _vp8_chunk(payload)
    rng = np.random.RandomState(7)
    for _ in range(120):
        buf = bytearray(body)
        for _k in range(rng.randint(1, 4)):
            buf[rng.randint(0, len(buf))] = rng.randint(0, 256)
        try:
            m.decode_vp8_pixels(bytes(buf))
        except ValueError:
            pass  # the only permitted failure mode
    for cut in (0, 5, 9, 11, 20, len(body) - 3):
        try:
            m.decode_vp8_pixels(body[:cut])
        except ValueError:
            pass


# --------------------------------------------------------------------------
# differential vs the system libwebp (gated)

_LIB = None


def _libwebp():
    global _LIB
    if _LIB is None:
        name = ctypes.util.find_library("webp")
        if not name:
            pytest.skip("libwebp shared library not present")
        lib = ctypes.CDLL(name)
        lib.WebPEncodeRGB.restype = ctypes.c_size_t
        lib.WebPEncodeRGB.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ]
        lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.WebPDecodeYUV.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.WebPFree.argtypes = [ctypes.c_void_p]
        _LIB = lib
    return _LIB


def _encode_rgb(lib, arr, quality):
    h, w, _ = arr.shape
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeRGB(arr.tobytes(), w, h, w * 3, quality,
                          ctypes.byref(out))
    assert n > 0
    payload = ctypes.string_at(out, n)
    lib.WebPFree(out)
    return payload


def _decode_yuv_ref(lib, payload):
    w = ctypes.c_int()
    h = ctypes.c_int()
    up = ctypes.POINTER(ctypes.c_uint8)()
    vp = ctypes.POINTER(ctypes.c_uint8)()
    stride = ctypes.c_int()
    uv_stride = ctypes.c_int()
    yp = lib.WebPDecodeYUV(payload, len(payload), ctypes.byref(w),
                           ctypes.byref(h), ctypes.byref(up),
                           ctypes.byref(vp), ctypes.byref(stride),
                           ctypes.byref(uv_stride))
    assert yp
    W, H, S, US = w.value, h.value, stride.value, uv_stride.value
    cw, ch = (W + 1) // 2, (H + 1) // 2
    y = np.ctypeslib.as_array(yp, shape=(H, S))[:, :W].copy()
    u = np.ctypeslib.as_array(up, shape=(ch, US))[:, :cw].copy()
    v = np.ctypeslib.as_array(vp, shape=(ch, US))[:, :cw].copy()
    lib.WebPFree(yp)
    return W, H, y, u, v


def _test_image(rng, w, h, kind):
    if kind == "noise":
        return rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
    if kind == "blocks":
        img = rng.randint(0, 256, ((h + 7) // 8, (w + 7) // 8, 3),
                          dtype=np.uint8)
        return np.repeat(np.repeat(img, 8, axis=0), 8, axis=1)[:h, :w]
    xs = np.arange(w)[None, :]
    ys = np.arange(h)[:, None]
    r = np.broadcast_to(((xs * 255) // max(w - 1, 1)).astype(np.uint8),
                        (h, w))
    g = np.broadcast_to(((ys * 255) // max(h - 1, 1)).astype(np.uint8),
                        (h, w))
    b = ((xs + ys) % 256).astype(np.uint8) * np.ones((h, 1), np.uint8)
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def test_bit_exact_vs_libwebp_across_sizes_and_qualities():
    lib = _libwebp()
    rng = np.random.RandomState(11)
    cases = [(kind, w, h, q)
             for kind in ("gradient", "noise", "blocks")
             for (w, h) in [(16, 16), (17, 16), (33, 29), (64, 48), (1, 1),
                            (7, 3), (50, 50)]
             for q in (10, 50, 90)]
    for kind, w, h, q in cases:
        img = _test_image(rng, w, h, kind)
        payload = _encode_rgb(lib, img, float(q))
        W, H, ry, ru, rv = _decode_yuv_ref(lib, payload)
        mw, mh, my, mu, mv = m.decode_vp8_yuv(_vp8_chunk(payload))
        assert (W, H) == (mw, mh) == (w, h), (kind, w, h, q)
        for name, ref, mine in (("Y", ry, my), ("U", ru, mu), ("V", rv, mv)):
            assert np.array_equal(ref, mine), (kind, w, h, q, name)
