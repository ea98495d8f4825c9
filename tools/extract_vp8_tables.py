"""Recover the RFC 6386 default VP8 probability/dequantization tables and
emit them as ``aws_cloudfront_realtime_monitoring_spark/operators/vp8_tables.py``.

The VP8 key-frame decoder (operators/vp8.py) needs five large constant
tables the spec defines as plain data (RFC 6386 sections 13.4/13.5 and
14.1): the default token probabilities (4x8x3x11), the token-probability
UPDATE probabilities (same shape), the key-frame B-mode probabilities
(10x10x9), and the DC/AC dequantization lookups (128 each). They are far
too large to type by hand without transcription errors, and this sandbox
has no network access to the RFC text -- but the system ``libwebp``
(a public-domain-adjacent BSD reference implementation of the same spec)
carries them verbatim in its read-only data. This tool locates each table
by an anchor row whose values ARE independently known from the spec
(e.g. the famous first token row {253,136,254,...} and the first B-mode
row {231,120,48,...}), walks the contiguous layout, and regenerates the
Python module.

These are SPEC CONSTANTS (numbers printed in RFC 6386), not code; the
decoder that consumes them is written from scratch against the spec. The
extraction is self-validating twice over: this tool cross-checks the two
independent copies libwebp carries (decoder + encoder), and
tests/test_vp8.py proves the full table set end-to-end by decoding
libwebp-encoded payloads BIT-EXACTLY (any wrong byte desyncs the
arithmetic decoder or corrupts pixels).

Usage: python tools/extract_vp8_tables.py [path-to-libwebp.so]
Rewrites operators/vp8_tables.py in place; run the vp8 tests after.
"""

from __future__ import annotations

import ctypes.util
import re
import struct
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
OUT = REPO / "aws_cloudfront_realtime_monitoring_spark" / "operators" / "vp8_tables.py"

#: anchor rows known independently of any implementation: RFC 6386 13.5's
#: first three context rows of the token-probability table (block type 0,
#: band 0) and 11.4's first B-mode probability row
COEFF_ROW0 = bytes([253, 136, 254, 255, 228, 219, 128, 128, 128, 128, 128])
BMODE_ROW0 = bytes([231, 120, 48, 89, 115, 113, 120, 152, 112])
#: RFC 6386 14.1 dequantization lookups open with these runs
DC_PREFIX = bytes([4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14, 15])
AC_PREFIX = b"".join(struct.pack("<H", v) for v in range(4, 14))


def _find_all(data: bytes, pat: bytes) -> list[int]:
    return [m.start() for m in re.finditer(re.escape(pat), data)]


def extract(data: bytes) -> dict[str, object]:
    bmode_hits = _find_all(data, BMODE_ROW0)
    coeff_hits = _find_all(data, COEFF_ROW0)
    dc_hits = _find_all(data, DC_PREFIX)
    ac_hits = _find_all(data, AC_PREFIX)
    if not (bmode_hits and coeff_hits and dc_hits and ac_hits):
        raise SystemExit("anchor rows not found -- not a libwebp build?")

    def _copies(hits: list[int], length: int) -> bytes:
        """The library carries each table twice (decoder + encoder
        translation units); require every found copy to agree."""
        blobs = {data[h : h + length] for h in hits}
        if len(blobs) != 1:
            raise SystemExit(f"table copies at {hits} disagree over {length} bytes")
        return blobs.pop()

    bmode = _copies(bmode_hits, 900)  # 10 x 10 x 9
    # the well-known {253,136,...} row is the first MEANINGFUL row of the
    # table, not its first byte: block type 0 ("Y after Y2") starts at
    # coefficient 1, so its band-0 context triple (33 bytes) is an unused
    # all-128 placeholder that PRECEDES the anchor (verified empirically:
    # shifting the layout by -33 makes the first decoded token of a
    # libwebp-encoded frame match the arithmetic ground truth exactly)
    coeff = _copies([h - 33 for h in coeff_hits], 1056)
    if coeff[:33] != bytes([128] * 33):
        raise SystemExit("expected the unused band-0 placeholder before "
                         "the token-probability anchor row")
    # update probs immediately precede the B-mode table in both copies
    upd = _copies([h - 1056 for h in bmode_hits], 1056)
    if upd.count(255) < 800:
        raise SystemExit("update-prob candidate implausible (few 255s)")
    dc = _copies(dc_hits, 128)
    ac_raw = _copies(ac_hits, 256)
    ac = list(struct.unpack("<128H", ac_raw))
    if not all(dc[i] <= dc[i + 1] for i in range(127)):
        raise SystemExit("dc table not monotone")
    if not all(ac[i] <= ac[i + 1] for i in range(127)):
        raise SystemExit("ac table not monotone")
    return {
        "COEFF_PROBS": list(coeff),
        "COEFF_UPDATE_PROBS": list(upd),
        "KF_BMODE_PROBS": list(bmode),
        "DC_QLOOKUP": list(dc),
        "AC_QLOOKUP": ac,
    }


def emit(tables: dict[str, object]) -> str:
    lines = [
        '"""RFC 6386 default VP8 tables (spec DATA, not code): token',
        "probabilities (13.5), token-probability update probabilities (13.4),",
        "key-frame B-mode probabilities (11.4), and the DC/AC dequantization",
        "lookups (14.1). Regenerated by tools/extract_vp8_tables.py (see its",
        "docstring for provenance); verified bit-exactly by tests/test_vp8.py",
        'decoding libwebp-encoded payloads."""',
        "",
        "# fmt: off",
    ]
    for name, vals in tables.items():
        lines.append(f"{name} = [")
        vals = list(vals)  # noqa: PLW2901
        for i in range(0, len(vals), 16):
            lines.append("    " + ", ".join(str(v) for v in vals[i : i + 16]) + ",")
        lines.append("]")
        lines.append("")
    lines.append("# fmt: on")
    return "\n".join(lines) + "\n"


def _resolve_soname(name: str) -> str | None:
    """Resolve a bare soname (e.g. ``libwebp.so.7``) to an absolute path
    portably: dlopen it and read the mapped path back from
    /proc/self/maps (Linux), falling back to ``ldconfig -p``. No distro
    directory is assumed."""
    try:
        ctypes.CDLL(name)
        with open("/proc/self/maps") as f:
            for line in f:
                path = line.split(None, 5)[-1].strip()
                if path.startswith("/") and Path(path).name.startswith(name):
                    return path
    except OSError:
        pass
    try:
        out = subprocess.run(
            ["ldconfig", "-p"], capture_output=True, text=True, check=False
        ).stdout
        for line in out.splitlines():
            if name in line and "=>" in line:
                return line.split("=>", 1)[1].strip()
    except OSError:
        pass
    return None


def main() -> None:
    lib = sys.argv[1] if len(sys.argv) > 1 else ctypes.util.find_library("webp")
    if lib and not lib.startswith("/"):
        lib = _resolve_soname(lib)
    if not lib or not Path(lib).exists():
        raise SystemExit(
            "libwebp not found; pass the .so path explicitly: "
            "python tools/extract_vp8_tables.py /path/to/libwebp.so"
        )
    data = Path(lib).read_bytes()
    tables = extract(data)
    OUT.write_text(emit(tables))
    sizes = {k: len(v) for k, v in tables.items()}
    print(f"wrote {OUT} ({sizes})")


if __name__ == "__main__":
    main()
