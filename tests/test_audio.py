"""WAV decode + audio features: golden bytes written by stdlib ``wave``
(an independent encoder), decoded by the numpy parser; features pinned
against direct numpy computation; mapInPandas e2e."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from aws_cloudfront_realtime_monitoring_spark.operators.audio import (
    audio_feature_batches,
    decode_wav,
    wav_features,
)


def _make_wav(samples: np.ndarray, rate: int, bits: int = 16) -> bytes:
    """Encode [n, ch] float in [-1, 1] via the STDLIB wave module — an
    encoder this repo did not write."""
    n, ch = samples.shape
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(ch)
        wv.setsampwidth(bits // 8)
        wv.setframerate(rate)
        if bits == 16:
            ints = np.clip(np.round(samples * 32768.0), -32768, 32767)
            wv.writeframes(ints.astype("<i2").tobytes())
        else:
            ints = np.clip(np.round(samples * 128.0 + 128.0), 0, 255)
            wv.writeframes(ints.astype(np.uint8).tobytes())
    return buf.getvalue()


def test_wav_16bit_roundtrips_bit_exact():
    rng = np.random.RandomState(47)
    orig = (rng.randint(-32768, 32768, size=(500, 2)) / 32768.0)
    blob = _make_wav(orig, rate=16000)
    rate, ch, got = decode_wav(blob)
    assert (rate, ch) == (16000, 2)
    # both sides quantize to the same int16 grid -> bit-exact equality
    np.testing.assert_array_equal(
        np.round(got * 32768.0), np.clip(np.round(orig * 32768.0), -32768, 32767)
    )


def test_wav_8bit_unsigned_decodes():
    t = np.linspace(0, 1, 800)[:, None]
    orig = 0.5 * np.sin(2 * np.pi * 440 * t)
    rate, ch, got = decode_wav(_make_wav(orig, rate=8000, bits=8))
    assert (rate, ch) == (8000, 1)
    assert np.abs(got - orig).max() <= 1 / 127  # 8-bit quantization step


def test_wav_features_match_numpy_reference():
    rng = np.random.RandomState(53)
    orig = rng.uniform(-0.8, 0.8, size=(2000, 1))
    blob = _make_wav(orig, rate=8000)
    row = wav_features(5, blob)
    _rate, _ch, mono2d = decode_wav(blob)
    mono = mono2d.mean(axis=1)
    assert row["doc_id"] == 5 and row["fmt"] == "wav"
    assert row["n_samples"] == 2000
    assert row["duration_ms"] == 250
    assert row["rms_micro"] == round(float(np.sqrt((mono**2).mean())) * 1e6)
    zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
    assert row["zcr_micro"] == round(zcr * 1e6)
    # a pure DC clip has zero crossings; silence has zero RMS
    dc = wav_features(6, _make_wav(np.full((100, 1), 0.5), 8000))
    assert dc["zcr_micro"] == 0
    silent = wav_features(7, _make_wav(np.zeros((100, 1)), 8000))
    assert silent["rms_micro"] == 0


def test_wav_rejects_malformed_and_compressed():
    blob = _make_wav(np.zeros((64, 1)), 8000)
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxNOPE")
    with pytest.raises(ValueError):
        decode_wav(blob[:40])  # truncated data chunk
    # flip the fmt tag to 3 (IEEE float): declined, not mis-decoded
    i = blob.index(b"fmt ") + 8
    non_pcm = blob[:i] + struct.pack("<H", 3) + blob[i + 2:]
    with pytest.raises(ValueError):
        decode_wav(non_pcm)


def test_audio_features_through_mapinpandas(spark):
    rng = np.random.RandomState(59)
    rows = [
        (int(i), bytearray(_make_wav(
            rng.uniform(-0.5, 0.5, size=(400 + 100 * i, 1 + i % 2)),
            rate=8000 * (1 + i),
        )))
        for i in range(3)
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, payload BINARY")
    got = {r.doc_id: r for r in audio_feature_batches(df).collect()}
    for i in range(3):
        assert got[i].fmt == "wav"
        assert got[i].sample_rate == 8000 * (1 + i)
        assert got[i].n_channels == 1 + i % 2
        assert got[i].n_samples == 400 + 100 * i
        assert got[i].rms_micro > 0


def test_audio_batches_skip_corrupt_payloads(spark):
    """A corrupt record must not kill the task: skip_invalid drops it
    (the input-vs-output diff counts them), strict mode raises; and
    decode_wav maps ANY malformed bytes to ValueError only."""
    good = _make_wav(np.zeros((64, 1)), 8000)
    rows = [(1, bytearray(good)), (2, bytearray(b"RIFFgarbageWAVE\x00\x01")),
            (3, bytearray(good))]
    df = spark.createDataFrame(rows, "doc_id BIGINT, payload BINARY")
    got = audio_feature_batches(df).collect()
    assert sorted(r.doc_id for r in got) == [1, 3]
    with pytest.raises(Exception):  # strict surfaces the failure
        audio_feature_batches(df, skip_invalid=False).collect()
    # fuzz: mutations of a valid WAV either decode or raise ValueError
    rng = np.random.RandomState(101)
    for _ in range(200):
        blob = bytearray(good)
        for _f in range(rng.randint(0, 6)):
            blob[rng.randint(0, len(blob))] = rng.randint(0, 256)
        if rng.rand() < 0.5:
            blob = blob[: rng.randint(2, len(blob))]
        try:
            decode_wav(bytes(blob))
        except ValueError:
            pass  # the only permitted failure mode


def test_audio_batches_null_payload_skipped(spark):
    """A NULL payload must be dropped by skip_invalid, not
    TypeError-kill the task (bytes(None) is not a ValueError)."""
    good = _make_wav(np.zeros((64, 1)), 8000)
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, None)], "doc_id BIGINT, payload BINARY"
    )
    got = audio_feature_batches(df).collect()
    assert sorted(r.doc_id for r in got) == [1]


def test_audio_null_doc_id_skipped(spark):
    good = _make_wav(np.zeros((64, 1)), 8000)
    df = spark.createDataFrame(
        [(None, bytearray(good)), (3, bytearray(good))],
        "doc_id BIGINT, payload BINARY",
    )
    got = audio_feature_batches(df).collect()
    assert [r.doc_id for r in got] == [3]


# ---------------------------------------------- FLAC / MP3 metadata (r11)
# Header builders written HERE from the published specs (FLAC format doc,
# ISO 11172-3 frame header layout), independent of the parser under test.


def make_flac(rate: int, channels: int, bps: int, n_samples: int) -> bytes:
    packed = (
        (rate << 44)
        | ((channels - 1) << 41)
        | ((bps - 1) << 36)
        | n_samples
    )
    block = (
        struct.pack(">HH", 4096, 4096)      # min/max block size
        + b"\x00\x00\x11" + b"\x00\xff\xff"  # min/max frame size (u24)
        + packed.to_bytes(8, "big")
        + b"\x00" * 16                       # md5 of the raw audio
    )
    return b"fLaC" + bytes([0x80]) + len(block).to_bytes(3, "big") + block


def make_mp3(rate_idx: int = 0, br_idx: int = 9, mono: bool = False,
             xing_frames: int | None = None, id3_size: int = 0,
             n_filler: int = 4000) -> bytes:
    """MPEG1 Layer III first frame (+ optional ID3v2 prefix and Xing
    frame count), padded with filler bytes standing in for audio data."""
    out = bytearray()
    if id3_size:
        out += b"ID3\x03\x00\x00" + bytes(
            [(id3_size >> 21) & 0x7F, (id3_size >> 14) & 0x7F,
             (id3_size >> 7) & 0x7F, id3_size & 0x7F]
        ) + b"\x00" * id3_size
    h1 = 0xFF
    # protection bit SET (no CRC): bit 0 of byte 2 == 0 means a 16-bit
    # CRC precedes the side info, which this builder does not write
    h2 = 0xE0 | (3 << 3) | (1 << 1) | 0x1    # sync, MPEG1, Layer III
    h3 = (br_idx << 4) | (rate_idx << 2)
    h4 = (0x3 << 6) if mono else 0x00        # channel mode
    frame_at = len(out)
    out += bytes([h1, h2, h3, h4])
    side = 17 if mono else 32
    out += b"\x00" * side
    if xing_frames is not None:
        out += b"Xing" + struct.pack(">II", 0x1, xing_frames)
    out += b"\x00" * n_filler
    return bytes(out)


def test_flac_streaminfo_metadata():
    from aws_cloudfront_realtime_monitoring_spark.operators.audio import flac_meta

    meta = flac_meta(make_flac(44100, 2, 16, 441_000))
    assert meta == {"sample_rate": 44100, "n_channels": 2,
                    "n_samples": 441_000, "duration_ms": 10_000,
                    "fmt": "flac"}
    meta = flac_meta(make_flac(192_000, 8, 24, 96_000))
    assert (meta["sample_rate"], meta["n_channels"]) == (192_000, 8)
    assert meta["duration_ms"] == 500


def test_mp3_header_xing_and_cbr_estimate():
    from aws_cloudfront_realtime_monitoring_spark.operators.audio import mp3_meta

    # Xing: exact frame count wins. 420 frames x 1152 / 44100 = 10971 ms
    meta = mp3_meta(make_mp3(xing_frames=420))
    assert meta == {"sample_rate": 44100, "n_channels": 2,
                    "n_samples": 420 * 1152, "duration_ms": 10971,
                    "fmt": "mp3"}
    # no Xing: CBR estimate from the first frame's bitrate (128 kbps)
    blob = make_mp3(br_idx=9, n_filler=16_000)
    meta = mp3_meta(blob)
    assert meta["duration_ms"] == len(blob) * 8 // 128
    # ID3v2 prefix skipped via the synchsafe size; mono side-info offset
    meta = mp3_meta(make_mp3(mono=True, xing_frames=100, id3_size=300))
    assert meta["n_channels"] == 1 and meta["n_samples"] == 100 * 1152


def test_audio_meta_rejects_malformed():
    from aws_cloudfront_realtime_monitoring_spark.operators.audio import (
        flac_meta,
        mp3_meta,
    )

    with pytest.raises(ValueError):
        flac_meta(b"fLaC\x04\x00\x00\x22" + b"\x00" * 34)  # not STREAMINFO
    with pytest.raises(ValueError):
        flac_meta(make_flac(44100, 2, 16, 1000)[:20])  # truncated
    with pytest.raises(ValueError):
        mp3_meta(b"ID3\x03\x00\x00\x00\x00\x00\x04" + b"\x00" * 5000)  # no sync
    bad = bytearray(make_mp3())
    bad[2] = 0xF0 | (bad[2] & 0x0F)  # bitrate index 15: invalid
    with pytest.raises(ValueError):
        mp3_meta(bytes(bad))


def test_audio_batches_mix_wav_flac_mp3(spark):
    """The dispatcher routes each payload to its handler in ONE Arrow
    batch pass: WAV rows carry real rms/zcr, FLAC/MP3 rows carry real
    stream metadata with rms/zcr NULL (never fabricated)."""
    rng = np.random.RandomState(53)
    wav = _make_wav(rng.uniform(-0.5, 0.5, (800, 1)), 8000)
    df = spark.createDataFrame(
        [(1, bytearray(wav)),
         (2, bytearray(make_flac(48000, 2, 16, 24000))),
         (3, bytearray(make_mp3(xing_frames=50)))],
        "doc_id BIGINT, payload BINARY",
    )
    got = {r.doc_id: r for r in audio_feature_batches(df).collect()}
    assert got[1].fmt == "wav" and got[1].rms_micro > 0
    assert got[2].fmt == "flac" and got[2].duration_ms == 500
    assert got[2].rms_micro is None and got[2].zcr_micro is None
    assert got[3].fmt == "mp3" and got[3].n_samples == 50 * 1152


def test_mp3_crc_frame_and_stacked_id3_tags():
    """r11 review: the 16-bit CRC that precedes the side info when the
    protection bit is 0 shifted the Xing tag; stacked ID3v2 tags (a
    retagger's leftover) pushed the sync past the old 4KB window."""
    from aws_cloudfront_realtime_monitoring_spark.operators.audio import mp3_meta

    # CRC'd frame: protection bit 0 and a 2-byte CRC before side info
    blob = bytearray(make_mp3(xing_frames=77))
    blob[1] &= 0xFE  # clear the protection bit -> CRC present
    blob[4:4] = b"\x00\x00"  # splice the CRC between header and side info
    meta = mp3_meta(bytes(blob))
    assert meta["n_samples"] == 77 * 1152
    # two stacked ID3 tags, the second > 4KB
    tagged = bytearray()
    for size in (300, 6000):
        tagged += b"ID3\x03\x00\x00" + bytes(
            [(size >> 21) & 0x7F, (size >> 14) & 0x7F,
             (size >> 7) & 0x7F, size & 0x7F]) + b"\x00" * size
    tagged += make_mp3(xing_frames=50)
    meta = mp3_meta(bytes(tagged))
    assert meta["n_samples"] == 50 * 1152


def test_id3_tagged_flac_routes_to_flac(spark):
    """r11 review: an ID3v2-prefixed FLAC used to be force-routed to
    mp3_meta and rejected; the dispatcher now checks what follows the
    tags."""
    from aws_cloudfront_realtime_monitoring_spark.operators.audio import (
        audio_meta_or_features,
    )

    size = 128
    blob = (b"ID3\x03\x00\x00"
            + bytes([0, 0, (size >> 7) & 0x7F, size & 0x7F])
            + b"\x00" * size
            + make_flac(48000, 2, 16, 96000))
    row = audio_meta_or_features(5, blob)
    assert row["fmt"] == "flac" and row["duration_ms"] == 2000
