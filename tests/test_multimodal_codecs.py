"""Pure-python media codec tests (round 3 — the decode stub is gone).

The decoders are exercised three ways: golden hand-built byte strings
(offsets checked against the published BMP/PPM/RIFF layouts), encoder
round-trips with awkward widths (stride padding), and container
variants the synth path never produces (top-down BMP, commented PPM,
16-bit stereo WAV) — so the parsers are real parsers, not inverses of
our own encoder.
"""

from __future__ import annotations

import struct

import pytest

from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.multimodal import (
    decode_media,
    encode_bmp,
    encode_ppm,
    encode_wav,
)


def test_bmp_round_trip_awkward_stride():
    # width 3 -> 9 pixel bytes/row, stride 12: 3 padding bytes per row
    # must be EXCLUDED from the mean
    m = decode_media(encode_bmp(3, 5, 200))
    assert (m["kind"], m["width"], m["height"], m["n_channels"]) == ("bmp", 3, 5, 3)
    assert m["mean_byte"] == 200.0
    assert m["sample_rate"] is None and m["duration_ms"] is None


def test_bmp_mean_reads_pixels_not_padding():
    # hand-build a 1x2 bottom-up BMP with distinct pixel bytes and
    # nonzero padding: mean must cover exactly the 6 pixel bytes
    pixels = bytes([10, 20, 30]) + b"\xff" + bytes([40, 50, 60]) + b"\xff"
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 1, 2, 1, 24, 0, len(pixels), 0, 0, 0, 0)
    m = decode_media(header + info + pixels)
    assert m["mean_byte"] == (10 + 20 + 30 + 40 + 50 + 60) / 6


def test_bmp_top_down_negative_height():
    b = bytearray(encode_bmp(4, 3, 7))
    struct.pack_into("<i", b, 22, -3)  # biHeight < 0: top-down rows
    m = decode_media(bytes(b))
    assert m["height"] == 3 and m["mean_byte"] == 7.0


def test_bmp_rejects_unsupported_depth():
    b = bytearray(encode_bmp(2, 2, 0))
    struct.pack_into("<H", b, 28, 8)  # 8-bit palette BMP
    with pytest.raises(ValueError, match="bit depth"):
        decode_media(bytes(b))


def test_ppm_round_trip_and_comments():
    m = decode_media(encode_ppm(6, 4, 123))
    assert (m["kind"], m["width"], m["height"], m["mean_byte"]) == ("ppm", 6, 4, 123.0)
    commented = b"P6\n# a comment\n2 1\n# another\n255\n" + bytes([9] * 6)
    m2 = decode_media(commented)
    assert (m2["width"], m2["height"], m2["mean_byte"]) == (2, 1, 9.0)


def test_wav_round_trip_duration():
    m = decode_media(encode_wav(8000, 400, 64))
    assert (m["kind"], m["n_channels"], m["sample_rate"], m["n_samples"]) == (
        "wav", 1, 8000, 400,
    )
    assert m["duration_ms"] == 50.0 and m["mean_byte"] == 64.0
    assert m["width"] is None and m["height"] is None


def test_wav_16bit_stereo_chunk_walk():
    # 16-bit stereo with a LIST chunk before data: the chunk walk must
    # skip unknown chunks and divide by bytes-per-frame (4)
    frames = 250
    data = struct.pack("<" + "h" * (frames * 2), *([1000, -1000] * frames))
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 2, 44100, 44100 * 4, 4, 16)
    lst = struct.pack("<4sI", b"LIST", 4) + b"INFO"
    dch = struct.pack("<4sI", b"data", len(data)) + data
    riff = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + len(lst) + len(dch), b"WAVE")
    m = decode_media(riff + fmt + lst + dch)
    assert (m["n_channels"], m["sample_rate"], m["n_samples"]) == (2, 44100, 250)
    assert m["duration_ms"] == 250 * 1000.0 / 44100


def test_unknown_container_raises():
    # GIF and MP4 are still external-codec territory; PNG and JPEG
    # (supported since round 15) route to their real decoders, where a
    # truncated payload fails its own parse instead of the dispatch
    with pytest.raises(ValueError, match="unknown media container"):
        decode_media(b"GIF87a......")
    with pytest.raises(ValueError, match="unknown media container"):
        decode_media(b"\x00\x00\x00\x18ftypmp42....")
    with pytest.raises(ValueError):
        decode_media(b"\x89PNG\r\n\x1a\n....")
    with pytest.raises(ValueError):
        decode_media(b"\xff\xd8\xff\xe0....")


def test_synth_decode_spark_round_trip(spark):
    """End-to-end through the two mapInPandas stages on a real session:
    binary column in between, typed nullable metadata out."""
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.multimodal import (
        decode_media_meta,
        synth_media_payloads,
    )

    docs = spark.range(0, 30).withColumnRenamed("id", "doc_id")
    out = decode_media_meta(synth_media_payloads(docs)).orderBy("doc_id").collect()
    assert len(out) == 30
    for r in out:
        d = r.doc_id
        if d % 3 == 2:
            assert r.kind == "wav" and r.width is None
            assert r.n_samples == 100 + d % 400
            assert r.sample_rate == 8000 + (d % 5) * 1000
        else:
            assert r.kind == ("bmp" if d % 3 == 0 else "ppm")
            assert (r.width, r.height) == (1 + d % 31, 1 + d % 17)
            assert r.duration_ms is None
        assert r.mean_byte == float((d * 7) % 256)


def test_wav_ramp_window_energy_roundtrip(spark):
    """Ramp WAV → windowed energy: hand-computed frames, partial
    trailing window dropped."""
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.multimodal import (
        audio_window_energy,
        encode_wav_pcm,
        synth_wav_ramp,
    )

    # direct codec check: 120 samples -> 2 complete 50-windows, 20 dropped
    samples = bytes(i % 256 for i in range(120))
    payload = encode_wav_pcm(8000, samples)
    df = spark.createDataFrame(
        [(7, bytearray(payload))], "doc_id long, payload binary"
    )
    rows = {r.win_idx: (r.sum_pcm, r.peak) for r in audio_window_energy(df).collect()}
    assert set(rows) == {0, 1}
    assert rows[0] == (sum(range(50)), 49)
    assert rows[1] == (sum(range(50, 100)), 99)

    # synth path: doc_id=300 -> samples (300+i)%256, n=100+300=400
    sdf = synth_wav_ramp(
        spark.createDataFrame([(300,)], "doc_id long")
    )
    out = {r.win_idx: (r.sum_pcm, r.peak) for r in audio_window_energy(sdf).collect()}
    assert set(out) == set(range(8))
    exp0 = sum((300 + i) % 256 for i in range(50))
    assert out[0] == (exp0, max((300 + i) % 256 for i in range(50)))


def test_png_roundtrip_all_filters(spark):
    """PNG (round 15 — the first compressed codec): encode/decode
    round-trip across sizes exercising every filter row (height ≥ 5
    cycles Sub/Up/Average/Paeth at least once plus the wrap), plus the
    driver-side decode dispatch and the Spark synth → decode path."""
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.multimodal import (
        _decode_png,
        decode_media,
        encode_png,
        decode_media_meta,
        synth_png_payloads,
    )

    for w, h, f in [(1, 1, 0), (29, 13, 77), (5, 9, 128), (2, 5, 255)]:
        m = decode_media(encode_png(w, h, f))
        assert (m["kind"], m["width"], m["height"], m["n_channels"]) == (
            "png", w, h, 3,
        )
        assert m["mean_byte"] == float(f)

    # Spark path: doc_id-derived parameters decode back exactly
    docs = spark.createDataFrame([(i,) for i in (0, 3, 57)], "doc_id long")
    rows = {
        r.doc_id: r
        for r in decode_media_meta(synth_png_payloads(docs)).collect()
    }
    for d in (0, 3, 57):
        r = rows[d]
        assert (r.width, r.height, r.mean_byte) == (
            1 + d % 29, 1 + d % 13, float((d * 11) % 256),
        )

    # corrupt a byte inside IDAT: CRC check must reject it loudly
    import pytest as _pytest

    b = bytearray(encode_png(4, 4, 9))
    b[40] ^= 0xFF
    with _pytest.raises(ValueError):
        _decode_png(bytes(b))


def test_png_nonconstant_and_grayscale():
    """The decoder is a real unfilterer, not a constant-fill trick:
    a hand-built non-constant grayscale PNG (ramp rows, explicit Up
    and Paeth filters) must decode to the exact arithmetic mean."""
    import struct
    import zlib

    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.multimodal import (
        _decode_png,
        _png_chunk,
        _PNG_SIG,
    )

    # 4x3 grayscale: row0 raw [0,1,2,3] (None), row1 = row0 + 10 via
    # Up deltas, row2 = row1 + [5,5,5,5] via Paeth (predictor = left
    # for j>0 after first col; verify against reference unfilter)
    rows = [
        bytes([0]) + bytes([0, 1, 2, 3]),
        bytes([2]) + bytes([10, 10, 10, 10]),
        bytes([4]) + bytes([15, 4, 5, 5]),
    ]
    raw = b"".join(rows)
    ihdr = struct.pack(">IIBBBBB", 4, 3, 8, 0, 0, 0, 0)
    png = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    # reference unfilter by hand: row0 = [0,1,2,3]; row1 = row0+10 =
    # [10,11,12,13]; row2 Paeth: j=0 left=0,up=10,ul=0 -> pred=10 ->
    # 25; j=1 left=25,up=11,ul=10 -> p=26, pa=1,pb=15,pc=16 -> left
    # -> 29; j=2 left=29,up=12,ul=11 -> p=30, pa=1 -> left -> 34;
    # j=3 left=34,up=13,ul=12 -> p=35, pa=1 -> left -> 39
    expected = [0, 1, 2, 3, 10, 11, 12, 13, 25, 29, 34, 39]
    m = _decode_png(png)
    assert (m["width"], m["height"], m["n_channels"]) == (4, 3, 1)
    assert m["mean_byte"] == sum(expected) / len(expected)


def test_jpeg_roundtrip_and_spark_path(spark):
    """Baseline JPEG (round 15, second wave): encode/decode round-trip
    across sizes spanning partial MCUs and DC categories 0..8, plus
    the Spark synth → decode path with doc_id-derived parameters."""
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.multimodal import (
        _decode_jpeg,
        decode_media,
        decode_media_meta,
        encode_jpeg_gray,
        synth_jpeg_payloads,
    )

    for w, h, f in [(1, 1, 0), (8, 8, 128), (23, 11, 77), (24, 16, 255)]:
        m = decode_media(encode_jpeg_gray(w, h, f))
        assert (m["kind"], m["width"], m["height"], m["n_channels"]) == (
            "jpeg", w, h, 1,
        )
        assert m["mean_byte"] == float(f)

    docs = spark.createDataFrame([(i,) for i in (0, 7, 100)], "doc_id long")
    rows = {
        r.doc_id: r
        for r in decode_media_meta(synth_jpeg_payloads(docs)).collect()
    }
    for d in (0, 7, 100):
        r = rows[d]
        assert (r.width, r.height, r.mean_byte) == (
            1 + d % 23, 1 + d % 11, float((d * 13) % 256),
        )

    import pytest as _pytest

    with _pytest.raises(ValueError):  # progressive SOF2 rejected loudly
        bad = bytearray(encode_jpeg_gray(8, 8, 10))
        i = bytes(bad).find(b"\xff\xc0")
        bad[i + 1] = 0xC2
        _decode_jpeg(bytes(bad))


def test_jpeg_ac_path_hand_fixture():
    """The decoder's AC run-length + IDCT path, pinned against an
    INDEPENDENT per-pixel cosine computation (math.cos, no numpy, no
    decoder code): a hand-assembled 8x8 JPEG whose entropy stream
    encodes DC=0 and a single AC coefficient at zigzag position 1
    (u=0, v=1) of magnitude +1 -> dequantized 16. Any huffman, EXTEND,
    zigzag, dequant, or IDCT slip moves the mean."""
    import math
    import struct

    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.multimodal import (
        _JPEG_QTABLE,
        _decode_jpeg,
        _huff_canonical,
    )

    dc_bits = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
    dc_vals = list(range(12))
    # AC table with EOB (0x00) and run=0/size=1 (0x01)
    ac_bits = [0, 2] + [0] * 14
    ac_vals = [0x00, 0x01]
    dc_codes = _huff_canonical(dc_bits, dc_vals)
    ac_codes = _huff_canonical(ac_bits, ac_vals)
    # DC cat 0, then AC (0,1) with value bit 1 (+1), then EOB
    bits = dc_codes[0] + ac_codes[0x01] + "1" + ac_codes[0x00]
    bits += "1" * (-len(bits) % 8)
    entropy = bytearray()
    for i in range(0, len(bits), 8):
        byte = int(bits[i : i + 8], 2)
        entropy.append(byte)
        if byte == 0xFF:
            entropy.append(0x00)

    def seg(marker, body):
        return struct.pack(">HH", marker, len(body) + 2) + body

    payload = (
        b"\xff\xd8"
        + seg(0xFFDB, bytes([0]) + bytes(_JPEG_QTABLE))
        + seg(0xFFC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
        + seg(
            0xFFC4,
            bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals)
            + bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals),
        )
        + seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + bytes(entropy)
        + b"\xff\xd9"
    )
    # independent reference: pixel(x, y) = round(clamp(
    #   0.25 * (1/sqrt(2)) * 16 * cos((2y+1)*pi/16) + 128))
    ref = []
    for x in range(8):
        for y in range(8):
            v = 0.25 * (1 / math.sqrt(2)) * 16.0 * math.cos(
                (2 * y + 1) * math.pi / 16
            ) + 128.0
            ref.append(min(255, max(0, round(v))))
    m = _decode_jpeg(payload)
    assert (m["width"], m["height"], m["n_channels"]) == (8, 8, 1)
    assert m["mean_byte"] == sum(ref) / 64.0
