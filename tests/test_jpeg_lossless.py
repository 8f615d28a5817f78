"""Lossless JPEG (SOF3, ITU T.81 Annex H) tests.

The load-bearing property is EXACTNESS: ``decode_jpeg(
encode_jpeg_lossless(px)) == px`` bit-for-bit, for every predictor,
component count, precision, and restart layout -- there is no
quantization tolerance to hide behind. The decoder is additionally
pinned by a HAND-ASSEMBLED stream (diffs and Huffman codes computed on
paper from Annex H), independent of the encoder, mirroring the baseline
and progressive conformance anchors.

Reference provenance: the reference repo has no image path; this closes
the former lossless-JPEG NotImplementedError boundary of the multimodal
column surface (SURVEY.md, LLM-pipeline operators).
"""

import random
import struct

import pytest

from etl_world_banks_with_python_and_postgresql_spark.operators import jpeg


def _gray(w, h, seed=11):
    rng = random.Random(seed)
    return [rng.randrange(256) for _ in range(w * h)]


@pytest.mark.parametrize("predictor", list(range(1, 8)))
def test_lossless_roundtrip_every_predictor(predictor):
    w, h = 17, 9
    px = _gray(w, h)
    enc = jpeg.encode_jpeg_lossless(px, w, h, predictor=predictor)
    assert jpeg.decode_jpeg(enc) == (w, h, 1, px)


def test_lossless_roundtrip_color_and_meta():
    rng = random.Random(3)
    w, h = 11, 6
    px = [
        (rng.randrange(256), rng.randrange(256), rng.randrange(256))
        for _ in range(w * h)
    ]
    enc = jpeg.encode_jpeg_lossless(px, w, h, predictor=4)
    gw, gh, nc, got = jpeg.decode_jpeg(enc)
    assert (gw, gh, nc) == (w, h, 3)
    assert [tuple(p) for p in got] == px
    assert jpeg.decode_jpeg_meta(enc) == (w, h, 3, "lossless")


def test_lossless_roundtrip_restart_markers():
    w, h = 10, 10
    px = _gray(w, h, seed=5)
    plain = jpeg.encode_jpeg_lossless(px, w, h, predictor=7)
    rst = jpeg.encode_jpeg_lossless(px, w, h, predictor=7, restart_interval=4)
    assert b"\xff\xd0" in rst or b"\xff\xd1" in rst
    assert jpeg.decode_jpeg(rst)[3] == px == jpeg.decode_jpeg(plain)[3]


@pytest.mark.parametrize("predictor", list(range(1, 8)))
@pytest.mark.parametrize("interval", [1, 2, 3, 5, 7])
def test_lossless_roundtrip_restart_every_predictor_and_phase(
    predictor, interval
):
    """Restart intervals that divide the width, span lines, and land
    mid-line, for every predictor -- the H.1.2.1 first-line-Ra rule
    must be mirrored by both sides or these fail."""
    w, h = 7, 5
    px = _gray(w, h, seed=interval * 10 + predictor)
    enc = jpeg.encode_jpeg_lossless(
        px, w, h, predictor=predictor, restart_interval=interval
    )
    assert jpeg.decode_jpeg(enc) == (w, h, 1, px)


def test_annex_h_handassembled_restart_stream_decodes_per_spec():
    """4x2 grayscale SOF3 stream with DRI=2 and predictor 2 (Rb), built
    BY HAND from Annex H. H.1.2.1: after each RST the first sample
    predicts from the 2^(P-1)=128 default and the REMAINING samples of
    that line use the one-dimensional Ra predictor -- NOT the selected
    predictor. The samples at (1,1) and (3,1) discriminate: with Ra
    they decode to 95 and 115; an implementation that resumes the
    selected predictor (Rb) after a restart would decode 115 and 140.
    Huffman table (canonical): cat3='00', cat4='01', cat5='100',
    cat6='101'. Diff trace (restarts before units 2, 4, 6):
      u0 (0,0) fresh  128  -28 -> 100   u1 (1,0) Ra 100  +10 -> 110
      u2 (2,0) fresh  128   -8 -> 120   u3 (3,0) Ra 120  +10 -> 130
      u4 (0,1) fresh  128  -38 ->  90   u5 (1,1) Ra  90   +5 ->  95
      u6 (2,1) fresh  128  -23 -> 105   u7 (3,1) Ra 105  +10 -> 115
    """
    sof3 = _seg(0xC3, bytes([8, 0, 2, 0, 4, 1, 1, 0x11, 0]))
    dht = _seg(
        0xC4,
        bytes([0x00]) + bytes([0, 2, 2] + [0] * 13) + bytes([3, 4, 5, 6]),
    )
    dri = _seg(0xDD, struct.pack(">H", 2))
    sos = _seg(0xDA, bytes([1, 1, 0x00, 2, 0, 0]))  # predictor 2 (Rb)

    def _run(bits):
        bits += "1" * ((8 - len(bits) % 8) % 8)
        return bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))

    ent = (
        _run("100" "00011" "01" "1010")   # -28 (cat5), +10 (cat4)
        + b"\xff\xd0"
        + _run("01" "0111" "01" "1010")   # -8 (cat4), +10
        + b"\xff\xd1"
        + _run("101" "011001" "00" "101")  # -38 (cat6), +5 (cat3)
        + b"\xff\xd2"
        + _run("100" "01000" "01" "1010")  # -23 (cat5), +10
    )
    stream = b"\xff\xd8" + sof3 + dht + dri + sos + ent + b"\xff\xd9"
    assert jpeg.decode_jpeg(stream) == (
        4, 2, 1, [100, 110, 120, 130, 90, 95, 105, 115],
    )
    # and the encoder mirrors the same model: its stream for these
    # pixels round-trips exactly under the same DRI
    enc = jpeg.encode_jpeg_lossless(
        [100, 110, 120, 130, 90, 95, 105, 115], 4, 2,
        predictor=2, restart_interval=2,
    )
    assert jpeg.decode_jpeg(enc)[3] == [100, 110, 120, 130, 90, 95, 105, 115]


@pytest.mark.parametrize("precision", [2, 4, 12, 16])
def test_lossless_roundtrip_high_precision(precision):
    rng = random.Random(precision)
    w, h = 9, 4
    px = [rng.randrange(1 << precision) for _ in range(w * h)]
    enc = jpeg.encode_jpeg_lossless(px, w, h, predictor=2, precision=precision)
    assert jpeg.decode_jpeg(enc)[3] == px


def test_lossless_worst_case_diffs():
    """Alternating extremes maximize |diff| (category 8-16 paths,
    including the SSSS=16 no-extra-bits special at 16-bit precision)."""
    w, h = 8, 2
    px = [0 if (i % 2) else 255 for i in range(w * h)]
    enc = jpeg.encode_jpeg_lossless(px, w, h, predictor=1)
    assert jpeg.decode_jpeg(enc)[3] == px
    deep = [0 if (i % 2) else 65535 for i in range(w * h)]
    enc16 = jpeg.encode_jpeg_lossless(deep, w, h, predictor=1, precision=16)
    assert jpeg.decode_jpeg(enc16)[3] == deep


def _seg(m, b):
    return bytes([0xFF, m]) + struct.pack(">H", len(b) + 2) + b


def test_annex_h_handassembled_stream_decodes_per_spec():
    """4x2 grayscale SOF3 stream built BY HAND from Annex H (predictor
    1): diffs and the 3-bit canonical Huffman codes computed on paper.
    Samples row 0: 100,101,99,99; row 1: 130,130,131,128. First sample
    predicts from the 2^(P-1)=128 default; the first sample of row 1
    predicts from Rb (=100, diff +30). Pins the decoder against the
    spec independently of the encoder."""
    sof3 = _seg(0xC3, bytes([8, 0, 2, 0, 4, 1, 1, 0x11, 0]))
    dht = _seg(
        0xC4, bytes([0x00]) + bytes([0, 0, 4] + [0] * 13) + bytes([0, 1, 2, 5])
    )
    sos = _seg(0xDA, bytes([1, 1, 0x00, 1, 0, 0]))
    bits = (
        "011" "00011"   # diff -28 (cat 5, extend(3,5))
        "001" "1"       # +1
        "010" "01"      # -2 (cat 2, extend(1,2))
        "000"           # 0
        "011" "11110"   # +30 (cat 5)
        "000"           # 0
        "001" "1"       # +1
        "010" "00"      # -3 (cat 2, extend(0,2))
    )
    bits += "1" * ((8 - len(bits) % 8) % 8)
    ent = bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
    stream = b"\xff\xd8" + sof3 + dht + sos + ent + b"\xff\xd9"
    assert jpeg.decode_jpeg(stream) == (
        4, 2, 1, [100, 101, 99, 99, 130, 130, 131, 128],
    )
    assert jpeg.decode_jpeg_meta(stream) == (4, 2, 1, "lossless")


def test_lossless_hostile_inputs_fail_loudly():
    px = _gray(6, 6)
    enc = jpeg.encode_jpeg_lossless(px, 6, 6, predictor=3)
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(enc[: len(enc) - 8])  # truncated entropy/EOI
    # corrupt the predictor byte in SOS (Ss) to 0 -> loud, not wrong
    sos_at = enc.index(b"\xff\xda")
    bad = bytearray(enc)
    bad[sos_at + 7] = 0
    with pytest.raises(ValueError, match="predictor"):
        jpeg.decode_jpeg(bytes(bad))
    # subsampled lossless is an honest boundary, not a wrong decode
    sub = enc.replace(bytes([1, 0x11, 0]), bytes([1, 0x22, 0]), 1)
    with pytest.raises(NotImplementedError, match="subsampled"):
        jpeg.decode_jpeg(sub)
    with pytest.raises(ValueError, match="precision"):
        jpeg.encode_jpeg_lossless(px, 6, 6, precision=17)
    with pytest.raises(ValueError, match="out of range"):
        jpeg.encode_jpeg_lossless([300] * 4, 2, 2, precision=8)


def test_lossless_bit_flip_fuzz_never_wrong_only_loud_or_valid():
    """Flipping any single byte of a lossless stream either raises a
    clean error or still decodes to SOME pixel list -- never crashes
    with a non-ValueError/NotImplementedError, never hangs."""
    px = _gray(5, 4, seed=9)
    enc = bytearray(jpeg.encode_jpeg_lossless(px, 5, 4, predictor=6))
    rng = random.Random(1)
    for _ in range(120):
        i = rng.randrange(2, len(enc) - 2)
        old = enc[i]
        enc[i] ^= 1 << rng.randrange(8)
        try:
            jpeg.decode_jpeg(bytes(enc), max_pixels=1 << 16)
        except (ValueError, NotImplementedError):
            pass
        finally:
            enc[i] = old


def test_lossless_roundtrip_stats_operator(spark):
    """Spark leg of z105: exact stats + exact_roundtrip TRUE for all."""
    from etl_world_banks_with_python_and_postgresql_spark.operators import multimodal

    docs = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    rows = multimodal.lossless_jpeg_roundtrip_stats(docs).collect()
    assert len(rows) == 10
    for r in rows:
        did = r["doc_id"]
        w, h = 6 + did % 13, 5 + did % 11
        src = [(did * 7 + 3 * x + 5 * y) % 256 for y in range(h) for x in range(w)]
        assert (r["width"], r["height"], r["n_pixels"]) == (w, h, w * h)
        assert (r["sum_px"], r["min_px"], r["max_px"]) == (
            sum(src), min(src), max(src),
        )
        assert r["exact_roundtrip"] is True
