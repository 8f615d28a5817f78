"""Progressive-JPEG (SOF2) tests: the encoder and decoder are pinned
against each other AND against the baseline codec.

The load-bearing property: ``encode_jpeg_progressive`` emits the SAME
quantized coefficients as ``encode_jpeg`` (shared ``_prep_components``),
so a progressive decode must be BIT-IDENTICAL to the baseline decode of
the same pixels.  That makes every leg of the decoder (DC first/refine,
AC first with spectral bands + EOB runs, AC refinement with ZRL
correction-bit walks, per-scan DHTs, restart markers) observable without
golden files.  Hostile-input legs mirror the baseline fuzz discipline.

Reference provenance: the reference repo has no image path; this codec
backs the multimodal column surface (SURVEY.md, LLM-pipeline operators).
"""

import random

import pytest

from etl_world_banks_with_python_and_postgresql_spark.operators import jpeg


def _gradient(w, h):
    return [
        (20 + 2 * x + 3 * y, 30 + 3 * x + y, 25 + x + 2 * y)
        for y in range(h)
        for x in range(w)
    ]


def _noise(w, h, seed=7):
    rng = random.Random(seed)
    return [
        (rng.randrange(256), rng.randrange(256), rng.randrange(256))
        for _ in range(w * h)
    ]


def _assert_prog_equals_baseline(px, w, h, **kw):
    base = jpeg.decode_jpeg(jpeg.encode_jpeg(px, w, h, **kw))
    prog_bytes = jpeg.encode_jpeg_progressive(px, w, h, **kw)
    assert jpeg.decode_jpeg_meta(prog_bytes)[3].startswith("progressive")
    prog = jpeg.decode_jpeg(prog_bytes)
    assert prog == base
    return prog_bytes


def test_progressive_color_444_matches_baseline():
    _assert_prog_equals_baseline(_gradient(22, 17), 22, 17, quality=95)


def test_progressive_color_420_matches_baseline():
    # 4:2:0 exercises per-component block geometry (nb_x/nb_y from the
    # component dimensions, NOT the padded MCU grid) in the
    # non-interleaved AC scans
    _assert_prog_equals_baseline(
        _gradient(22, 17), 22, 17, quality=90, subsample="420"
    )


def test_progressive_grayscale_matches_baseline():
    px = [(7 * x + 11 * y) % 256 for y in range(13) for x in range(19)]
    _assert_prog_equals_baseline(px, 19, 13, quality=85)


def test_progressive_noise_matches_baseline():
    # random noise maximizes nonzero AC coefficients: stresses ZRL in
    # first scans, correction-bit interleaving in refinement scans, and
    # keeps EOB runs short
    _assert_prog_equals_baseline(_noise(24, 16), 24, 16, quality=75)


def test_progressive_flat_image_long_eob_runs():
    # a flat image is the opposite extreme: every AC band is empty, so
    # the whole image collapses into maximal EOB runs (EOBn symbols with
    # r > 0, the symbols that do not exist in baseline tables)
    _assert_prog_equals_baseline([(9, 9, 9)] * (32 * 32), 32, 32)


def test_progressive_restart_markers_match_no_restart():
    px = _gradient(24, 24)
    plain = jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(px, 24, 24))
    with_rst = jpeg.decode_jpeg(
        jpeg.encode_jpeg_progressive(px, 24, 24, restart_interval=2)
    )
    assert with_rst == plain
    # and still baseline-identical
    assert with_rst == jpeg.decode_jpeg(jpeg.encode_jpeg(px, 24, 24))


def test_progressive_quality_sweep_and_odd_sizes():
    for w, h, q in [(8, 8, 95), (9, 7, 60), (16, 8, 50), (17, 23, 80)]:
        _assert_prog_equals_baseline(_gradient(w, h), w, h, quality=q)


def test_progressive_truncation_raises():
    data = jpeg.encode_jpeg_progressive(_gradient(16, 16), 16, 16)
    # cutting anywhere inside the stream must raise, never hang or
    # return garbage silently (step through a spread of cut points)
    for cut in range(20, len(data) - 2, 37):
        with pytest.raises(ValueError):
            jpeg.decode_jpeg(data[:cut])


def test_progressive_bomb_guard():
    data = bytearray(jpeg.encode_jpeg_progressive(_gradient(8, 8), 8, 8))
    # inflate the SOF dimensions: find SOF2 and patch height/width
    i = data.find(b"\xff\xc2")
    assert i > 0
    data[i + 5 : i + 9] = (65000).to_bytes(2, "big") + (65000).to_bytes(
        2, "big"
    )
    with pytest.raises(ValueError, match="max_pixels"):
        jpeg.decode_jpeg(bytes(data))


def test_progressive_dc_scan_with_nonzero_se_rejected():
    # the contract the (fixed) error-path test relies on: a DC scan
    # claiming a spectral band is corrupt per T.81 G.1.1.1
    data = jpeg.encode_jpeg([(9, 9, 9)] * 64, 8, 8)
    relabeled = data.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="Se"):
        jpeg.decode_jpeg(relabeled)


def test_progressive_bitflip_fuzz_never_hangs():
    # single-byte corruptions: must either decode (possibly to different
    # pixels -- entropy bytes are not integrity-checked) or raise a
    # clean ValueError/NotImplementedError; no hangs, no other errors
    base = jpeg.encode_jpeg_progressive(_noise(16, 16, seed=3), 16, 16)
    rng = random.Random(11)
    for _ in range(60):
        i = rng.randrange(2, len(base) - 2)
        mutated = base[:i] + bytes([base[i] ^ (1 << rng.randrange(8))]) + base[i + 1 :]
        try:
            out = jpeg.decode_jpeg(mutated)
            assert len(out[3]) == out[0] * out[1]
        except (ValueError, NotImplementedError):
            pass


# ------------------------------------------------------------------
# External conformance anchor (VERDICT r7 task #2): a progressive
# stream NOT produced by this repo's encoder.
# ------------------------------------------------------------------


def test_annex_g_handassembled_fixture_decodes_byte_exact():
    """The hand-assembled T.81 Annex G stream (built byte-by-byte from
    the spec -- DC first @ Al=1 with a negative cross-block diff, DC
    refinement bits, AC-first and AC-refinement EOB runs spanning two
    blocks) decodes to the EXACT hand-derived pixels. Breaks the
    encoder<->decoder self-reference: a mirrored systematic error in
    both legs cannot cancel here."""
    assert jpeg.decode_jpeg_meta(jpeg.ANNEX_G_FIXTURE) == (
        16, 8, 1, "progressive DCT",
    )
    w, h, nc, px = jpeg.decode_jpeg(jpeg.ANNEX_G_FIXTURE)
    assert (w, h, nc) == (16, 8, 1)
    assert px == jpeg.ANNEX_G_FIXTURE_PIXELS
    # derivation sanity: DC-only blocks are the constant DC/8 + 128
    assert jpeg.ANNEX_G_FIXTURE_PIXELS[:16] == [576 // 8 + 128] * 8 + [320 // 8 + 128] * 8


def test_annex_g_fixture_reencodes_and_survives_mutation():
    """Round the fixture's pixels through OUR progressive encoder and
    back: same pixels (constant blocks are DCT-exact at q95). And a
    truncated fixture fails loudly, not with a wrong decode."""
    px = [(v, v, v) for v in jpeg.ANNEX_G_FIXTURE_PIXELS]
    enc = jpeg.encode_jpeg_progressive(px, 16, 8, quality=95)
    assert jpeg.decode_jpeg(enc)[3] == px
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(jpeg.ANNEX_G_FIXTURE[:100])


def test_progressive_fixture_stats_operator(spark):
    """Spark leg of z104: the mapInPandas plumbing reports the exact
    hand-derived stats for every row."""
    from etl_world_banks_with_python_and_postgresql_spark.operators import multimodal

    docs = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
    rows = multimodal.decode_progressive_fixture_stats(docs).collect()
    assert len(rows) == 5
    for r in rows:
        assert (
            r["width"], r["height"], r["n_components"], r["n_pixels"],
            r["min_px"], r["max_px"], r["sum_px"],
        ) == (16, 8, 1, 128, 168, 200, 23552)
