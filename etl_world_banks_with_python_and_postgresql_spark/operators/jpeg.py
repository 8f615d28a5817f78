"""Pure-stdlib(+numpy) baseline JPEG codec (VERDICT r5 task #4).

Closes the last honest codec stub in the multimodal leg: JFIF baseline
sequential DCT (SOF0/SOF1) now encodes AND decodes here for real --
marker parse, DQT/DHT table handling (any canonical tables, 8- or
16-bit quant), interleaved MCU scan with per-component sampling factors
(4:4:4 / 4:2:2 / 4:2:0), restart markers, Huffman DC-diff/AC-RLE
entropy coding, dequantize + IDCT, chroma upsampling, YCbCr->RGB.
Progressive Huffman (SOF2, ITU T.81 Annex G) both encodes
(``encode_jpeg_progressive``: spectral selection + successive
approximation scan script, per-scan Huffman tables, EOB runs, restart
markers) and decodes (``_decode_progressive``); the two legs are pinned
against each other -- a progressive re-encode of the same quantized
coefficients must decode bit-identically to the baseline decode -- AND
against a hand-assembled Annex G stream (``ANNEX_G_FIXTURE``).
Lossless Huffman (SOF3, ITU T.81 Annex H) both encodes
(``encode_jpeg_lossless``: DPCM over the 7 spec predictors, 2..16-bit
precision, restart markers) and decodes (``_decode_lossless``);
round-trips are EXACT by construction and additionally pinned by a
hand-assembled Annex H stream. ``NotImplementedError`` remains ONLY
for the genuinely out-of-scope compression modes (differential,
hierarchical, arithmetic coding, subsampled-lossless MCUs) and for
WebP -- the environment's honest externally-coded boundary.

Determinism: every quantity is derived through fixed-op-order float64
(DCT basis built from ``math.cos`` literals; per-image block batches go
through one numpy matmul) followed by a single round+clip to uint8.
Constant-valued blocks round-trip EXACTLY at high quality (the DCT of
a constant is a lone DC coefficient; with the q>=90 DC step the
reconstruction error stays under half an intensity level --
hand-pinned in tests), which gives the test suite true hand-computed
anchors; smooth gradients round-trip within a small quantization bound.

Scale shape: the codec is plain bytes->arrays Python, always invoked
INSIDE Arrow-batched ``mapInPandas`` (operators/multimodal.py), so the
work distributes with the scan and no pixel ever crosses the driver.

Reference anchor: the reference repo has no media path at all
(pandas/bs4 over HTML tables); this leg exists for the LLM-pipeline
surface (SURVEY.md section on multimodal training data).
"""

from __future__ import annotations

import math
import struct

# ---------------------------------------------------------------------
# Tables
# ---------------------------------------------------------------------

# zigzag sequence: position i in the scan -> natural (row-major) index
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex-K-shaped base quantization tables (natural order)
QUANT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
QUANT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# Huffman table specs: (bits[1..16] code-length counts, symbol list).
# Encoder and decoder share these through the same canonical-code
# builder, and the decoder additionally accepts ANY valid DHT tables --
# internal validity (Kraft + counts) is asserted by the test suite.
HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    _AC_LUMA_VALS,
)
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    _AC_CHROMA_VALS,
)


def canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) under JPEG canonical code assignment.

    ValueError when the spec is inconsistent (counts != symbols) or
    overflows the code space (Kraft violation) -- the decoder runs this
    on DHT payloads, so malformed tables fail loudly instead of
    decoding garbage.
    """
    if sum(bits) != len(values):
        raise ValueError("huffman spec: count/symbol mismatch")
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if code >= (1 << length):
                raise ValueError("huffman spec overflows code space")
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_map(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for the bit-serial decoder."""
    return {
        (ln, code): sym for sym, (code, ln) in canonical_codes(bits, values).items()
    }


def _dct_matrix():
    import numpy as np

    t = np.zeros((8, 8), dtype=np.float64)
    for u in range(8):
        s = math.sqrt(0.125) if u == 0 else math.sqrt(0.25)
        for x in range(8):
            t[u, x] = s * math.cos((2 * x + 1) * u * math.pi / 16.0)
    return t


def _scaled_quant(base: list[int], quality: int) -> list[int]:
    """IJG quality scaling, clamped to the 8-bit DQT range."""
    q = max(1, min(100, quality))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return [max(1, min(255, (b * scale + 50) // 100)) for b in base]


# ---------------------------------------------------------------------
# Bit IO
# ---------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            b = (self._acc >> self._n) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        """Pad the partial byte with 1-bits (spec fill) and emit."""
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)


class _BitReader:
    """MSB-first entropy-segment reader with 0xFF00 unstuffing; stops at
    any real marker and records it in ``self.marker``."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0
        self.marker: int | None = None

    def _feed(self) -> None:
        if self.marker is not None:
            raise ValueError("jpeg: entropy data truncated at marker")
        if self.pos >= len(self.data):
            raise ValueError("jpeg: entropy data truncated")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("jpeg: dangling 0xFF")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed literal 0xFF
            else:
                self.pos -= 1  # leave marker unconsumed
                self.marker = nxt
                raise ValueError("jpeg: entropy data truncated at marker")
        self._acc = (self._acc << 8) | b
        self._n += 8

    def read_bit(self) -> int:
        if self._n == 0:
            self._feed()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_restart(self, expect: int) -> None:
        """Consume a restart marker at an MCU-run boundary."""
        self._acc = 0
        self._n = 0
        self.marker = None
        if (
            self.pos + 1 >= len(self.data)
            or self.data[self.pos] != 0xFF
            or self.data[self.pos + 1] != 0xD0 + expect
        ):
            raise ValueError(
                f"jpeg: expected RST{expect} at offset {self.pos}"
            )
        self.pos += 2


def _decode_huffman(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("jpeg: invalid Huffman code")


def _extend(v: int, t: int) -> int:
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _category(v: int) -> int:
    return abs(v).bit_length()


# ---------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------


def _prep_components(pixels, width, height, quality, subsample):
    """Shared encoder front half (baseline AND progressive): color
    transform, chroma subsampling, edge padding to the MCU grid, DCT +
    quantization. Returns ``(gray, comps, grids, q_luma, q_chroma,
    hmax, vmax, mcus_x, mcus_y)`` where ``comps`` is a list of
    ``(h_i, v_i, qid)`` and ``grids[ci]`` is an int64 array of shape
    ``(bh*bw, 64)`` -- one zigzag-ordered quantized block per row, in
    raster order over the padded ``bh x bw`` block grid
    (``bw = mcus_x*h_i``). Both encoders index the SAME grids, which is
    what makes the progressive-vs-baseline bit-exactness test possible.
    """
    import numpy as np

    if len(pixels) != width * height:
        raise ValueError("pixel count != width*height")
    if subsample not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsample!r}")
    gray = not isinstance(pixels[0], (tuple, list))
    t_mat = _dct_matrix()

    if gray:
        plane = np.asarray(pixels, dtype=np.float64).reshape(height, width)
        comps = [(1, 1, 0, plane)]  # (h, v, quant_id, plane)
        hmax = vmax = 1
    else:
        rgb = np.asarray(pixels, dtype=np.float64).reshape(height, width, 3)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
        if subsample == "420":
            hmax = vmax = 2
            comps = [(2, 2, 0, y), (1, 1, 1, cb), (1, 1, 1, cr)]
        else:
            hmax = vmax = 1
            comps = [(1, 1, 0, y), (1, 1, 1, cb), (1, 1, 1, cr)]

    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (width + mcu_w - 1) // mcu_w
    mcus_y = (height + mcu_h - 1) // mcu_h

    q_luma = _scaled_quant(QUANT_LUMA, quality)
    q_chroma = _scaled_quant(QUANT_CHROMA, quality)
    q_tabs = [
        np.asarray(q_luma, dtype=np.float64).reshape(8, 8),
        np.asarray(q_chroma, dtype=np.float64).reshape(8, 8),
    ]

    # pad planes (edge replication), downsample chroma by box mean,
    # then batch-DCT + quantize every 8x8 block of each plane at once
    meta = []
    grids = []
    for h_i, v_i, qid, plane in comps:
        full_w, full_h = mcus_x * mcu_w, mcus_y * mcu_h
        padded = np.pad(
            plane,
            ((0, full_h - plane.shape[0]), (0, full_w - plane.shape[1])),
            mode="edge",
        )
        fx, fy = hmax // h_i, vmax // v_i
        if fx > 1 or fy > 1:
            padded = padded.reshape(
                padded.shape[0] // fy, fy, padded.shape[1] // fx, fx
            ).mean(axis=(1, 3))
        bh, bw = padded.shape[0] // 8, padded.shape[1] // 8
        blk = padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3) - 128.0
        f = np.einsum("ij,rcjk,lk->rcil", t_mat, blk, t_mat)
        q = np.rint(f / q_tabs[qid]).astype(np.int64).reshape(bh * bw, 64)
        grids.append(q[:, ZIGZAG])
        meta.append((h_i, v_i, qid))
    return gray, meta, grids, q_luma, q_chroma, hmax, vmax, mcus_x, mcus_y


def _frame_headers(
    gray, comps, q_luma, q_chroma, width, height, sof_marker
) -> bytearray:
    """SOI + APP0 + DQT(s) + SOFn header prefix shared by the baseline
    (``sof_marker=0xC0``) and progressive (``0xC2``) encoders."""
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(
        ">H5sBBBHHBB", 16, b"JFIF\x00", 1, 1, 0, 1, 1, 0, 0
    )  # APP0
    n_q = 1 if gray else 2
    for qid, tab in enumerate([q_luma, q_chroma][:n_q]):
        zz_tab = bytes(tab[ZIGZAG[i]] for i in range(64))
        out += b"\xff\xdb" + struct.pack(">HB", 67, qid) + zz_tab
    ncomp = 1 if gray else 3
    sof = struct.pack(">HBHHB", 8 + 3 * ncomp, 8, height, width, ncomp)
    for ci in range(ncomp):
        h_i, v_i, qid = comps[ci]
        sof += struct.pack(">BBB", ci + 1, (h_i << 4) | v_i, qid)
    out += bytes([0xFF, sof_marker]) + sof
    return out


def encode_jpeg(
    pixels,
    width: int,
    height: int,
    quality: int = 95,
    subsample: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Baseline JFIF encoder. ``pixels`` is a row-major top-down list of
    (r, g, b) tuples, or of ints for a single-component grayscale image.
    ``subsample``: '444' (no chroma subsampling) or '420' (2x2 box-mean
    chroma). ``restart_interval`` > 0 emits DRI + RSTn markers every
    that many MCUs.
    """
    (gray, comps, grids, q_luma, q_chroma,
     hmax, vmax, mcus_x, mcus_y) = _prep_components(
        pixels, width, height, quality, subsample
    )

    dc_specs = [HUFF_DC_LUMA, HUFF_DC_CHROMA]
    ac_specs = [HUFF_AC_LUMA, HUFF_AC_CHROMA]
    dc_codes = [canonical_codes(*s) for s in dc_specs]
    ac_codes = [canonical_codes(*s) for s in ac_specs]

    w = _BitWriter()
    preds = [0] * len(comps)
    mcu_count = 0
    rst_idx = 0
    segments = []  # bytes chunks (entropy + restart markers)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                w.flush()
                segments.append(bytes(w.out))
                segments.append(bytes([0xFF, 0xD0 + rst_idx]))
                rst_idx = (rst_idx + 1) % 8
                w = _BitWriter()
                preds = [0] * len(comps)
            for ci, (h_i, v_i, _qid) in enumerate(comps):
                tid = 0 if ci == 0 else 1
                bw_ci = mcus_x * h_i
                for by in range(v_i):
                    for bx in range(h_i):
                        row = my * v_i + by
                        col = mx * h_i + bx
                        zz = grids[ci][row * bw_ci + col].tolist()
                        # DC
                        diff = zz[0] - preds[ci]
                        preds[ci] = zz[0]
                        t = _category(diff)
                        code, ln = dc_codes[tid][t]
                        w.write(code, ln)
                        if t:
                            w.write(
                                diff if diff >= 0 else diff + (1 << t) - 1, t
                            )
                        # AC
                        run = 0
                        for k in range(1, 64):
                            v = zz[k]
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                code, ln = ac_codes[tid][0xF0]  # ZRL
                                w.write(code, ln)
                                run -= 16
                            t = _category(v)
                            code, ln = ac_codes[tid][(run << 4) | t]
                            w.write(code, ln)
                            w.write(v if v >= 0 else v + (1 << t) - 1, t)
                            run = 0
                        if run:
                            code, ln = ac_codes[tid][0x00]  # EOB
                            w.write(code, ln)
            mcu_count += 1
    w.flush()
    segments.append(bytes(w.out))
    entropy = b"".join(segments)

    # ---- headers ----
    out = _frame_headers(gray, comps, q_luma, q_chroma, width, height, 0xC0)
    # DHT
    tables = [(0x00, dc_specs[0]), (0x10, ac_specs[0])]
    if not gray:
        tables += [(0x01, dc_specs[1]), (0x11, ac_specs[1])]
    for tc_th, (bits, vals) in tables:
        body = bytes([tc_th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    ncomp = len(comps)
    sos = struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        td_ta = 0x00 if ci == 0 else 0x11
        sos += struct.pack(">BB", ci + 1, td_ta)
    sos += struct.pack(">BBB", 0, 63, 0)
    out += b"\xff\xda" + sos
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _scan_huff_table(symbols):
    """Canonical Huffman table covering exactly one progressive scan's
    symbol set: every symbol gets the same code length L with
    2**L > n so the all-ones code stays unused (T.81 Annex C
    recommendation). Progressive streams carry per-scan DHTs because
    the EOBn symbols (r<<4 for r>0) don't exist in the standard
    baseline tables."""
    syms = sorted(set(symbols))
    if not syms:
        syms = [0x00]
    n = len(syms)
    if n > 255:
        # bits[] entries are single bytes in the DHT segment; a scan
        # alphabet can't exceed 256 symbols for 8-bit precision anyway
        # (ADVICE r7: guard the impossible case loudly, bytes(bits)
        # would otherwise raise an opaque ValueError at encode time)
        raise ValueError(
            f"scan alphabet has {n} symbols; a single-length canonical "
            "DHT holds at most 255 -- unreachable for 8-bit JPEG"
        )
    length = 8
    while (1 << length) <= n:
        length += 1
    bits = [0] * 16
    bits[length - 1] = n
    return bits, syms


def encode_jpeg_progressive(
    pixels,
    width: int,
    height: int,
    quality: int = 95,
    subsample: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Progressive (SOF2) JFIF encoder, ITU T.81 Annex G: spectral
    selection + successive approximation. Emits the SAME quantized
    coefficients as ``encode_jpeg`` (shared ``_prep_components``), so
    ``decode_jpeg`` of the progressive stream is bit-identical to the
    baseline decode of the same pixels -- the property the test suite
    pins. Scan script (color): interleaved DC first (Al=1), per-
    component AC first scans with split spectral bands at Al=2/1, DC
    refinement, then AC refinement passes down to Al=0, with per-scan
    Huffman tables (exercises inter-scan DHT), EOB runs, and optional
    restart markers (``restart_interval`` counts MCUs in interleaved DC
    scans, blocks elsewhere -- the T.81 data-unit rule).

    The refinement encoders are written as a positional simulation of
    the decoder's walk, so correction bits land exactly where
    ``_decode_progressive`` reads them.
    """
    (gray, comps, grids, q_luma, q_chroma,
     hmax, vmax, mcus_x, mcus_y) = _prep_components(
        pixels, width, height, quality, subsample
    )
    ncomp = len(comps)
    geom = []  # per ci: (h_i, v_i, bw, nb_x, nb_y)
    for ci, (h_i, v_i, _qid) in enumerate(comps):
        bw = mcus_x * h_i
        comp_w = (width * h_i + hmax - 1) // hmax
        comp_h = (height * v_i + vmax - 1) // vmax
        geom.append((h_i, v_i, bw, (comp_w + 7) // 8, (comp_h + 7) // 8))

    if gray:
        script = [
            ([0], 0, 0, 0, 1),    # DC first (single-component path)
            ([0], 1, 63, 0, 1),   # AC first
            ([0], 0, 0, 1, 0),    # DC refinement
            ([0], 1, 63, 1, 0),   # AC refinement
        ]
    else:
        script = [
            ([0, 1, 2], 0, 0, 0, 1),  # DC first, interleaved
            ([0], 1, 5, 0, 2),        # Y low band first @ Al=2
            ([1], 1, 63, 0, 1),       # Cb first
            ([2], 1, 63, 0, 1),       # Cr first
            ([0], 6, 63, 0, 2),       # Y high band first @ Al=2
            ([0], 1, 63, 2, 1),       # Y refine 2 -> 1
            ([0, 1, 2], 0, 0, 1, 0),  # DC refinement
            ([1], 1, 63, 1, 0),       # Cb refine 1 -> 0
            ([2], 1, 63, 1, 0),       # Cr refine 1 -> 0
            ([0], 1, 63, 1, 0),       # Y refine 1 -> 0
        ]

    def dc_ops(scomps, ah, al, ops):
        preds = [0] * ncomp
        unit = 0

        def block(ci, idx):
            v = int(grids[ci][idx][0])
            if ah == 0:
                tv = v >> al  # DC point transform is arithmetic shift
                diff = tv - preds[ci]
                preds[ci] = tv
                t = _category(diff)
                ops.append(("s", (0, 0 if ci == 0 else 1), t))
                if t:
                    ops.append(
                        ("b", diff if diff >= 0 else diff + (1 << t) - 1, t)
                    )
            else:
                ops.append(("b", (v >> al) & 1, 1))

        def maybe_rst():
            nonlocal preds
            if restart_interval and unit and unit % restart_interval == 0:
                ops.append(("rst",))
                preds = [0] * ncomp

        if len(scomps) > 1:
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    maybe_rst()
                    for ci in scomps:
                        h_i, v_i, bw = geom[ci][:3]
                        for by in range(v_i):
                            for bx in range(h_i):
                                block(
                                    ci,
                                    (my * v_i + by) * bw + (mx * h_i + bx),
                                )
                    unit += 1
        else:
            ci = scomps[0]
            _h, _v, bw, nb_x, nb_y = geom[ci]
            for row in range(nb_y):
                for col in range(nb_x):
                    maybe_rst()
                    block(ci, row * bw + col)
                    unit += 1

    def ac_first_ops(ci, ss, se, al, ops):
        key = (1, 0 if ci == 0 else 1)
        _h, _v, bw, nb_x, nb_y = geom[ci]
        eobrun = 0

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                r = eobrun.bit_length() - 1
                ops.append(("s", key, r << 4))
                if r:
                    ops.append(("b", eobrun - (1 << r), r))
                eobrun = 0

        unit = 0
        for row in range(nb_y):
            for col in range(nb_x):
                if restart_interval and unit and unit % restart_interval == 0:
                    flush_eob()
                    ops.append(("rst",))
                zz = grids[ci][row * bw + col]
                band = []
                for k in range(ss, se + 1):
                    v = int(zz[k])
                    m = abs(v) >> al  # magnitude shift per G.1.2.2
                    band.append(m if v >= 0 else -m)
                last = -1
                for i, tv in enumerate(band):
                    if tv:
                        last = i
                if last < 0:
                    eobrun += 1
                    if eobrun == 32767:
                        flush_eob()
                else:
                    flush_eob()
                    r = 0
                    for i in range(last + 1):
                        tv = band[i]
                        if tv == 0:
                            r += 1
                            continue
                        while r > 15:
                            ops.append(("s", key, 0xF0))  # ZRL
                            r -= 16
                        s = _category(tv)
                        ops.append(("s", key, (r << 4) | s))
                        ops.append(
                            ("b", tv if tv >= 0 else tv + (1 << s) - 1, s)
                        )
                        r = 0
                    if last < len(band) - 1:
                        eobrun += 1
                        if eobrun == 32767:
                            flush_eob()
                unit += 1
        flush_eob()

    def ac_refine_ops(ci, ss, se, al, ops):
        key = (1, 0 if ci == 0 else 1)
        _h, _v, bw, nb_x, nb_y = geom[ci]
        eobrun = 0
        pending: list[int] = []  # correction bits across EOB-run blocks

        def flush_eob():
            nonlocal eobrun, pending
            if eobrun:
                r = eobrun.bit_length() - 1
                ops.append(("s", key, r << 4))
                if r:
                    ops.append(("b", eobrun - (1 << r), r))
                for b in pending:
                    ops.append(("b", b, 1))
                eobrun = 0
                pending = []

        unit = 0
        for row in range(nb_y):
            for col in range(nb_x):
                if restart_interval and unit and unit % restart_interval == 0:
                    flush_eob()
                    ops.append(("rst",))
                zz = grids[ci][row * bw + col]
                # t: magnitude at this stage; hist: nonzero before this
                # scan; new: becomes nonzero in this scan (t == 1)
                t, sign = [], []
                for k in range(ss, se + 1):
                    v = int(zz[k])
                    t.append(abs(v) >> al)
                    sign.append(1 if v >= 0 else 0)
                n = len(t)
                cursor = 0
                while True:
                    np_i = -1
                    for i in range(cursor, n):
                        if t[i] == 1:
                            np_i = i
                            break
                    if np_i < 0:
                        break
                    flush_eob()
                    z = sum(
                        1 for i in range(cursor, np_i) if t[i] <= 1
                    )  # zero-history coefs to skip (t==1 impossible here)
                    while z > 15:
                        # ZRL: decoder walks forward correcting history
                        # coefs until 16 zero-history are consumed
                        ops.append(("s", key, 0xF0))
                        consumed = 0
                        while consumed < 16:
                            if t[cursor] > 1:
                                ops.append(("b", t[cursor] & 1, 1))
                            else:
                                consumed += 1
                            cursor += 1
                        z -= 16
                    ops.append(("s", key, (z << 4) | 1))
                    ops.append(("b", sign[np_i], 1))
                    # corrections for history coefs the decoder passes
                    # between cursor and the placement position
                    for i in range(cursor, np_i):
                        if t[i] > 1:
                            ops.append(("b", t[i] & 1, 1))
                    cursor = np_i + 1
                if cursor < n:
                    # remaining positions: EOB covers them; history
                    # corrections ride in the post-EOBn bit budget
                    eobrun += 1
                    pending.extend(
                        t[i] & 1 for i in range(cursor, n) if t[i] > 1
                    )
                    if eobrun == 32767 or len(pending) > 4000:
                        flush_eob()
                unit += 1
        flush_eob()

    # ---- assemble: per-scan symbol stats -> per-scan DHT + SOS ----
    out = _frame_headers(gray, comps, q_luma, q_chroma, width, height, 0xC2)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    for scomps, ss, se, ah, al in script:
        ops: list[tuple] = []
        if ss == 0:
            dc_ops(scomps, ah, al, ops)
        elif ah == 0:
            ac_first_ops(scomps[0], ss, se, al, ops)
        else:
            ac_refine_ops(scomps[0], ss, se, al, ops)
        # per-scan Huffman tables from actual symbol usage
        by_key: dict[tuple[int, int], list[int]] = {}
        for op in ops:
            if op[0] == "s":
                by_key.setdefault(op[1], []).append(op[2])
        codes = {}
        for key_tc_th in sorted(by_key):
            bits, vals = _scan_huff_table(by_key[key_tc_th])
            codes[key_tc_th] = canonical_codes(bits, vals)
            tc, th = key_tc_th
            body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
            out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
        # SOS header
        ns = len(scomps)
        sos = struct.pack(">HB", 6 + 2 * ns, ns)
        for ci in scomps:
            tid = 0 if ci == 0 else 1
            td = tid if (ss == 0 and ah == 0) else 0
            ta = tid if ss > 0 else 0
            sos += struct.pack(">BB", ci + 1, (td << 4) | ta)
        sos += struct.pack(">BBB", ss, se, (ah << 4) | al)
        out += b"\xff\xda" + sos
        # entropy-coded segment
        w = _BitWriter()
        rst_idx = 0
        for op in ops:
            if op[0] == "s":
                code, ln = codes[op[1]][op[2]]
                w.write(code, ln)
            elif op[0] == "b":
                w.write(op[1], op[2])
            else:  # restart
                w.flush()
                out += bytes(w.out)
                out += bytes([0xFF, 0xD0 + rst_idx])
                rst_idx = (rst_idx + 1) % 8
                w = _BitWriter()
        w.flush()
        out += bytes(w.out)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------

_PROGRESSIVE_SOFS = {
    0xC2: "progressive DCT (SOF2)",
    0xC3: "lossless (SOF3)",
    0xC5: "differential sequential (SOF5)",
    0xC6: "differential progressive (SOF6)",
    0xC7: "differential lossless (SOF7)",
    0xC9: "arithmetic sequential (SOF9)",
    0xCA: "arithmetic progressive (SOF10)",
    0xCB: "arithmetic lossless (SOF11)",
    0xCD: "differential arithmetic sequential (SOF13)",
    0xCE: "differential arithmetic progressive (SOF14)",
    0xCF: "differential arithmetic lossless (SOF15)",
}


def _parse_dqt(body: bytes, quant: dict[int, list[int]]) -> None:
    i = 0
    while i < len(body):
        pq, tq = body[i] >> 4, body[i] & 0xF
        i += 1
        n = 64 * (2 if pq else 1)
        raw = body[i : i + n]
        if len(raw) < n:
            raise ValueError("jpeg: truncated DQT")
        if pq:
            vals = list(struct.unpack(f">{64}H", raw))
        else:
            vals = list(raw)
        nat = [0] * 64
        for k in range(64):
            nat[ZIGZAG[k]] = vals[k]
        quant[tq] = nat
        i += n


def _parse_dht(body: bytes, huff: dict) -> None:
    i = 0
    while i < len(body):
        tc, th = body[i] >> 4, body[i] & 0xF
        if tc > 1:
            raise ValueError("jpeg: DHT class must be 0 or 1")
        bits = list(body[i + 1 : i + 17])
        n = sum(bits)
        if len(bits) < 16 or len(body) < i + 17 + n:
            raise ValueError("jpeg: truncated DHT")
        vals = list(body[i + 17 : i + 17 + n])
        huff[(tc, th)] = _decode_map(bits, vals)
        i += 17 + n


def _reconstruct_pixels(plane_specs, quant, w_, h, hmax, vmax):
    """Shared dequantize + batched IDCT + upsample + color-convert tail
    of both decode paths. ``plane_specs``: per component in SOF order,
    (coeff_rows x 64 int array, bw, bh, h_i, v_i, qid)."""
    import numpy as np

    t_mat = _dct_matrix()
    planes = []
    for coeffs, bw, bh, h_i, v_i, qid in plane_specs:
        zz = coeffs.astype(np.float64)
        nat = np.zeros_like(zz)
        nat[:, ZIGZAG] = zz  # de-zigzag: natural[ZIGZAG[k]] = zz[k]
        q = np.asarray(quant[qid], dtype=np.float64)
        blocks = (nat * q).reshape(-1, 8, 8)
        spatial = np.einsum("ux,nuv,vy->nxy", t_mat, blocks, t_mat) + 128.0
        plane = np.zeros((bh * 8, bw * 8))
        for i in range(bh):
            for j in range(bw):
                plane[i * 8 : i * 8 + 8, j * 8 : j * 8 + 8] = spatial[
                    i * bw + j
                ]
        fx, fy = hmax // h_i, vmax // v_i
        if fx > 1 or fy > 1:
            plane = np.repeat(np.repeat(plane, fy, axis=0), fx, axis=1)
        planes.append(plane[:h, :w_])

    if len(planes) == 1:
        px = np.clip(np.rint(planes[0]), 0, 255).astype(np.int64)
        return w_, h, 1, [int(v) for v in px.reshape(-1)]
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    rgb = np.clip(
        np.rint(np.stack([r, g, b], axis=-1)), 0, 255
    ).astype(np.int64)
    flat = rgb.reshape(-1, 3)
    return w_, h, 3, [tuple(int(c) for c in p) for p in flat]


def decode_jpeg_meta(data: bytes) -> tuple[int, int, int, str]:
    """Header-only parse: (width, height, n_components, mode). Walks the
    marker stream to the first SOF without touching entropy data."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: bad SOI")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("jpeg: marker desync in header walk")
        marker = data[pos + 1]
        if marker in (0xC0, 0xC1) or marker in _PROGRESSIVE_SOFS:
            if pos + 10 > len(data):
                raise ValueError("jpeg: truncated SOF in header walk")
            h, w_, nc = struct.unpack(">HHB", data[pos + 5 : pos + 10])
            mode = (
                "baseline"
                if marker in (0xC0, 0xC1)
                else _PROGRESSIVE_SOFS[marker].split(" (")[0]
            )
            return w_, h, nc, mode
        if marker == 0xD9 or marker == 0xDA:
            break
        seg_len = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        pos += 2 + seg_len
    raise ValueError("jpeg: no SOF marker found")


def decode_jpeg(data: bytes, max_pixels: int = 1 << 26):
    """Full decode: baseline sequential (SOF0/SOF1) and progressive
    Huffman (SOF2). Returns ``(width, height, n_components, pixels)``:
    pixels is a row-major top-down list of ints (grayscale) or
    (r, g, b) tuples (color). ValueError on corrupt bytes;
    NotImplementedError for lossless / hierarchical / arithmetic modes.

    ``max_pixels`` (default 64M) is the decompression-bomb guard every
    real decoder carries: a corrupt/hostile SOF claiming 65535 x 65535
    would otherwise commit the worker to billions of MCU iterations
    before the (truncated) entropy data could object. Raise it for
    genuinely huge images.
    """
    import numpy as np

    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: bad SOI")
    pos = 2
    quant: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    sof = None
    restart_interval = 0
    scan = None
    progressive = False
    lossless_sof = None
    while True:
        if pos + 2 > len(data):
            raise ValueError("jpeg: truncated before SOS")
        if data[pos] != 0xFF:
            raise ValueError("jpeg: marker desync")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD8:
            continue
        if marker == 0xD9:
            raise ValueError("jpeg: EOI before scan data")
        if pos + 2 > len(data):
            raise ValueError("jpeg: truncated segment length")
        seg_len = struct.unpack(">H", data[pos : pos + 2])[0]
        body = data[pos + 2 : pos + seg_len]
        if len(body) != seg_len - 2:
            raise ValueError("jpeg: truncated segment")
        if marker in _PROGRESSIVE_SOFS and marker not in (0xC2, 0xC3):
            raise NotImplementedError(
                f"jpeg {_PROGRESSIVE_SOFS[marker]} decoding needs an "
                "external codec; baseline sequential (SOF0/SOF1), "
                "progressive Huffman (SOF2) and lossless Huffman (SOF3) "
                "are decoded here"
            )
        if marker == 0xC3:  # lossless: own frame-header rules (P up to 16)
            if len(body) < 6:
                raise ValueError("jpeg: truncated SOF")
            precision, h, w_, nc = struct.unpack(">BHHB", body[:6])
            if len(body) < 6 + 3 * nc:
                raise ValueError("jpeg: SOF shorter than component list")
            if not (2 <= precision <= 16):
                raise ValueError(
                    f"jpeg: lossless precision {precision} out of the "
                    "spec's 2..16 range"
                )
            comps = []
            for ci in range(nc):
                cid, hv, _tq = struct.unpack(
                    ">BBB", body[6 + 3 * ci : 9 + 3 * ci]
                )
                comps.append((cid, hv >> 4, hv & 0xF))
            lossless_sof = (precision, w_, h, comps)
            sof = (w_, h, [(c, hh, vv, 0) for c, hh, vv in comps])
            pos += seg_len
            continue
        if marker == 0xC2:
            progressive = True
            marker = 0xC0  # parse the identical frame header below
        if marker in (0xC0, 0xC1):  # SOF0 / SOF1 (or SOF2 frame header)
            if len(body) < 6:
                raise ValueError("jpeg: truncated SOF")
            precision, h, w_, nc = struct.unpack(">BHHB", body[:6])
            if len(body) < 6 + 3 * nc:
                raise ValueError("jpeg: SOF shorter than component list")
            if precision != 8:
                raise NotImplementedError(
                    f"jpeg {precision}-bit precision not decoded here"
                )
            comps = []
            for ci in range(nc):
                cid, hv, qid = struct.unpack(
                    ">BBB", body[6 + 3 * ci : 9 + 3 * ci]
                )
                comps.append((cid, hv >> 4, hv & 0xF, qid))
            sof = (w_, h, comps)
        elif marker == 0xDB:  # DQT (possibly several tables)
            _parse_dqt(body, quant)
        elif marker == 0xC4:  # DHT (possibly several tables)
            _parse_dht(body, huff)
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise ValueError("jpeg: truncated DRI")
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS
            if lossless_sof is not None:
                # hand the whole scan sequence to the lossless decoder
                # (pos - 2 points back at the 0xFF of this SOS marker)
                return _decode_lossless(
                    data, pos - 2, lossless_sof, huff,
                    restart_interval, max_pixels,
                )
            if progressive:
                # hand the whole scan sequence (incl. this SOS and any
                # inter-scan DHT/DQT/DRI) to the progressive decoder;
                # pos - 2 points back at the 0xFF of this SOS marker
                return _decode_progressive(
                    data, pos - 2, sof, quant, huff,
                    restart_interval, max_pixels,
                )
            if len(body) < 1 or len(body) < 1 + 2 * body[0] + 3:
                raise ValueError("jpeg: truncated SOS header")
            ns = body[0]
            mapping = []
            for si in range(ns):
                cs, tdta = body[1 + 2 * si], body[2 + 2 * si]
                mapping.append((cs, tdta >> 4, tdta & 0xF))
            scan = mapping
            pos += seg_len
            break
        # APPn / COM / others: skip
        pos += seg_len

    if sof is None:
        raise ValueError("jpeg: SOS before SOF")
    w_, h, comps = sof
    if w_ <= 0 or h <= 0:
        raise ValueError("jpeg: non-positive dimensions")
    if w_ * h > max_pixels:
        raise ValueError(
            f"jpeg: {w_}x{h} exceeds max_pixels={max_pixels} "
            "(decompression-bomb guard; pass a larger max_pixels for "
            "genuinely huge images)"
        )
    if not comps or len(comps) > 4:
        raise ValueError(f"jpeg: unsupported component count {len(comps)}")
    for _cid, h_i, v_i, _qid in comps:
        if not (1 <= h_i <= 4 and 1 <= v_i <= 4):
            raise ValueError("jpeg: sampling factors out of range")
    if len(scan) != len(comps):
        raise NotImplementedError(
            "jpeg multi-scan (non-interleaved) streams not decoded here"
        )
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w_ + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h

    by_id = {cid: (h_i, v_i, qid) for cid, h_i, v_i, qid in comps}
    order = []  # (comp_index, dc_table, ac_table, h_i, v_i, qid)
    for ci, (cs, td, ta) in enumerate(scan):
        if cs not in by_id:
            raise ValueError("jpeg: scan references unknown component")
        h_i, v_i, qid = by_id[cs]
        if (0, td) not in huff or (1, ta) not in huff:
            raise ValueError("jpeg: scan references missing Huffman table")
        if qid not in quant:
            raise ValueError("jpeg: component references missing DQT")
        order.append((ci, huff[(0, td)], huff[(1, ta)], h_i, v_i, qid))

    reader = _BitReader(data, pos)
    preds = [0] * len(comps)
    # per component: flat list of zigzag-coeff blocks in raster order
    nblocks = [
        (mcus_x * h_i, mcus_y * v_i) for _, _, _, h_i, v_i, _ in order
    ]
    coeff_store = [
        np.zeros((bw * bh, 64), dtype=np.int32) for bw, bh in nblocks
    ]
    mcu_count = 0
    rst_idx = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                reader.align_restart(rst_idx)
                rst_idx = (rst_idx + 1) % 8
                preds = [0] * len(comps)
            for slot, (ci, dc_t, ac_t, h_i, v_i, _qid) in enumerate(order):
                bw = nblocks[slot][0]
                for by in range(v_i):
                    for bx in range(h_i):
                        zz = [0] * 64
                        t = _decode_huffman(reader, dc_t)
                        if t > 15:
                            # spec bound (<=11 for 8-bit baseline); a
                            # corrupt DHT can map any byte here, and an
                            # unbounded t means an unbounded magnitude
                            raise ValueError(
                                f"jpeg: DC category {t} out of range"
                            )
                        diff = _extend(reader.read_bits(t), t) if t else 0
                        preds[ci] += diff
                        if abs(preds[ci]) > (1 << 20):
                            raise ValueError("jpeg: DC predictor diverged")
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = _decode_huffman(reader, ac_t)
                            run, size = rs >> 4, rs & 0xF
                            if size == 0:
                                if run == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise ValueError("jpeg: AC index overrun")
                            zz[k] = _extend(reader.read_bits(size), size)
                            k += 1
                        row = my * v_i + by
                        col = mx * h_i + bx
                        coeff_store[slot][row * bw + col] = zz
            mcu_count += 1

    # dequantize + batched IDCT + assemble planes (shared tail)
    plane_specs = [
        (coeff_store[slot], nblocks[slot][0], nblocks[slot][1], h_i, v_i, qid)
        for slot, (_ci, _dc, _ac, h_i, v_i, qid) in enumerate(order)
    ]
    return _reconstruct_pixels(plane_specs, quant, w_, h, hmax, vmax)


def _decode_progressive(
    data: bytes,
    pos: int,
    sof,
    quant: dict,
    huff: dict,
    restart_interval: int,
    max_pixels: int,
):
    """Progressive (SOF2) scan-sequence decoder: spectral selection +
    successive approximation per ITU T.81 Annex G, including EOB runs,
    DC/AC refinement passes, inter-scan DHT/DQT/DRI updates and restart
    markers. ``pos`` points at the 0xFF of the FIRST SOS marker; state
    parsed so far (frame header, tables) is passed in. Coefficients
    accumulate per component across scans; reconstruction reuses the
    baseline dequant + IDCT tail."""
    import numpy as np

    if sof is None:
        raise ValueError("jpeg: SOS before SOF")
    w_, h, comps = sof
    if w_ <= 0 or h <= 0:
        raise ValueError("jpeg: non-positive dimensions")
    if w_ * h > max_pixels:
        raise ValueError(
            f"jpeg: {w_}x{h} exceeds max_pixels={max_pixels} "
            "(decompression-bomb guard; pass a larger max_pixels for "
            "genuinely huge images)"
        )
    if not comps or len(comps) > 4:
        raise ValueError(f"jpeg: unsupported component count {len(comps)}")
    for _cid, h_i, v_i, _qid in comps:
        if not (1 <= h_i <= 4 and 1 <= v_i <= 4):
            raise ValueError("jpeg: sampling factors out of range")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = (w_ + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)

    by_id: dict[int, int] = {}
    geom = []  # per ci: (h_i, v_i, qid, bw, bh, nb_x, nb_y)
    stores = []
    for ci, (cid, h_i, v_i, qid) in enumerate(comps):
        by_id[cid] = ci
        bw, bh = mcus_x * h_i, mcus_y * v_i
        comp_w = (w_ * h_i + hmax - 1) // hmax
        comp_h = (h * v_i + vmax - 1) // vmax
        nb_x, nb_y = (comp_w + 7) // 8, (comp_h + 7) // 8
        geom.append((h_i, v_i, qid, bw, bh, nb_x, nb_y))
        stores.append(np.zeros((bw * bh, 64), dtype=np.int32))
    preds = [0] * len(comps)  # reset at each scan start / restart

    def decode_scan(scomps, ss, se, ah, al, start_pos):
        nonlocal preds
        reader = _BitReader(data, start_pos)
        eobrun = 0
        preds = [0] * len(comps)
        rst_idx = 0
        unit = 0

        def maybe_restart():
            nonlocal rst_idx, eobrun, preds
            if restart_interval and unit and unit % restart_interval == 0:
                reader.align_restart(rst_idx)
                rst_idx = (rst_idx + 1) % 8
                preds = [0] * len(comps)
                eobrun = 0

        def dc_block(ci, td, coef):
            if ah == 0:
                t = _decode_huffman(reader, huff[(0, td)])
                if t > 15:
                    raise ValueError(f"jpeg: DC category {t} out of range")
                diff = _extend(reader.read_bits(t), t) if t else 0
                preds[ci] += diff
                if abs(preds[ci]) > (1 << 20):
                    raise ValueError("jpeg: DC predictor diverged")
                coef[0] = preds[ci] << al
            else:
                if reader.read_bit():
                    coef[0] |= 1 << al

        def ac_first(ta, coef):
            nonlocal eobrun
            if eobrun > 0:
                eobrun -= 1
                return
            k = ss
            while k <= se:
                rs = _decode_huffman(reader, huff[(1, ta)])
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r != 15:
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += reader.read_bits(r)
                        break
                    k += 16  # ZRL
                else:
                    k += r
                    if k > se:
                        raise ValueError("jpeg: AC band index overrun")
                    coef[k] = _extend(reader.read_bits(s), s) << al
                    k += 1

        def ac_refine(ta, coef):
            nonlocal eobrun
            p1, m1 = 1 << al, -(1 << al)

            def correct(k):
                if reader.read_bit() and (coef[k] & p1) == 0:
                    coef[k] = coef[k] + (p1 if coef[k] >= 0 else m1)

            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = _decode_huffman(reader, huff[(1, ta)])
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r != 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += reader.read_bits(r)
                            break
                        val = 0  # ZRL: skip 16 zero-history positions
                    else:
                        if s != 1:
                            raise ValueError(
                                "jpeg: AC refinement magnitude must be 1"
                            )
                        val = p1 if reader.read_bit() else m1
                    while k <= se:
                        if coef[k] != 0:
                            correct(k)
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if s:
                        if k > se:
                            raise ValueError(
                                "jpeg: AC refinement placement overrun"
                            )
                        coef[k] = val
                    k += 1
            if eobrun > 0:
                while k <= se:
                    if coef[k] != 0:
                        correct(k)
                    k += 1
                eobrun -= 1

        if ss == 0:  # DC scan (interleaved when ns > 1)
            if se != 0:
                raise ValueError("jpeg: DC scan must have Se = 0")
            if len(scomps) > 1:
                for my in range(mcus_y):
                    for mx in range(mcus_x):
                        maybe_restart()
                        for ci, td, _ta in scomps:
                            h_i, v_i, _q, bw = geom[ci][:4]
                            st = stores[ci]
                            for by in range(v_i):
                                for bx in range(h_i):
                                    row = my * v_i + by
                                    col = mx * h_i + bx
                                    dc_block(ci, td, st[row * bw + col])
                        unit += 1
            else:
                ci, td, _ta = scomps[0]
                _h, _v, _q, bw, _bh, nb_x, nb_y = geom[ci]
                st = stores[ci]
                for row in range(nb_y):
                    for col in range(nb_x):
                        maybe_restart()
                        dc_block(ci, td, st[row * bw + col])
                        unit += 1
        else:  # AC scan: always non-interleaved
            if len(scomps) != 1:
                raise ValueError("jpeg: AC scans must have one component")
            if not (1 <= ss <= se <= 63):
                raise ValueError("jpeg: bad spectral band")
            ci, _td, ta = scomps[0]
            _h, _v, _q, bw, _bh, nb_x, nb_y = geom[ci]
            st = stores[ci]
            body = ac_refine if ah else ac_first
            for row in range(nb_y):
                for col in range(nb_x):
                    maybe_restart()
                    body(ta, st[row * bw + col])
                    unit += 1
        return reader.pos

    # ---- marker walk over the scan sequence ----
    while True:
        if pos + 2 > len(data):
            raise ValueError("jpeg: truncated scan sequence")
        if data[pos] != 0xFF:
            raise ValueError("jpeg: marker desync in scan sequence")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if pos + 2 > len(data):
            raise ValueError("jpeg: truncated segment length")
        seg_len = struct.unpack(">H", data[pos : pos + 2])[0]
        body = data[pos + 2 : pos + seg_len]
        if len(body) != seg_len - 2:
            raise ValueError("jpeg: truncated segment")
        if marker == 0xDB:
            _parse_dqt(body, quant)
        elif marker == 0xC4:
            _parse_dht(body, huff)
        elif marker == 0xDD:
            if len(body) < 2:
                raise ValueError("jpeg: truncated DRI")
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:
            if len(body) < 1 or len(body) < 1 + 2 * body[0] + 3:
                raise ValueError("jpeg: truncated SOS header")
            ns = body[0]
            scomps = []
            for si in range(ns):
                cs, tdta = body[1 + 2 * si], body[2 + 2 * si]
                if cs not in by_id:
                    raise ValueError("jpeg: scan references unknown component")
                ci, td, ta = by_id[cs], tdta >> 4, tdta & 0xF
                scomps.append((ci, td, ta))
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            # table presence: DC first needs its DC table, AC scans
            # their AC table; refinement DC scans read raw bits only
            for ci, td, ta in scomps:
                if ss == 0 and ah == 0 and (0, td) not in huff:
                    raise ValueError("jpeg: missing DC Huffman table")
                if ss > 0 and (1, ta) not in huff:
                    raise ValueError("jpeg: missing AC Huffman table")
            end = decode_scan(scomps, ss, se, ah, al, pos + seg_len)
            # resume the marker walk at the next true marker (skip
            # entropy fill bytes and any stray RSTn)
            p = end
            while True:
                if p + 1 >= len(data):
                    raise ValueError("jpeg: truncated after scan")
                if data[p] == 0xFF and data[p + 1] != 0x00:
                    if 0xD0 <= data[p + 1] <= 0xD7:
                        p += 2
                        continue
                    break
                p += 1
            pos = p
            continue
        elif marker in (0xC0, 0xC1, 0xC2) or marker in _PROGRESSIVE_SOFS:
            raise ValueError("jpeg: second frame header in scan sequence")
        pos += seg_len

    for _h_i, _v_i, qid, *_ in geom:
        if qid not in quant:
            raise ValueError("jpeg: component references missing DQT")
    plane_specs = [
        (stores[ci], bw, bh, h_i, v_i, qid)
        for ci, (h_i, v_i, qid, bw, bh, _nx, _ny) in enumerate(geom)
    ]
    return _reconstruct_pixels(plane_specs, quant, w_, h, hmax, vmax)


# ---------------------------------------------------------------------
# Lossless JPEG (SOF3, ITU T.81 Annex H): DPCM prediction + Huffman
# ---------------------------------------------------------------------

#: T.81 H.1.2.1 predictor selections (Ss in a lossless scan header).
#: Ra = left, Rb = above, Rc = above-left; integer arithmetic exactly
#: as specified (>> is the spec's shift-right).
LOSSLESS_PREDICTORS = {
    1: lambda ra, rb, rc: ra,
    2: lambda ra, rb, rc: rb,
    3: lambda ra, rb, rc: rc,
    4: lambda ra, rb, rc: ra + rb - rc,
    5: lambda ra, rb, rc: ra + ((rb - rc) >> 1),
    6: lambda ra, rb, rc: rb + ((ra - rc) >> 1),
    7: lambda ra, rb, rc: (ra + rb) >> 1,
}


def _decode_lossless(
    data: bytes,
    pos: int,
    sof,
    huff: dict,
    restart_interval: int,
    max_pixels: int,
):
    """Lossless (SOF3) scan-sequence decoder per ITU T.81 Annex H:
    per-sample DPCM with the 7 spec predictors, Huffman-coded
    difference categories (SSSS up to 16, where 16 means diff=32768
    with no extra bits), modulo-2^16 reconstruction, point transform,
    restart markers (per H.1.2.1 the first sample after a restart
    predicts from the 2^(P-Pt-1) default and the REST of that line uses
    the one-dimensional Ra predictor, regardless of the selected
    predictor), and inter-scan DHT/DRI updates. ``pos`` points at
    the 0xFF of the first SOS. Components are returned AS STORED --
    T.81 defines no color transform for the lossless process.

    Scope: sampling factors must be 1x1 (the overwhelmingly common
    lossless layout; subsampled lossless MCUs raise
    NotImplementedError rather than decode wrongly)."""
    precision, w_, h, comps = sof
    if w_ <= 0 or h <= 0:
        raise ValueError("jpeg: non-positive dimensions")
    if w_ * h > max_pixels:
        raise ValueError(
            f"jpeg: {w_}x{h} exceeds max_pixels={max_pixels} "
            "(decompression-bomb guard)"
        )
    if not comps or len(comps) > 4:
        raise ValueError(f"jpeg: unsupported component count {len(comps)}")
    for _cid, h_i, v_i in comps:
        if (h_i, v_i) != (1, 1):
            raise NotImplementedError(
                "jpeg lossless with subsampled components is not decoded "
                "here (1x1 sampling only)"
            )
    by_id = {cid: ci for ci, (cid, _h, _v) in enumerate(comps)}
    planes = [[0] * (w_ * h) for _ in comps]  # point-transformed domain
    pt_of = [0] * len(comps)
    scanned: set[int] = set()

    def decode_scan(scomps, pred_sel, pt, start_pos):
        reader = _BitReader(data, start_pos)
        default = 1 << (precision - pt - 1)
        fresh = {ci: True for ci, _td in scomps}  # scan start / restart
        # H.1.2.1: the one-dimensional predictor (Ra) is used for the
        # first line of samples at the start of the scan AND at the
        # beginning of each restart interval -- not just the first
        # sample. Track which raster line is that "first line".
        ra_line = 0
        rst_idx = 0
        unit = 0
        predict = LOSSLESS_PREDICTORS[pred_sel]

        def sample(ci, td, x, y):
            t = _decode_huffman(reader, huff[(0, td)])
            if t > 16:
                raise ValueError(f"jpeg: lossless SSSS {t} out of range")
            diff = 32768 if t == 16 else _extend(reader.read_bits(t), t)
            plane = planes[ci]
            if fresh[ci]:
                px = default
                fresh[ci] = False
            elif y == ra_line:
                px = plane[y * w_ + x - 1]  # first line of scan/interval: Ra
            elif x == 0:
                px = plane[(y - 1) * w_ + x]  # first column: Rb
            else:
                px = predict(
                    plane[y * w_ + x - 1],
                    plane[(y - 1) * w_ + x],
                    plane[(y - 1) * w_ + x - 1],
                )
            plane[y * w_ + x] = (px + diff) & 0xFFFF  # mod 2^16 (H.1.2.2)

        for y in range(h):
            for x in range(w_):
                if restart_interval and unit and unit % restart_interval == 0:
                    reader.align_restart(rst_idx)
                    rst_idx = (rst_idx + 1) % 8
                    for ci, _td in scomps:
                        fresh[ci] = True
                    ra_line = y  # rest of this line predicts with Ra
                for ci, td in scomps:
                    sample(ci, td, x, y)
                unit += 1
        return reader.pos

    # ---- marker walk over the scan sequence (same shape as progressive)
    while True:
        if pos + 2 > len(data):
            raise ValueError("jpeg: truncated scan sequence")
        if data[pos] != 0xFF:
            raise ValueError("jpeg: marker desync in scan sequence")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if pos + 2 > len(data):
            raise ValueError("jpeg: truncated segment length")
        seg_len = struct.unpack(">H", data[pos : pos + 2])[0]
        body = data[pos + 2 : pos + seg_len]
        if len(body) != seg_len - 2:
            raise ValueError("jpeg: truncated segment")
        if marker == 0xC4:
            _parse_dht(body, huff)
        elif marker == 0xDD:
            if len(body) < 2:
                raise ValueError("jpeg: truncated DRI")
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:
            if len(body) < 1 or len(body) < 1 + 2 * body[0] + 3:
                raise ValueError("jpeg: truncated SOS header")
            ns = body[0]
            scomps = []
            for si in range(ns):
                cs, tdta = body[1 + 2 * si], body[2 + 2 * si]
                if cs not in by_id:
                    raise ValueError("jpeg: scan references unknown component")
                ci, td = by_id[cs], tdta >> 4
                if (0, td) not in huff:
                    raise ValueError("jpeg: missing DC Huffman table")
                scomps.append((ci, td))
            pred_sel, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            pt = ahal & 0xF
            if pred_sel not in LOSSLESS_PREDICTORS:
                raise ValueError(
                    f"jpeg: lossless predictor {pred_sel} out of 1..7"
                )
            if se != 0 or (ahal >> 4) != 0:
                raise ValueError("jpeg: bad lossless scan header (Se/Ah)")
            if pt >= precision:
                raise ValueError("jpeg: point transform >= precision")
            for ci, _td in scomps:
                pt_of[ci] = pt
                scanned.add(ci)
            end = decode_scan(scomps, pred_sel, pt, pos + seg_len)
            p = end
            while True:
                if p + 1 >= len(data):
                    raise ValueError("jpeg: truncated after scan")
                if data[p] == 0xFF and data[p + 1] != 0x00:
                    if 0xD0 <= data[p + 1] <= 0xD7:
                        p += 2
                        continue
                    break
                p += 1
            pos = p
            continue
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3) or marker in _PROGRESSIVE_SOFS:
            raise ValueError("jpeg: second frame header in scan sequence")
        pos += seg_len

    if scanned != set(range(len(comps))):
        raise ValueError("jpeg: lossless stream left components unscanned")
    out_planes = [
        [v << pt_of[ci] for v in plane] for ci, plane in enumerate(planes)
    ]
    if len(comps) == 1:
        return w_, h, 1, out_planes[0]
    px = list(zip(*out_planes))
    return w_, h, len(comps), px


def encode_jpeg_lossless(
    pixels,
    width: int,
    height: int,
    predictor: int = 1,
    precision: int = 8,
    point_transform: int = 0,
    restart_interval: int = 0,
) -> bytes:
    """Lossless (SOF3) encoder, ITU T.81 Annex H: DPCM with the selected
    predictor (1..7), canonical Huffman difference categories, optional
    restart markers (mirroring H.1.2.1: after a restart the first
    sample predicts from the default and the rest of that line from
    Ra). ``decode_jpeg`` of the output reproduces the input
    EXACTLY (bit-for-bit) when ``point_transform`` is 0 -- the property
    the tests pin for every predictor. ``pixels`` is a row-major list of
    ints (one component) or equal-length tuples (2..4 components,
    stored as given -- lossless JPEG defines no color transform)."""
    if predictor not in LOSSLESS_PREDICTORS:
        raise ValueError(f"predictor {predictor} out of 1..7")
    if not (2 <= precision <= 16):
        raise ValueError("precision out of 2..16")
    if not (0 <= point_transform < precision):
        raise ValueError("point transform out of range")
    if len(pixels) != width * height:
        raise ValueError("pixel count != width*height")
    first = pixels[0]
    if isinstance(first, (tuple, list)):
        ncomp = len(first)
        planes = [[int(p[c]) for p in pixels] for c in range(ncomp)]
    else:
        ncomp = 1
        planes = [[int(p) for p in pixels]]
    if not (1 <= ncomp <= 4):
        raise ValueError(f"{ncomp} components out of 1..4")
    maxval = (1 << precision) - 1
    for plane in planes:
        for v in plane:
            if not (0 <= v <= maxval):
                raise ValueError(
                    f"sample {v} out of range for {precision}-bit precision"
                )
    pt = point_transform
    planes = [[v >> pt for v in plane] for plane in planes]
    default = 1 << (precision - pt - 1)
    predict = LOSSLESS_PREDICTORS[predictor]

    # ---- DPCM difference pass (mirrors _decode_lossless exactly) ----
    diffs: list[tuple[int, int]] = []  # (category, extra-bits value)
    sym_used: set[int] = set()
    fresh = [True] * ncomp
    ra_line = 0  # line predicted with Ra after scan start / restart (H.1.2.1)
    unit = 0
    boundaries = []  # entropy-run split points for restart markers
    for y in range(height):
        for x in range(width):
            if restart_interval and unit and unit % restart_interval == 0:
                boundaries.append(len(diffs))
                fresh = [True] * ncomp
                ra_line = y
            for ci, plane in enumerate(planes):
                if fresh[ci]:
                    px = default
                    fresh[ci] = False
                elif y == ra_line:
                    px = plane[y * width + x - 1]
                elif x == 0:
                    px = plane[(y - 1) * width + x]
                else:
                    px = predict(
                        plane[y * width + x - 1],
                        plane[(y - 1) * width + x],
                        plane[(y - 1) * width + x - 1],
                    )
                d = plane[y * width + x] - px
                d = ((d + 32768) & 0xFFFF) - 32768  # mod-2^16 canonical
                if d == -32768:
                    diffs.append((16, 0))  # SSSS=16: diff 32768, no bits
                    sym_used.add(16)
                else:
                    t = _category(d)
                    bits = d if d >= 0 else d + (1 << t) - 1
                    diffs.append((t, bits))
                    sym_used.add(t)
            unit += 1

    bits_spec, vals = _scan_huff_table(sorted(sym_used))
    codes = canonical_codes(bits_spec, vals)

    out = bytearray(b"\xff\xd8")
    sof = struct.pack(">BHHB", precision, height, width, ncomp)
    for ci in range(ncomp):
        sof += struct.pack(">BBB", ci + 1, 0x11, 0)
    out += b"\xff\xc3" + struct.pack(">H", len(sof) + 2) + sof
    dht = bytes([0x00]) + bytes(bits_spec) + bytes(vals)
    out += b"\xff\xc4" + struct.pack(">H", len(dht) + 2) + dht
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += struct.pack(">BB", ci + 1, 0x00)
    sos += struct.pack(">BBB", predictor, 0, pt)
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    splits = boundaries + [len(diffs)]
    start = 0
    for run_idx, end in enumerate(splits):
        if run_idx:
            out += bytes([0xFF, 0xD0 + ((run_idx - 1) % 8)])
        w = _BitWriter()
        for t, bits in diffs[start:end]:
            code, ln = codes[t]
            w.write(code, ln)
            if t and t != 16:
                w.write(bits, t)
        w.flush()
        out += w.out
        start = end
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# Hand-assembled progressive conformance fixture (ITU T.81 Annex G)
# ---------------------------------------------------------------------------
# A 16x8 grayscale SOF2 stream built BY HAND, byte by byte, from the spec
# -- NOT produced by encode_jpeg_progressive -- so decoding it pins
# _decode_progressive against T.81 itself, the same way the baseline
# decoder is pinned by the hand-crafted stream in
# tests/test_operators_misc.py::test_jpeg_handcrafted_minimal_stream_decodes_per_spec
# (VERDICT r7 task #2: break the progressive encoder<->decoder
# self-reference).
#
# Construction (all quant values 1, two 8x8 blocks side by side):
#   DQT    all-ones table 0
#   SOF2   8-bit, 8 rows, 16 cols, one component, 1x1 sampling
#   DHT DC two codes of length 2: '00'->category 8, '01'->category 9
#   DHT AC one code of length 1:  '0' ->0x10 (EOBn with r=1)
#   scan 1 DC first (Ss=Se=0, Ah=0, Al=1): block A diff +288
#          (cat 9, bits 100100000), block B diff -128 (cat 8, encoded
#          as 288-128=160 minus pred: bits 01111111); entropy
#          01|100100000|00|01111111 + 1-pad = 64 03 FF(00-stuffed)
#   scan 2 DC refinement (Ah=1, Al=0): one raw LSB per block, both 0
#   scan 3 AC first (Ss=1, Se=63, Al=1): one EOBn r=1 code + 1 ext bit
#          0 -> EOB run of 2, covering both (all-zero-AC) blocks
#   scan 4 AC refinement (Ah=1, Al=0): same EOBn, corrects nothing
# Final coefficients: DC_A = 288<<1 = 576, DC_B = (288-128)<<1 = 320,
# all AC zero. With quant 1 the IDCT of a DC-only block is the constant
# DC/8 + 128: block A = 576/8+128 = 200, block B = 320/8+128 = 168 --
# EXACT integers, no rounding ambiguity anywhere.
ANNEX_G_FIXTURE = bytes.fromhex(
    "ffd8"
    "ffdb00430001010101010101010101010101010101010101010101010101010101"
    "01010101010101010101010101010101010101010101010101010101010101010101"
    "0101"
    "ffc2000b080008001001011100"
    "ffc4001500000200000000000000000000000000000809"
    "ffc40014100100000000000000000000000000000010"
    "ffda000801010000000164"
    "03ff00"
    "ffda00080101000000103f"
    "ffda0008010100013f013f"
    "ffda0008010100013f103f"
    "ffd9"
)

#: Expected decode of ANNEX_G_FIXTURE: row-major 16x8 grayscale, left
#: block 200, right block 168 (derivation above).
ANNEX_G_FIXTURE_PIXELS = ([200] * 8 + [168] * 8) * 8
