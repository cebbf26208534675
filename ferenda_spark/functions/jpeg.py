"""Pure stdlib+numpy baseline JPEG codec — the second real-decode path
for the multimodal operators (functions/png.py is the first).

JPEG is the dominant image format in a web crawl, and round-4's verdict
ranked a baseline decoder as the top multimodal gap: ``mode='real'``
decoded PNG only and raised for everything else. This module implements
the baseline sequential DCT process of the public JPEG spec (ITU-T T.81),
which covers the overwhelming majority of crawl JPEGs:

- SOF0 (baseline sequential, 8-bit) only; SOF1/SOF2/… raise naming the
  process (progressive rendering is a transport optimization — batch
  feature extraction wants one full-resolution pass)
- 1-component (grayscale) and 3-component (YCbCr/JFIF) scans; any
  sampling-factor grid up to 4×4 (4:4:4, 4:2:2, 4:2:0 in practice)
- DQT 8- and 16-bit precision, multiple tables per segment
- DHT canonical Huffman tables, DC and AC, table-driven (files carry
  their own tables; the Annex K defaults below are for the ENCODER)
- DRI restart intervals: RST0–7 resegment the scan and reset DC
  predictors (common in camera output)
- byte stuffing (FF 00) removed during segmentation; a marker other
  than RSTn/EOI inside the scan is an error, not garbage pixels

Malformed or unsupported input raises :class:`JpegError` with a message
naming the failure — the multimodal UDF catches it into the errors-as-
data column, same discipline as PNG/PDF/DOCX.

Decode shape: the entropy decode (Huffman) is inherently sequential per
image and runs in Python over a bit cursor — that is the per-image cost.
Everything after it is vectorized numpy over ALL blocks at once: one
einsum IDCT ``Aᵀ·F·A`` over the (n_blocks, 8, 8) coefficient tensor,
np.repeat chroma upsampling, one matrix YCbCr→RGB. At cluster scale the
parallelism axis is images-per-Arrow-batch (mapInPandas), not pixels.

``encode_jpeg`` writes the same subset (Annex K quantization tables
scaled by the libjpeg quality formula, Annex K Huffman tables, optional
4:2:0 subsampling and restart intervals) so tests round-trip arbitrary
arrays without checked-in binary fixtures — lossy, so tests assert
bounded error, not equality.
"""

from __future__ import annotations

import struct

import numpy as np


class JpegError(ValueError):
    """Malformed or unsupported JPEG payload."""


# zigzag order: ZZ[i] = raster (row-major) position of the i-th
# coefficient in zigzag scan order (T.81 Figure 5)
ZZ = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# orthonormal 8-point DCT-II matrix: DCT F = A·f·Aᵀ, IDCT f = Aᵀ·F·A
_A = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _A[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(1 / 8) if _k == 0 else 0.5)

# Annex K (T.81 Tables K.1/K.2) quantization tables, raster order
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64)

# Annex K (T.81 Tables K.3–K.6) Huffman specs: (bits[1..16], values)
HUFF_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                list(range(12)))
HUFF_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                  list(range(12)))
HUFF_AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa,
])
HUFF_AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
    0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34,
    0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
    0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2,
    0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9,
    0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa,
])


def _build_decode_table(bits, values) -> dict[tuple[int, int], int]:
    """Canonical Huffman: {(code_length, code): symbol}."""
    if sum(bits) != len(values):
        raise JpegError("DHT counts disagree with value list length")
    table: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits, values) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: {symbol: (code, code_length)}."""
    return {sym: (code, length)
            for (length, code), sym in _build_decode_table(bits, values).items()}


class _BitReader:
    """MSB-first bit cursor over a destuffed entropy segment."""

    __slots__ = ("data", "pos", "buf", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.buf = 0
        self.nbits = 0

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise JpegError("entropy segment exhausted mid-symbol")
            self.buf = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _decode_huff(r: _BitReader, table) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | r.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise JpegError("invalid Huffman code in entropy segment")


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map the t-bit magnitude v to its signed value."""
    return v - ((1 << t) - 1) if t and v < (1 << (t - 1)) else v


def _segments(data: bytes, pos: int):
    """Split the entropy-coded scan into restart segments (byte-stuffing
    removed). Returns (segments, end_pos) with end_pos at the terminating
    marker (EOI or next header marker)."""
    segs: list[bytes] = []
    cur = bytearray()
    n = len(data)
    while pos < n:
        b = data[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        if pos + 1 >= n:
            raise JpegError("truncated scan: dangling FF at end of data")
        m = data[pos + 1]
        if m == 0x00:          # stuffed FF
            cur.append(0xFF)
            pos += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            segs.append(bytes(cur))
            cur = bytearray()
            pos += 2
        elif m == 0xFF:        # fill byte
            pos += 1
        else:                  # EOI or next header marker ends the scan
            segs.append(bytes(cur))
            return segs, pos
    raise JpegError("scan ran off the end of the payload without a marker")


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline-sequential JPEG → (h, w, channels) uint8 array
    (channels = 1 for grayscale, 3 for YCbCr→RGB). Raises
    :class:`JpegError` on malformed or non-baseline input."""
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise JpegError("bad JPEG signature (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None      # (h, w, [(cid, hi, vi, tq)])
    scan_comps = None  # [(comp_index, dc_id, ac_id)]
    restart_interval = 0

    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise JpegError(f"expected marker at offset {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI before SOS
            raise JpegError("EOI before any scan data")
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # standalone markers
            pos += 2
            continue
        if pos + 4 > len(data):
            raise JpegError(f"truncated marker segment FF{marker:02X}")
        (seglen,) = struct.unpack(">H", data[pos + 2:pos + 4])
        body = data[pos + 4:pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise JpegError(f"truncated segment FF{marker:02X}")
        pos += 2 + seglen

        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                p += 1
                if pq not in (0, 1):
                    raise JpegError(f"bad DQT precision {pq}")
                width = 2 if pq else 1
                raw = body[p:p + 64 * width]
                if len(raw) != 64 * width:
                    raise JpegError("truncated DQT table")
                vals = (np.frombuffer(raw, dtype=">u2") if pq
                        else np.frombuffer(raw, dtype=np.uint8))
                qt[tq] = vals.astype(np.float64)  # zigzag order
                p += 64 * width
        elif marker == 0xC4:  # DHT
            p = 0
            while p + 17 <= len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1:p + 17])
                nvals = sum(bits)
                values = list(body[p + 17:p + 17 + nvals])
                if len(values) != nvals:
                    raise JpegError("truncated DHT table")
                table = _build_decode_table(bits, values)
                (huff_dc if tc == 0 else huff_ac)[th] = table
                p += 17 + nvals
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise JpegError(f"unsupported sample precision {prec}")
            if nc not in (1, 3):
                raise JpegError(f"unsupported component count {nc}")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i:9 + 3 * i]
                hi, vi = hv >> 4, hv & 0x0F
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise JpegError(f"bad sampling factors {hi}x{vi}")
                comps.append((cid, hi, vi, tq))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError(
                f"unsupported JPEG process SOF{marker - 0xC0} "
                "(only baseline sequential SOF0 is implemented)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows the header
            if frame is None:
                raise JpegError("SOS before SOF0")
            ns = body[0]
            if ns != len(frame[2]):
                raise JpegError("partial (multi-scan) SOS not supported")
            scan_comps = []
            cid_index = {c[0]: i for i, c in enumerate(frame[2])}
            for i in range(ns):
                cs, tda = body[1 + 2 * i:3 + 2 * i]
                if cs not in cid_index:
                    raise JpegError(f"SOS names unknown component {cs}")
                scan_comps.append((cid_index[cs], tda >> 4, tda & 0x0F))
            segs, pos = _segments(data, pos)
            return _decode_scan(frame, scan_comps, qt, huff_dc, huff_ac,
                                restart_interval, segs)
        # APPn / COM / others: skipped
    raise JpegError("no SOS marker before end of payload")


def _decode_scan(frame, scan_comps, qt, huff_dc, huff_ac,
                 restart_interval, segs) -> np.ndarray:
    h, w, comps = frame
    if h == 0 or w == 0:
        raise JpegError("zero image dimension in SOF0")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    for _, _, _, tq in comps:
        if tq not in qt:
            raise JpegError(f"missing quantization table {tq}")
    for _, td, ta in scan_comps:
        if td not in huff_dc:
            raise JpegError(f"missing DC Huffman table {td}")
        if ta not in huff_ac:
            raise JpegError(f"missing AC Huffman table {ta}")

    # per-component dequantized coefficient planes, MCU-grid sized
    planes = [np.zeros((mcus_y * vi * 8, mcus_x * hi * 8))
              for _, hi, vi, _ in comps]
    # dequant tables scattered to raster layout once
    deq = [np.zeros(64) for _ in comps]
    for ci, (_, _, _, tq) in enumerate(comps):
        deq[ci][ZZ] = qt[tq]

    n_mcus = mcus_x * mcus_y
    per_seg = restart_interval if restart_interval else n_mcus
    mcu = 0
    seg_idx = 0
    reader = None
    preds = [0] * len(comps)
    while mcu < n_mcus:
        if mcu % per_seg == 0:
            if seg_idx >= len(segs):
                raise JpegError(
                    f"scan ends after {mcu} of {n_mcus} MCUs "
                    "(missing restart segment)")
            reader = _BitReader(segs[seg_idx])
            seg_idx += 1
            preds = [0] * len(comps)
        my, mx = divmod(mcu, mcus_x)
        try:
            for ci, td, ta in scan_comps:
                _, hi, vi, _ = comps[ci]
                dct, act = huff_dc[td], huff_ac[ta]
                for by in range(vi):
                    for bx in range(hi):
                        coefs = np.zeros(64)
                        t = _decode_huff(reader, dct)
                        if t > 11:
                            raise JpegError(f"bad DC category {t}")
                        diff = _extend(reader.bits(t), t)
                        preds[ci] += diff
                        coefs[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(reader, act)
                            run, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if run == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise JpegError("AC run past block end")
                            coefs[ZZ[k]] = _extend(reader.bits(size), size)
                            k += 1
                        block = (coefs * deq[ci]).reshape(8, 8)
                        y0 = (my * vi + by) * 8
                        x0 = (mx * hi + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = block
        except JpegError as exc:
            raise JpegError(f"MCU {mcu}/{n_mcus}: {exc}") from None
        mcu += 1

    # vectorized IDCT over every 8x8 block of each plane at once
    out_planes = []
    for ci, plane in enumerate(planes):
        ph, pw = plane.shape
        blocks = plane.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)
        spatial = np.einsum("km,ijmn,nl->ijkl", _A.T, blocks, _A,
                            optimize=True)
        pix = spatial.transpose(0, 2, 1, 3).reshape(ph, pw) + 128.0
        _, hi, vi, _ = comps[ci]
        if hi != hmax or vi != vmax:  # nearest-neighbor chroma upsample
            if hmax % hi or vmax % vi:
                raise JpegError(
                    f"non-integer sampling ratio {hmax}/{hi}x{vmax}/{vi}")
            pix = np.repeat(np.repeat(pix, vmax // vi, axis=0),
                            hmax // hi, axis=1)
        out_planes.append(pix[:h, :w])

    if len(out_planes) == 1:
        gray = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return gray[:, :, np.newaxis]
    y, cb, cr = out_planes
    cb = cb - 128.0
    cr = cr - 128.0
    rgb = np.stack([
        y + 1.402 * cr,
        y - 0.344136 * cb - 0.714136 * cr,
        y + 1.772 * cb,
    ], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# encoder (tests only — fixture-free round-trips)

class _BitWriter:
    __slots__ = ("out", "buf", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.buf = (self.buf << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.buf)
                if self.buf == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.buf = 0
                self.nbits = 0

    def flush(self) -> None:
        """Pad the final partial byte with 1-bits (T.81 F.1.2.3)."""
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


def _scale_qt(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    return np.clip(np.floor((base * scale + 50) / 100), 1, 255)


def _encode_block(wtr, coefs_zz, pred, dc_tab, ac_tab) -> int:
    dc = int(coefs_zz[0])
    diff = dc - pred
    mag, t = (diff if diff >= 0 else -diff), 0
    while mag:
        t += 1
        mag >>= 1
    code, length = dc_tab[t]
    wtr.write(code, length)
    if t:
        wtr.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if coefs_zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(coefs_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            zc, zl = ac_tab[0xF0]
            wtr.write(zc, zl)
            run -= 16
        mag, size = (v if v >= 0 else -v), 0
        while mag:
            size += 1
            mag >>= 1
        code, length = ac_tab[(run << 4) | size]
        wtr.write(code, length)
        wtr.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 63:
        ec, el = ac_tab[0x00]
        wtr.write(ec, el)
    return dc


def encode_jpeg(img: np.ndarray, quality: int = 85,
                subsampling: str = "444",
                restart_interval: int = 0) -> bytes:
    """Encode (h, w) or (h, w, 1) grayscale / (h, w, 3) RGB uint8 →
    baseline JFIF bytes. ``subsampling`` is '444' or '420' (3-channel
    only); ``restart_interval`` > 0 emits DRI + RSTn markers."""
    img = np.asarray(img)
    if img.ndim == 2:
        img = img[:, :, np.newaxis]
    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] not in (1, 3):
        raise ValueError("need (h, w[, 1|3]) uint8 array")
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling must be '444' or '420': {subsampling}")
    h, w, nc = img.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    sub = subsampling == "420" and nc == 3

    qly = _scale_qt(QT_LUMA, quality)
    qlc = _scale_qt(QT_CHROMA, quality)

    if nc == 3:  # RGB -> YCbCr (JFIF)
        r = img[:, :, 0].astype(np.float64)
        g = img[:, :, 1].astype(np.float64)
        b = img[:, :, 2].astype(np.float64)
        planes = [0.299 * r + 0.587 * g + 0.114 * b,
                  128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
                  128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b]
    else:
        planes = [img[:, :, 0].astype(np.float64)]

    if sub:
        samp = [(2, 2), (1, 1), (1, 1)]
        for ci in (1, 2):  # 2x2 box-average chroma
            p = planes[ci]
            eh, ew = -(-h // 2) * 2, -(-w // 2) * 2
            pad = np.pad(p, ((0, eh - h), (0, ew - w)), mode="edge")
            planes[ci] = pad.reshape(eh // 2, 2, ew // 2, 2).mean((1, 3))
    else:
        samp = [(1, 1)] * nc

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # pad each plane to its MCU-grid size by edge replication
    deqs, padded = [], []
    for ci, p in enumerate(planes):
        hi, vi = samp[ci]
        th, tw = mcus_y * vi * 8, mcus_x * hi * 8
        padded.append(np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])),
                             mode="edge"))
        q = np.zeros(64)
        q[ZZ] = qly if ci == 0 else qlc
        deqs.append(q.reshape(8, 8))

    # forward DCT + quantize every block, vectorized per plane
    quantized = []
    for ci, p in enumerate(padded):
        ph, pw = p.shape
        blocks = (p - 128.0).reshape(ph // 8, 8, pw // 8, 8)
        blocks = blocks.transpose(0, 2, 1, 3)
        freq = np.einsum("km,ijmn,ln->ijkl", _A, blocks, _A, optimize=True)
        qz = np.round(freq / deqs[ci]).astype(np.int64)
        quantized.append(qz)  # (by, bx, 8, 8)

    dc_tabs = [_build_encode_table(*HUFF_DC_LUMA),
               _build_encode_table(*HUFF_DC_CHROMA)]
    ac_tabs = [_build_encode_table(*HUFF_AC_LUMA),
               _build_encode_table(*HUFF_AC_CHROMA)]

    wtr = _BitWriter()
    preds = [0] * nc
    n_mcus = mcus_x * mcus_y
    rst = 0
    for mcu in range(n_mcus):
        if restart_interval and mcu and mcu % restart_interval == 0:
            wtr.flush()
            wtr.out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
            preds = [0] * nc
        my, mx = divmod(mcu, mcus_x)
        for ci in range(nc):
            hi, vi = samp[ci]
            tsel = 0 if ci == 0 else 1
            for by in range(vi):
                for bx in range(hi):
                    blk = quantized[ci][my * vi + by, mx * hi + bx]
                    preds[ci] = _encode_block(
                        wtr, _zigzag(blk),
                        preds[ci], dc_tabs[tsel], ac_tabs[tsel])
    wtr.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HHBB", 1, 1, 0, 0)
    for tq, q in ((0, qly),) + (((1, qlc),) if nc == 3 else ()):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq) \
            + bytes(int(v) for v in q)
    comps = b""
    for ci in range(nc):
        hi, vi = samp[ci]
        comps += bytes([ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc) \
        + comps
    huffs = [(0x00, HUFF_DC_LUMA), (0x10, HUFF_AC_LUMA)]
    if nc == 3:
        huffs += [(0x01, HUFF_DC_CHROMA), (0x11, HUFF_AC_CHROMA)]
    for tid, (bits, values) in huffs:
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(values), tid) \
            + bytes(bits) + bytes(values)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([nc]) + b"".join(
        bytes([ci + 1, 0x00 if ci == 0 else 0x11]) for ci in range(nc)
    ) + b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += wtr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _zigzag(block: np.ndarray) -> np.ndarray:
    """8x8 raster block → length-64 zigzag-ordered vector."""
    return block.reshape(-1)[ZZ]
