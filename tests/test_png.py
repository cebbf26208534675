"""Pure-stdlib PNG codec (functions/png.py) — round-trips, every scanline
filter, palette expansion, and the malformed-input surface that must become
errors-as-data in the multimodal operators (round-3 verdict, next-round #4).

No checked-in binary fixtures: encode_png writes the same subset decode_png
reads, and filtered streams are hand-built with a test-side reference
filterer so filters 1-4 are exercised against an independent forward
implementation (decode inverts what the test filters)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from ferenda_spark.functions.png import (
    PngError,
    _SIG,
    decode_png,
    encode_png,
)


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def _build_png(width, height, depth, ctype, raw, plte=None, interlace=0):
    """Hand-assemble a PNG from an already-filtered raw stream."""
    ihdr = struct.pack(">IIBBBBB", width, height, depth, ctype, 0, 0,
                       interlace)
    out = _SIG + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    return out + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _filter_forward(img: np.ndarray, filters: list[int]) -> bytes:
    """Reference FORWARD filter (spec §6) — independent of the decoder's
    inverse, so a shared misunderstanding can't cancel out."""
    h, w, ch = img.shape
    stride = w * ch
    flat = img.reshape(h, stride).astype(int)
    out = bytearray()
    prev = [0] * stride
    for y in range(h):
        f = filters[y % len(filters)]
        cur = list(flat[y])
        out.append(f)
        for x in range(stride):
            a = cur[x - ch] if x >= ch else 0
            b = prev[x]
            c = (prev[x - ch] if x >= ch else 0)
            if f == 0:
                v = cur[x]
            elif f == 1:
                v = cur[x] - a
            elif f == 2:
                v = cur[x] - b
            elif f == 3:
                v = cur[x] - ((a + b) >> 1)
            else:
                v = cur[x] - _paeth(a, b, c)
            out.append(v & 0xFF)
        prev = cur
    return bytes(out)


# ------------------------------------------------------------- round-trips


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_roundtrip_all_channel_counts(ch):
    rng = np.random.RandomState(7 + ch)
    img = rng.randint(0, 256, size=(13, 9, ch), dtype=np.uint8)
    got = decode_png(encode_png(img))
    assert got.shape == (13, 9, ch)
    assert np.array_equal(got, img)


def test_roundtrip_2d_gray_and_1x1():
    img = np.arange(35, dtype=np.uint8).reshape(5, 7)
    assert np.array_equal(decode_png(encode_png(img))[:, :, 0], img)
    one = np.array([[200]], dtype=np.uint8)
    assert decode_png(encode_png(one)).tolist() == [[[200]]]


@pytest.mark.parametrize("filters", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_every_scanline_filter_inverts(filters):
    """Decode must invert the test-side forward filter for Sub/Up/Average/
    Paeth and a mixed per-line schedule (real encoders mix freely)."""
    rng = np.random.RandomState(sum(filters) + 11)
    img = rng.randint(0, 256, size=(17, 11, 3), dtype=np.uint8)
    raw = _filter_forward(img, filters)
    data = _build_png(11, 17, 8, 2, raw)
    assert np.array_equal(decode_png(data), img)


def test_palette_expansion():
    rng = np.random.RandomState(3)
    pal = rng.randint(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.randint(0, 16, size=(6, 10), dtype=np.uint8)
    raw = _filter_forward(idx[:, :, None], [0])
    data = _build_png(10, 6, 8, 3, raw, plte=pal.tobytes())
    assert np.array_equal(decode_png(data), pal[idx])


def test_multiple_idat_chunks_concatenate():
    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    z = zlib.compress(_filter_forward(img, [0]))
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    data = (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", z[:7]) + _chunk(b"IDAT", z[7:])
            + _chunk(b"IEND", b""))
    assert np.array_equal(decode_png(data), img)


# ------------------------------------------------------------- error rows


def _good_png() -> bytes:
    return encode_png(np.zeros((5, 5, 3), dtype=np.uint8))


@pytest.mark.parametrize(
    "mangle,msg",
    [
        (lambda d: b"JUNK" + d[4:], "signature"),
        (lambda d: d[: len(d) // 2], "truncated|IEND"),
        (lambda d: d[:-5] + bytes([d[-5] ^ 0xFF]) + d[-4:], "CRC"),
        (lambda d: d[: len(d) - 12], "IEND"),
    ],
)
def test_malformed_raises_pngerror(mangle, msg):
    with pytest.raises(PngError, match=msg):
        decode_png(mangle(_good_png()))


def test_truncated_idat_inflate_error():
    good = _good_png()
    # rebuild with an IDAT whose zlib stream is chopped (framing valid)
    img = np.zeros((5, 5, 3), dtype=np.uint8)
    z = zlib.compress(_filter_forward(img, [0]))
    ihdr = struct.pack(">IIBBBBB", 5, 5, 8, 2, 0, 0, 0)
    bad = (_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", z[:-4])
           + _chunk(b"IEND", b""))
    with pytest.raises(PngError, match="inflate|length"):
        decode_png(bad)
    assert decode_png(good) is not None  # sanity: baseline still good


@pytest.mark.parametrize(
    "width,height,depth,ctype,interlace,msg",
    [
        (5, 5, 16, 2, 0, "bit depth"),
        (5, 5, 8, 5, 0, "color type"),
        (5, 5, 8, 2, 1, "interlace"),
        (0, 5, 8, 2, 0, "zero-dimension"),
    ],
)
def test_unsupported_subset_raises(width, height, depth, ctype, interlace, msg):
    raw = bytes((1 + width * 3) * height)
    data = _build_png(width, height, depth, ctype, raw, interlace=interlace)
    with pytest.raises(PngError, match=msg):
        decode_png(data)


def test_palette_index_out_of_range():
    idx = np.full((2, 2, 1), 9, dtype=np.uint8)
    raw = _filter_forward(idx, [0])
    pal = bytes(9)  # only 3 entries
    with pytest.raises(PngError, match="palette"):
        decode_png(_build_png(2, 2, 8, 3, raw, plte=pal))


def test_wrong_decompressed_length():
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    data = (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(7)))
            + _chunk(b"IEND", b""))
    with pytest.raises(PngError, match="decompressed length"):
        decode_png(data)


def test_unknown_filter_byte():
    raw = bytes([7]) + bytes(12)  # filter 7 invalid
    data = _build_png(4, 1, 8, 2, raw)
    with pytest.raises(PngError, match="filter 7"):
        decode_png(data)
