"""Pure stdlib+numpy baseline JPEG codec (functions/jpeg.py) — lossy
round-trips across subsampling/quality/restart grids, an independent
reference IDCT, and the malformed-input surface that must become
errors-as-data in the multimodal operators (round-4 verdict, next-round
item #3).

No checked-in binary fixtures: encode_jpeg writes the same baseline
subset decode_jpeg reads; round-trip assertions are error-bounded, not
equality (JPEG is lossy by construction)."""

from __future__ import annotations

import numpy as np
import pytest

from ferenda_spark.functions.jpeg import (
    ZZ,
    JpegError,
    _A,
    _build_decode_table,
    decode_jpeg,
    encode_jpeg,
)


def _smooth(h, w, ch, seed=0):
    """JPEG-natured content: gradients + low-frequency waves + mild noise
    (white noise is the adversarial case for a lossy transform codec and
    would need unrealistically loose bounds)."""
    yy, xx = np.mgrid[0:h, 0:w]
    base = (xx * 255.0 / max(w - 1, 1) * 0.5
            + yy * 255.0 / max(h - 1, 1) * 0.5)
    img = np.stack([base + 30.0 * np.sin(xx / 5.0 + c + seed)
                    for c in range(ch)], axis=2)
    rng = np.random.RandomState(100 + seed)
    return np.clip(img + rng.randn(h, w, ch) * 3.0, 0, 255).astype(np.uint8)


# --- round-trips ---------------------------------------------------------

@pytest.mark.parametrize("h,w,ch,sub", [
    (32, 32, 1, "444"),
    (40, 56, 3, "444"),
    (33, 47, 3, "420"),   # odd dims + subsampling: pad/crop path
    (8, 8, 1, "444"),     # single block
    (17, 9, 3, "444"),    # sub-MCU edges both axes
    (64, 48, 3, "420"),
])
def test_roundtrip_error_bounded(h, w, ch, sub):
    img = _smooth(h, w, ch, seed=h + w)
    out = decode_jpeg(encode_jpeg(img, quality=90, subsampling=sub))
    assert out.shape == (h, w, ch)
    err = np.abs(out.astype(float) - img.astype(float))
    # 4:2:0 halves chroma resolution; luma-dominated bound still tight
    assert err.mean() < (6.0 if sub == "420" else 4.0)
    assert err.max() <= 40


@pytest.mark.parametrize("quality", [60, 75, 85, 95])
def test_quality_monotone(quality):
    """Higher quality → no worse mean reconstruction error AND no smaller
    payload (on fixed content)."""
    img = _smooth(48, 48, 3, seed=quality)
    data = encode_jpeg(img, quality=quality)
    out = decode_jpeg(data)
    err = np.abs(out.astype(float) - img.astype(float)).mean()
    data95 = encode_jpeg(img, quality=95)
    err95 = np.abs(decode_jpeg(data95).astype(float)
                   - img.astype(float)).mean()
    assert err95 <= err + 0.05
    assert len(data95) >= len(data)


def test_restart_intervals_roundtrip_and_match_plain():
    """DRI/RSTn resegmentation must decode to EXACTLY the same pixels as
    the same image encoded without restarts (the quantized coefficients
    are identical; only the entropy framing differs)."""
    img = _smooth(64, 64, 3, seed=5)
    plain = decode_jpeg(encode_jpeg(img, quality=80))
    restarted = decode_jpeg(encode_jpeg(img, quality=80,
                                        restart_interval=2))
    assert np.array_equal(plain, restarted)


def test_gray_2d_input_and_flat_image():
    flat = np.full((24, 24), 137, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(flat, quality=90))
    assert out.shape == (24, 24, 1)
    assert np.abs(out.astype(int) - 137).max() <= 2


# --- reference IDCT ------------------------------------------------------

def test_idct_matrix_against_direct_formula():
    """The einsum IDCT uses the orthonormal DCT matrix _A; verify _A
    against the direct T.81 Annex A.3.3 double-sum on random blocks."""
    rng = np.random.RandomState(3)
    F8 = rng.randn(8, 8) * 50

    def direct_idct(F):
        out = np.zeros((8, 8))
        for x in range(8):
            for y in range(8):
                s = 0.0
                for u in range(8):
                    for v in range(8):
                        cu = 1 / np.sqrt(2) if u == 0 else 1.0
                        cv = 1 / np.sqrt(2) if v == 0 else 1.0
                        s += (cu * cv * F[u, v]
                              * np.cos((2 * x + 1) * u * np.pi / 16)
                              * np.cos((2 * y + 1) * v * np.pi / 16))
                out[x, y] = s / 4
        return out

    got = _A.T @ F8 @ _A
    assert np.allclose(got, direct_idct(F8), atol=1e-10)


def test_zigzag_is_a_permutation():
    assert sorted(ZZ.tolist()) == list(range(64))
    # spot-check the spec's first diagonal and final corner
    assert ZZ[0] == 0 and ZZ[1] == 1 and ZZ[2] == 8 and ZZ[63] == 63


def test_huffman_canonical_codes_prefix_free():
    bits = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
    table = _build_decode_table(bits, list(range(sum(bits))))
    codes = [(length, code) for (length, code) in table]
    as_bits = {format(code, f"0{length}b") for length, code in codes}
    assert len(as_bits) == len(codes)
    for a in as_bits:
        for b in as_bits:
            if a is not b and b.startswith(a) and a != b:
                raise AssertionError(f"{a} is a prefix of {b}")


# --- malformed / unsupported input (errors-as-data surface) -------------

def test_truncated_scan_raises():
    data = encode_jpeg(_smooth(32, 32, 3, seed=1))
    with pytest.raises(JpegError):
        decode_jpeg(data[: len(data) // 2])


def test_progressive_sof2_named_in_error():
    data = bytearray(encode_jpeg(_smooth(16, 16, 1, seed=2)))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2
    with pytest.raises(JpegError, match="SOF2"):
        decode_jpeg(bytes(data))


@pytest.mark.parametrize("payload,msg", [
    (b"", "signature"),
    (b"\x00\x01\x02\x03", "signature"),
    (b"\xff\xd8\xff\xd9", "EOI before any scan"),
    (b"\xff\xd8\xff\xdb\x00\x02", "no SOS"),
])
def test_malformed_headers(payload, msg):
    with pytest.raises(JpegError, match=msg):
        decode_jpeg(payload)


def test_fuzz_truncation_every_offset_errors_or_decodes():
    """Cutting the payload at ANY offset must either raise JpegError or
    (never) silently succeed — no other exception type escapes."""
    data = encode_jpeg(_smooth(24, 24, 3, seed=4), quality=70)
    for cut in range(2, len(data) - 1, 7):
        try:
            decode_jpeg(data[:cut])
        except JpegError:
            continue
        raise AssertionError(f"truncation at {cut} did not raise")


def test_bitflip_fuzz_never_raises_non_jpegerror():
    """Single-byte corruptions anywhere must surface as JpegError or a
    successful (garbage-pixel) decode — never IndexError/ValueError from
    numpy internals. Bounded-garbage on undetected corruption is the
    documented contract (PNG catches more because it has CRCs; JPEG's
    entropy stream has no integrity check by design)."""
    data = bytearray(encode_jpeg(_smooth(16, 16, 1, seed=6), quality=80))
    rng = np.random.RandomState(8)
    for _ in range(120):
        i = int(rng.randint(2, len(data) - 2))
        old = data[i]
        data[i] = int(rng.randint(0, 256))
        try:
            decode_jpeg(bytes(data))
        except JpegError:
            pass
        finally:
            data[i] = old


# --- Spark wiring --------------------------------------------------------

def test_extract_media_features_real_jpeg(spark):
    from ferenda_spark.operators.multimodal import (
        FEATURE_DIM,
        extract_media_features,
        synthetic_jpeg_media,
    )

    rows = {r.media_id: r for r in extract_media_features(
        synthetic_jpeg_media(spark, 32), mode="real").collect()}
    assert len(rows) == 32
    for i, r in rows.items():
        corrupted = i % 8 == 3 or i % 16 == 9
        if corrupted:
            assert r.decode_error is not None
            assert r.features == [] and r.width is None
            if i % 16 == 9:
                assert "SOF2" in r.decode_error
        else:
            assert r.decode_error is None, (i, r.decode_error)
            assert len(r.features) == FEATURE_DIM
            # decoder reports the true pre-pad dimensions
            assert r.width == 9 + (i * 7) % 56
            assert r.height == 8 + (i * 5) % 48
            assert all(-1.0 <= f <= 1.0 for f in r.features)
