"""Codec layer: roundtrips, PNG filter decoding, PSNR invariant."""

import numpy as np
import pytest

from rsgislib_spark.functions import codec
from rsgislib_spark.synth import pixel_array


@pytest.mark.parametrize("fmt", ["raw8", "raw16", "png"])
def test_lossless_roundtrip(fmt):
    arr = pixel_array(11, 57, 43, fmt)
    buf = codec.encode_image(arr, fmt)
    out = codec.decode_image(buf, 57, 43, fmt)
    assert out.dtype == arr.dtype
    assert np.array_equal(out, arr)


def test_png_16bit_roundtrip():
    rng = np.random.RandomState(3)
    arr = rng.randint(0, 65535, size=(31, 77), dtype=np.uint16)
    assert np.array_equal(codec.decode_png(codec.encode_png(arr)), arr)


def test_png_filtered_scanlines_decode():
    # encoder always writes filter 0; verify the decoder handles 1-4 by
    # re-filtering a known image manually.
    import struct
    import zlib

    arr = np.arange(0, 64, dtype=np.uint8).reshape(8, 8)
    h, w = arr.shape

    # build scanlines with Sub(1) on row1, Up(2) row2, Average(3) row3, Paeth(4) row4
    rows = []
    prev = np.zeros(w, np.int32)
    for y in range(h):
        row = arr[y].astype(np.int32)
        ft = [0, 1, 2, 3, 4, 0, 1, 2][y]
        if ft == 0:
            enc = row.copy()
        elif ft == 1:
            enc = row.copy()
            enc[1:] = (row[1:] - row[:-1]) % 256
        elif ft == 2:
            enc = (row - prev) % 256
        elif ft == 3:
            left = np.concatenate([[0], row[:-1]])
            enc = (row - ((left + prev) // 2)) % 256
        else:
            left = np.concatenate([[0], row[:-1]])
            upleft = np.concatenate([[0], prev[:-1]])
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prev, upleft))
            enc = (row - pred) % 256
        rows.append(bytes([ft]) + bytes(enc.astype(np.uint8)))
        prev = row
    scan = b"".join(rows)

    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    png = sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(scan)) + chunk(b"IEND", b"")
    assert np.array_equal(codec.decode_png(png), arr)


def test_jpeg_stub_psnr_above_40db():
    arr = pixel_array(5, 120, 80, "raw16")
    out = codec.decode_jpeg_stub(codec.encode_jpeg_stub(arr))
    assert codec.psnr(arr, out, peak=1023.0) >= 40.0
    assert codec.psnr(arr, arr) == float("inf")


def test_jpeg_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        codec.decode_jpeg_stub(b"\xff\xd8\xff\xe0 not really")


def test_catmull_rom_weights_exact_properties():
    """The scaled integer Catmull-Rom weights must form an exact
    partition of unity (sum = 2*d^3) and reproduce linear ramps
    exactly — the two identities that define the kernel."""
    import numpy as np

    from rsgislib_spark.sources.multimodal import _cr_weights

    for d in (96, 64, 10):
        f = np.arange(d, dtype=np.int64)
        w0, w1, w2, w3 = _cr_weights(f, d)
        assert ((w0 + w1 + w2 + w3) == 2 * d ** 3).all()
        x0 = 7
        lin = w0 * (x0 - 1) + w1 * x0 + w2 * (x0 + 1) + w3 * (x0 + 2)
        # sum_k w_k*(x0+k-1) = 2d^3*(x0 + f/d)  ==  lin*d = 2d^3*(x0*d+f)
        assert (lin * d == 2 * d ** 3 * (x0 * d + f)).all()


def test_resize_cubic_matches_float_reference(spark):
    """The integer-exact bicubic stats must agree with an independent
    float Catmull-Rom implementation to float tolerance."""
    import numpy as np

    from rsgislib_spark.sources.multimodal import resize_cubic_stats

    rng = np.random.RandomState(3)
    w, h, ow, oh = 40, 30, 16, 12
    arr = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
    df = spark.createDataFrame(
        [("i0", bytearray(arr.tobytes()), w, h, "raw8")],
        "image_id string, bytes binary, w int, h int, fmt string")
    r = resize_cubic_stats(df, ow, oh).collect()[0]

    def cr(t):
        return np.array([(-t**3 + 2*t**2 - t) / 2,
                         (3*t**3 - 5*t**2 + 2) / 2,
                         (-3*t**3 + 4*t**2 + t) / 2,
                         (t**3 - t**2) / 2])

    a = arr.astype(np.float64)
    scale = 4.0 * (2*ow)**3 * (2*oh)**3 / 4.0  # (2Dx^3)*(2Dy^3)
    total = 0.0
    for yo in range(oh):
        py = (yo + 0.5) * h / oh - 0.5
        y0 = int(np.floor(py)); ty = py - y0
        wy = cr(ty)
        for xo in range(ow):
            px = (xo + 0.5) * w / ow - 0.5
            x0 = int(np.floor(px)); tx = px - x0
            wx = cr(tx)
            v = 0.0
            for ky in range(4):
                yy = min(max(y0 + ky - 1, 0), h - 1)
                for kx in range(4):
                    xx = min(max(x0 + kx - 1, 0), w - 1)
                    v += wy[ky] * wx[kx] * a[yy, xx]
            total += v
    # scaled integer sum / (2Dx^3 * 2Dy^3) vs the float reference sum
    denom = (2.0 * (2 * ow) ** 3) * (2.0 * (2 * oh) ** 3)
    assert abs(r.sum_sc / denom - total) < 1e-6 * max(1.0, abs(total))


def test_bspline_weights_exact_properties():
    """The scaled integer B-spline weights must form an exact partition
    of unity (sum = 6*d^3), be non-negative (the no-overshoot property
    that defines INTERP_CUBICSPLINE), and reproduce linear ramps
    exactly (B-splines have linear precision)."""
    import numpy as np

    from rsgislib_spark.sources.multimodal import _bs_weights

    for d in (48, 32, 10):
        f = np.arange(d, dtype=np.int64)
        w0, w1, w2, w3 = _bs_weights(f, d)
        assert ((w0 + w1 + w2 + w3) == 6 * d ** 3).all()
        for w in (w0, w1, w2, w3):
            assert (w >= 0).all()
        x0 = 7
        lin = w0 * (x0 - 1) + w1 * x0 + w2 * (x0 + 1) + w3 * (x0 + 2)
        # linear precision: sum_k w_k*(x0+k-1) = 6d^3*(x0 + f/d)
        assert (lin * d == 6 * d ** 3 * (x0 * d + f)).all()


def test_lanczos_table_properties():
    """Quantized Lanczos table: every row sums to exactly the scale
    (forced partition of unity), the t=0 row is a pure center tap, and
    quantization error per tap is bounded by one quantum plus the
    center-tap residual fold."""
    import numpy as np

    from rsgislib_spark.sources.multimodal import LANCZOS_SCALE, lanczos_table

    for d in (96, 64, 10):
        tab = lanczos_table(d)
        assert tab.shape == (d, 6)
        assert (tab.sum(axis=1) == LANCZOS_SCALE).all()
        assert list(tab[0]) == [0, 0, LANCZOS_SCALE, 0, 0, 0]

        # independent float reference for the non-center taps
        t = np.arange(d) / d
        ks = np.arange(-2, 4, dtype=float)
        x = t[:, None] - ks[None, :]
        with np.errstate(invalid="ignore", divide="ignore"):
            w = np.where(np.abs(x) < 3,
                         np.sinc(x) * np.sinc(x / 3), 0.0)
        w[0, 2] = 1.0
        w = w / w.sum(axis=1, keepdims=True)
        err = np.abs(tab / LANCZOS_SCALE - w)
        mask = np.ones_like(err, dtype=bool)
        mask[:, 2] = False  # center tap absorbs the rounding residual
        assert err[mask].max() <= 0.5 / LANCZOS_SCALE + 1e-12
        assert err[:, 2].max() <= 6.0 / LANCZOS_SCALE


def test_resize_lanczos_matches_float_reference(spark):
    """The integer Lanczos stats must agree with an independent float
    Lanczos-3 implementation to quantization tolerance."""
    import numpy as np

    from rsgislib_spark.sources.multimodal import (LANCZOS_SCALE,
                                                   resize_lanczos_stats)

    rng = np.random.RandomState(11)
    w, h, ow, oh = 40, 30, 16, 12
    arr = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
    df = spark.createDataFrame(
        [("i0", bytearray(arr.tobytes()), w, h, "raw8")],
        "image_id string, bytes binary, w int, h int, fmt string")
    r = resize_lanczos_stats(df, ow, oh).collect()[0]

    def lz(t):
        x = t - np.arange(-2, 4, dtype=float)
        with np.errstate(invalid="ignore", divide="ignore"):
            w_ = np.where(np.abs(x) < 3, np.sinc(x) * np.sinc(x / 3), 0.0)
        if t == 0.0:
            w_ = np.array([0, 0, 1.0, 0, 0, 0])
        return w_ / w_.sum()

    a = arr.astype(np.float64)
    total = 0.0
    for yo in range(oh):
        py = (yo + 0.5) * h / oh - 0.5
        y0 = int(np.floor(py))
        wy = lz(py - y0)
        for xo in range(ow):
            px = (xo + 0.5) * w / ow - 0.5
            x0 = int(np.floor(px))
            wx = lz(px - x0)
            v = 0.0
            for ky in range(6):
                yy = min(max(y0 + ky - 2, 0), h - 1)
                for kx in range(6):
                    xx = min(max(x0 + kx - 2, 0), w - 1)
                    v += wy[ky] * wx[kx] * a[yy, xx]
            total += v
    approx = r.sum_sc / float(LANCZOS_SCALE) ** 2
    # per-tap quantization <= 0.5/scale (residual on center), 36 taps,
    # pixel <= 255, n_out outputs
    tol = ow * oh * 36 * (7.0 / LANCZOS_SCALE) * 255
    assert abs(approx - total) < tol
