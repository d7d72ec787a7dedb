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
