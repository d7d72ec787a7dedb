"""Image payload codecs: ``bytes`` column <-> numpy pixel arrays.

The engine treats pixels as opaque ``BinaryType`` payloads decoded to numpy
inside Arrow-vectorized UDFs (SURVEY.md §1.1a).  Formats carried in the
``fmt`` column:

* ``raw8``  — uint8 grayscale, row-major, no header (lossless);
* ``raw16`` — uint16 little-endian grayscale, row-major (lossless), the
  analog of the reference's uint16 Sentinel-2 fixtures
  (reference: python_tests/test_imageutils.py:112 — 931x947 uint16);
* ``png``   — real PNG (grayscale, 8 or 16 bit) implemented on zlib —
  lossless, exercises a genuine compressed codec path;
* ``jpeg``  — lossy; no JPEG library exists in this container, so decode is
  STUBBED: payloads produced by :func:`encode_jpeg_stub` carry a raw16
  body plus deterministic quantization noise bounded so PSNR >= 40 dB
  (matching the task's lossy tolerance); a real libjpeg can be dropped in
  behind the same interface.

All functions operate on single images (ndarray (h, w) or (bands, h, w));
the operators layer maps them over Arrow record batches.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = [
    "decode_image",
    "encode_image",
    "encode_png",
    "decode_png",
    "encode_jpeg_stub",
    "decode_jpeg_stub",
    "psnr",
]

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """Grayscale PNG (bit depth 8 for uint8 input, 16 for uint16)."""
    if arr.ndim != 2:
        raise ValueError("encode_png expects a 2-D grayscale array")
    if arr.dtype == np.uint8:
        depth, payload = 8, arr
    elif arr.dtype == np.uint16:
        depth, payload = 16, arr.astype(">u2")
    else:
        raise ValueError(f"unsupported dtype for png: {arr.dtype}")
    h, w = arr.shape
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 0, 0, 0, 0)
    raw = payload.tobytes()
    stride = w * (depth // 8)
    scan = b"".join(
        b"\x00" + raw[y * stride:(y + 1) * stride] for y in range(h)
    )
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(scan, 6))
        + _chunk(b"IEND", b"")
    )


def _unfilter(data: bytes, h: int, stride: int, bpp: int) -> bytearray:
    """Reverse PNG scanline filters 0-4 (encoder emits 0, decoder takes all)."""
    out = bytearray(h * stride)
    pos = 0
    prev_row = bytearray(stride)
    for y in range(h):
        ftype = data[pos]
        pos += 1
        row = bytearray(data[pos:pos + stride])
        pos += stride
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev_row[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prev_row[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                b = prev_row[i]
                c = prev_row[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y * stride:(y + 1) * stride] = row
        prev_row = row
    return out


def decode_png(buf: bytes) -> np.ndarray:
    if buf[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = depth = None
    idat = b""
    while pos < len(buf):
        (length,) = struct.unpack_from(">I", buf, pos)
        tag = buf[pos + 4:pos + 8]
        body = buf[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", body)
            if ctype != 0 or interlace != 0:
                raise ValueError("only non-interlaced grayscale PNG supported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    bpp = depth // 8
    stride = w * bpp
    raw = _unfilter(zlib.decompress(idat), h, stride, bpp)
    dt = ">u2" if depth == 16 else np.uint8
    arr = np.frombuffer(bytes(raw), dtype=dt).reshape(h, w)
    return arr.astype(np.uint16) if depth == 16 else arr


def encode_jpeg_stub(arr: np.ndarray) -> bytes:
    """Deterministic stand-in for lossy JPEG (no JPEG lib in container).

    Quantizes uint16 values to steps of 4 (max abs error 2 on a 0..1023
    signal -> PSNR ~ 48 dB > 40 dB threshold) and stores raw16 under a
    marker header.  Swap in a real encoder behind this signature later.
    """
    if arr.dtype != np.uint16:
        raise ValueError("jpeg stub expects uint16")
    q = ((arr.astype(np.int32) + 2) // 4 * 4).clip(0, 65535).astype(np.uint16)
    h, w = arr.shape
    return b"JPGS" + struct.pack("<II", w, h) + q.astype("<u2").tobytes()


def decode_jpeg_stub(buf: bytes) -> np.ndarray:
    if buf[:4] != b"JPGS":
        raise NotImplementedError(
            "real JPEG decode requires libjpeg, not present in this container"
        )
    w, h = struct.unpack_from("<II", buf, 4)
    return np.frombuffer(buf, dtype="<u2", offset=12).reshape(h, w).astype(np.uint16)


def decode_image(buf: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    """bytes -> (h, w) ndarray (uint8 for raw8, else uint16)."""
    if fmt == "raw16":
        return np.frombuffer(buf, dtype="<u2").reshape(h, w)
    if fmt == "raw8":
        return np.frombuffer(buf, dtype=np.uint8).reshape(h, w)
    if fmt == "png":
        arr = decode_png(buf)
        if arr.shape != (h, w):
            raise ValueError("png size mismatch vs metadata")
        return arr
    if fmt == "jpeg":
        return decode_jpeg_stub(buf)
    raise ValueError(f"unknown fmt {fmt!r}")


def encode_image(arr: np.ndarray, fmt: str) -> bytes:
    if fmt == "raw16":
        return arr.astype("<u2").tobytes()
    if fmt == "raw8":
        return arr.astype(np.uint8).tobytes()
    if fmt == "png":
        return encode_png(arr)
    if fmt == "jpeg":
        return encode_jpeg_stub(arr)
    raise ValueError(f"unknown fmt {fmt!r}")


def psnr(ref: np.ndarray, test: np.ndarray, peak: float | None = None) -> float:
    """Peak signal-to-noise ratio in dB (inf for identical arrays)."""
    ref = np.asarray(ref, np.float64)
    test = np.asarray(test, np.float64)
    mse = float(np.mean((ref - test) ** 2))
    if mse == 0.0:
        return float("inf")
    if peak is None:
        peak = float(ref.max()) or 1.0
    return 10.0 * np.log10(peak * peak / mse)
