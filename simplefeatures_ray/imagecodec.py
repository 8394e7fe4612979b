"""Pure-python PNG + PPM codecs (stdlib zlib only — no image libraries
exist in this environment, so the engine carries its own minimal codec
for the multimodal decode stage).

Supported: 8-bit greyscale (color type 0), RGB (2), RGBA (6), no
interlacing; all five PNG scanline filters on decode; encode writes
filter-0 rows. PPM P6 (binary, maxval 255) both ways.

Scale note: decode runs inside actor-pool map_batches stages
(stages/multimodal.DecodeImage); payload bytes never leave the worker.
"""
from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def png_encode(img: np.ndarray) -> bytes:
    """(h, w) or (h, w, {1,3,4}) uint8 -> PNG bytes (filter 0 rows)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    ctype = {1: 0, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    rows = img.reshape(h, w * c)
    raw = np.hstack([np.zeros((h, 1), np.uint8), rows]).tobytes() if h else b""
    return (PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw, 6))
            + _chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc:
        return a
    return b if pb <= pc else c


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, channels) uint8. Greyscale returns c=1."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    idat = bytearray()
    w = h = None
    ctype = bitdepth = None
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, bitdepth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body)
            if bitdepth != 8:
                raise ValueError(f"unsupported PNG bit depth {bitdepth}")
            if ctype not in _CHANNELS:
                raise ValueError(f"unsupported PNG color type {ctype}")
            if interlace:
                raise ValueError("interlaced PNG not supported")
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    c = _CHANNELS[ctype]
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG payload size mismatch")
    raw = raw.reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = int(raw[y, 0])
        line = raw[y, 1:].astype(np.int32)
        if f == 0:
            rec = line
        elif f == 2:  # Up
            rec = line + prev
        elif f == 1:  # Sub: prefix sum over pixels at channel stride
            rec = line.reshape(w, c).cumsum(axis=0).reshape(stride)
        elif f == 3:  # Average
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                left = rec[x - c] if x >= c else 0
                rec[x] = line[x] + ((int(left) + int(prev[x])) >> 1)
                rec[x] &= 0xFF
        elif f == 4:  # Paeth
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                left = rec[x - c] if x >= c else 0
                ul = prev[x - c] if x >= c else 0
                rec[x] = line[x] + _paeth(int(left), int(prev[x]), int(ul))
                rec[x] &= 0xFF
        else:
            raise ValueError(f"unknown PNG filter {f}")
        rec = (rec & 0xFF).astype(np.uint8)
        out[y] = rec
        prev = rec
    return out.reshape(h, w, c)


def ppm_encode(img: np.ndarray) -> bytes:
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def ppm_decode(data: bytes) -> np.ndarray:
    if not data.startswith(b"P6"):
        raise ValueError("not a binary PPM")
    # header: P6 <w> <h> <maxval> then a single whitespace, then pixels
    parts = []
    pos = 2
    while len(parts) < 3:
        while pos < len(data) and data[pos:pos + 1].isspace():
            pos += 1
        if data[pos:pos + 1] == b"#":  # comment line
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos:pos + 1].isspace():
            pos += 1
        parts.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = parts
    if maxval != 255:
        raise ValueError("only maxval 255 PPM supported")
    px = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=pos)
    return px.reshape(h, w, 3).copy()


def resize_nearest(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """Deterministic nearest-neighbour resize to (h, w, c)."""
    sh, sw = img.shape[:2]
    yi = np.minimum((np.arange(h) * sh) // max(h, 1), sh - 1)
    xi = np.minimum((np.arange(w) * sw) // max(w, 1), sw - 1)
    return img[yi[:, None], xi[None, :]]
