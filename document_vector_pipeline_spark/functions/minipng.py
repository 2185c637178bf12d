"""Minimal pure-stdlib PNG codec (8-bit RGB / RGBA, no interlace) — the
vendored image codec behind the multimodal decode/resize seams, so the
real-codec test paths run actual image bytes in every test run instead
of an optional-skip behind PIL.

Scope (documented, honest): encode writes 8-bit RGB, filter 0, one
IDAT; decode handles 8-bit RGB/RGBA/greyscale with all five standard
scanline filters and joined IDATs — the subset every plain
screenshot/diagram PNG uses.  Palette, 16-bit, and interlaced images
need a real codec (PIL) dropped into the same seam.

Everything derives from the public PNG specification (RFC 2083 /
ISO 15948); zlib is the stdlib binding.
"""

from __future__ import annotations

import struct
import zlib

__all__ = ["png_encode", "png_decode", "png_resize_nearest"]

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def png_encode(pixels: list, width: int, height: int) -> bytes:
    """8-bit RGB encode: ``pixels`` is row-major [(r, g, b), ...] of
    exactly width*height tuples; filter 0 on every scanline."""
    if len(pixels) != width * height:
        raise ValueError("pixel count != width*height")
    raw = bytearray()
    for y in range(height):
        raw.append(0)                       # filter type 0 (None)
        for x in range(width):
            raw += bytes(pixels[y * width + x])
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_decode(data: bytes):
    """(width, height, channels, pixels) with pixels row-major flat
    bytes (len = w*h*channels).  Raises ValueError on non-PNG bytes or
    an unsupported color mode."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG: bad signature")
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 8 <= len(data):
        (ln,), tag = struct.unpack(">I", data[pos:pos + 4]), \
            data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("not a PNG: missing IHDR")
    w, h, depth, color, _, _, interlace = ihdr
    if depth != 8 or interlace != 0 or color not in (0, 2, 6):
        raise ValueError(
            f"unsupported PNG mode (depth={depth}, color={color}, "
            f"interlace={interlace}) — use a real codec for this file")
    ch = {0: 1, 2: 3, 6: 4}[color]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    out = bytearray(h * stride)
    prev = bytearray(stride)
    p = 0
    for y in range(h):
        f = raw[p]
        line = bytearray(raw[p + 1:p + 1 + stride])
        p += 1 + stride
        if f == 1:
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif f == 2:
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                c = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        elif f != 0:
            raise ValueError(f"bad PNG filter type {f}")
        out[y * stride:(y + 1) * stride] = line
        prev = line
    return w, h, ch, bytes(out)


def png_resize_nearest(data: bytes, new_w: int, new_h: int) -> bytes:
    """Decode → nearest-neighbor resample → re-encode (RGB output) —
    the deterministic resize a real codec seam swaps for bilinear."""
    w, h, ch, px = png_decode(data)
    out = []
    for y in range(new_h):
        sy = min(y * h // new_h, h - 1)
        for x in range(new_w):
            sx = min(x * w // new_w, w - 1)
            o = (sy * w + sx) * ch
            out.append((px[o], px[o + 1] if ch > 1 else px[o],
                        px[o + 2] if ch > 2 else px[o]))
    return png_encode(out, new_w, new_h)
