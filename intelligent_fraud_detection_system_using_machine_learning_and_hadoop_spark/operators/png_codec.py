"""Minimal pure-stdlib PNG codec (VERDICT r17 item 7 — the permanent
answer to the PIL question).

PIL is absent in the build sandbox, so with only a PIL-gated real
path the decode/resize legs of operators/multimodal.py could never
execute where the tests run. This module vendors the ~150 lines of
PNG that the multimodal surface actually needs — 8-bit greyscale /
grey+alpha / RGB / RGBA, non-interlaced, the five standard scanline
filters — implemented from the public PNG specification (RFC 2083 /
ISO 15948; the IDAT payload is plain zlib, the predictors are
Sub/Up/Average/Paeth) on ``struct`` + ``zlib`` alone. With it, the
REAL leg (bytes → pixels → resample → bytes) runs in every
environment; PIL, when present, still takes precedence in
multimodal.py because it covers every container format, not just PNG.

Deliberately NOT supported (each raises ``ValueError`` so callers
fall through to the header-parse/stub path rather than mis-decoding):
palette color (type 3), bit depths other than 8, interlace, and
ancillary-chunk semantics (gamma/ICC are skipped, not applied).

Pixel layout: rows are packed top-to-bottom as one ``bytes`` of
``height * width * channels`` samples — the natural numpy
``frombuffer(...).reshape(h, w, ch)`` shape.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"

#: channels per supported color type
_TYPE_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_CHANNELS_TYPE = {v: k for k, v in _TYPE_CHANNELS.items()}


def _chunks(data: bytes):
    """Yield (chunk_type, payload), CRC-checked."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    i = 8
    n = len(data)
    while i + 8 <= n:
        (length,) = struct.unpack(">I", data[i : i + 4])
        ctype = data[i + 4 : i + 8]
        payload = data[i + 8 : i + 8 + length]
        if len(payload) != length:
            raise ValueError("truncated chunk")
        crc = struct.unpack(">I", data[i + 8 + length : i + 12 + length])[0]
        if zlib.crc32(ctype + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {ctype!r}")
        yield ctype, payload
        i += 12 + length
        if ctype == b"IEND":
            return
    raise ValueError("missing IEND")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """(width, height, channels, pixels) from PNG bytes; 8-bit
    non-interlaced greyscale/GA/RGB/RGBA only (ValueError otherwise,
    including on any corrupt chunk — callers treat that as
    'not decodable here' and fall back)."""
    width = height = None
    channels = 0
    idat = bytearray()
    for ctype, payload in _chunks(bytes(data)):
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if color not in _TYPE_CHANNELS:
                raise ValueError(f"unsupported color type {color}")
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
            if comp != 0 or filt != 0:
                raise ValueError("nonstandard compression/filter method")
            channels = _TYPE_CHANNELS[color]
        elif ctype == b"IDAT":
            idat.extend(payload)
    if width is None or not idat:
        raise ValueError("missing IHDR or IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("IDAT size mismatch")
    out = bytearray(height * stride)
    prev_off = -stride
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        line = raw[pos + 1 : pos + 1 + stride]
        pos += 1 + stride
        off = y * stride
        if ftype == 0:  # None
            out[off : off + stride] = line
        elif ftype == 1:  # Sub
            for x in range(stride):
                left = out[off + x - channels] if x >= channels else 0
                out[off + x] = (line[x] + left) & 0xFF
        elif ftype == 2:  # Up
            for x in range(stride):
                up = out[prev_off + x] if y > 0 else 0
                out[off + x] = (line[x] + up) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = out[off + x - channels] if x >= channels else 0
                up = out[prev_off + x] if y > 0 else 0
                out[off + x] = (line[x] + ((left + up) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = out[off + x - channels] if x >= channels else 0
                up = out[prev_off + x] if y > 0 else 0
                ul = out[prev_off + x - channels] if (y > 0 and x >= channels) else 0
                out[off + x] = (line[x] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"unknown filter type {ftype}")
        prev_off = off
    return width, height, channels, bytes(out)


def encode_png(width: int, height: int, channels: int, pixels: bytes) -> bytes:
    """PNG bytes from packed 8-bit pixels (filter 0 every row — the
    simplest spec-valid stream; compression ratio is not this
    module's job)."""
    if channels not in _CHANNELS_TYPE:
        raise ValueError(f"unsupported channel count {channels}")
    stride = width * channels
    if len(pixels) != height * stride:
        raise ValueError("pixel buffer size mismatch")
    raw = bytearray()
    for y in range(height):
        raw.append(0)
        raw.extend(pixels[y * stride : (y + 1) * stride])

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, _CHANNELS_TYPE[channels], 0, 0, 0)
    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def resize_nearest(
    width: int, height: int, channels: int, pixels: bytes, max_side: int
) -> tuple[int, int, bytes]:
    """Nearest-neighbor downscale so max(w, h) <= max_side (no-op
    when already within bounds) — PIL.thumbnail's geometry with the
    simplest deterministic resample kernel. Index map is the standard
    floor((i + 0.5) * src / dst) center-sample rule."""
    scale = min(1.0, max_side / max(width, height, 1))
    nw, nh = max(1, int(width * scale)), max(1, int(height * scale))
    if (nw, nh) == (width, height):
        return width, height, bytes(pixels)
    xs = [min(width - 1, int((x + 0.5) * width / nw)) for x in range(nw)]
    stride = width * channels
    out = bytearray(nh * nw * channels)
    o = 0
    for y in range(nh):
        sy = min(height - 1, int((y + 0.5) * height / nh))
        row = sy * stride
        for sx in xs:
            p = row + sx * channels
            out[o : o + channels] = pixels[p : p + channels]
            o += channels
    return nw, nh, bytes(out)
