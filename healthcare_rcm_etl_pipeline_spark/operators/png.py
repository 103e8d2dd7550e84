"""Baseline PNG codec in pure numpy + the stdlib ``zlib`` (RFC 2083 /
W3C PNG spec) — the container ships no PIL, and PNG's only heavy
dependency is DEFLATE, which Python's zlib provides. Decoder supports the
non-interlaced 8-bit-depth core: color types 0 (gray), 2 (RGB),
3 (palette), 4 (gray+alpha), 6 (RGBA) and all five scanline filters
(None/Sub/Up/Average/Paeth). Adam7 interlace and 1/2/4/16-bit depths
raise ValueError, routing those payloads to the flagged decode_stub
fallback — same honesty policy as the JPEG codec.

The encoder writes real PNG bytes with a selectable per-row filter (or a
row-cycling mix), which is what makes the decoder's unfilter paths
testable in-container: encoding direction is fully vectorizable (filtered
= cur - predictor, no sequential dependency), while decoding Sub reduces
to a per-channel cumulative sum mod 256 and Average/Paeth keep the
spec-mandated left-to-right dependency (documented O(w) python loop per
row — fixture-scale payloads; large-scale decode belongs behind a native
library, which is exactly what the flagged fallback communicates).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, channels) uint8 array (palette expanded to RGB).
    Raises ValueError on non-PNG, interlaced, or non-8-bit input."""
    if payload[:8] != _SIG:
        raise ValueError("not a PNG signature")
    pos = 8
    ihdr = None
    plte = None
    idat = []
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos : pos + 4]), payload[
            pos + 4 : pos + 8
        ]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) < length:
            raise ValueError("truncated chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"bit depth {depth} not supported (8 only)")
    if interlace != 0:
        raise ValueError("Adam7 interlace not supported")
    if comp != 0 or filt != 0:
        raise ValueError("nonstandard compression/filter method")
    if color not in _CHANNELS:
        raise ValueError(f"color type {color} not supported")
    bpp = _CHANNELS[color]
    stride = w * bpp
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("scanline payload size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        off = y * (stride + 1)
        f = raw[off]
        cur = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1).copy()
        if f == 0:
            pass
        elif f == 1:  # Sub: cumulative sum per channel, mod 256
            cur = (
                np.cumsum(cur.reshape(w, bpp).astype(np.uint32), axis=0) % 256
            ).astype(np.uint8).reshape(stride)
        elif f == 2:  # Up
            cur = cur + prior  # uint8 wraps mod 256
        elif f == 3:  # Average (left dependency -> per-byte)
            for i in range(stride):
                left = int(cur[i - bpp]) if i >= bpp else 0
                cur[i] = (int(cur[i]) + (left + int(prior[i])) // 2) % 256
        elif f == 4:  # Paeth (left dependency -> per-byte)
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                c = int(prior[i - bpp]) if i >= bpp else 0
                cur[i] = (int(cur[i]) + _paeth(a, int(prior[i]), c)) % 256
        else:
            raise ValueError(f"unknown scanline filter {f}")
        out[y] = cur
        prior = out[y]
    img = out.reshape(h, w, bpp)
    if color == 3:
        if plte is None:
            raise ValueError("palette image without PLTE")
        idx = img[:, :, 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("palette index out of range")
        img = plte[idx]
    return img


def _filter_rows(img2d: np.ndarray, bpp: int, filter_for_row) -> bytes:
    """Apply per-row filters (encoding direction — vectorized: the
    predictor reads ORIGINAL bytes, so there is no sequential dependency)."""
    h = img2d.shape[0]
    cur = img2d.astype(np.int16)
    left = np.zeros_like(cur)
    left[:, bpp:] = cur[:, :-bpp]
    up = np.zeros_like(cur)
    up[1:] = cur[:-1]
    ul = np.zeros_like(cur)
    ul[1:, bpp:] = cur[:-1, :-bpp]
    # vectorized Paeth predictor
    p = left + up - ul
    pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
    paeth = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul))
    preds = {0: 0, 1: left, 2: up, 3: (left + up) // 2, 4: paeth}
    parts = []
    for y in range(h):
        f = filter_for_row(y)
        pred = preds[f]
        row = cur[y] - (pred[y] if isinstance(pred, np.ndarray) else 0)
        parts.append(bytes([f]) + (row % 256).astype(np.uint8).tobytes())
    return b"".join(parts)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(
    img: np.ndarray,
    filter_type: int | None = None,
    palette: np.ndarray | None = None,
) -> bytes:
    """(h, w) or (h, w, channels) uint8 -> PNG bytes. channels: 1 gray,
    2 gray+alpha, 3 RGB, 4 RGBA; pass ``palette`` (n<=256, 3) with a
    (h, w) index array for color type 3. ``filter_type`` fixes one
    scanline filter; None cycles 0..4 by row so every unfilter path is
    exercised by round-trip tests."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    if palette is not None:
        if ch != 1:
            raise ValueError("palette encoding expects a (h, w) index array")
        color, bpp = 3, 1
    else:
        color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
        bpp = ch
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    flat = img.reshape(h, w * bpp)
    pick = (lambda y: filter_type) if filter_type is not None else (lambda y: y % 5)
    raw = _filter_rows(flat, bpp, pick)
    out = [_SIG, _chunk(b"IHDR", ihdr)]
    if palette is not None:
        out.append(_chunk(b"PLTE", palette.astype(np.uint8).tobytes()))
    out.append(_chunk(b"IDAT", zlib.compress(raw, 6)))
    out.append(_chunk(b"IEND", b""))
    return b"".join(out)
