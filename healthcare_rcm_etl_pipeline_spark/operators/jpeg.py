"""Baseline-sequential JFIF (JPEG) codec in pure numpy.

The sandbox ships no PIL/ffmpeg, but baseline JPEG is a published spec
(ITU-T T.81) a numpy container can implement directly: marker parse ->
Huffman entropy decode -> dequantize -> dezigzag -> 8x8 IDCT -> chroma
upsample -> YCbCr->RGB. ``decode_jpeg`` covers the baseline process (SOF0,
8-bit, 1 or 3 components, 4:4:4 / 4:2:2 / 4:2:0 subsampling, restart
markers, stuffed bytes); progressive (SOF2) / arithmetic / 12-bit variants
raise ValueError so the multimodal layer's flagged ``decoded=false``
fallback still covers the exotic tail.

``encode_jpeg`` exists to make REAL fixtures in-container (standard Annex K
quantization + Huffman tables, quality scaling, optional 4:2:0): tests
round-trip encoder->decoder within quantization tolerance, and solid-color
images pin absolute correctness (a flat block survives quantization
exactly, so decode must return the color bit-exact).

Everything here is per-payload CPU work invoked from Arrow-batched
``mapInPandas`` (operators/multimodal.py) — embarrassingly parallel on a
cluster; no Spark dependency in this module.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# shared tables
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# ITU-T T.81 Annex K.1 example quantization tables (the de-facto standard)
STD_LUMA_Q = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

STD_CHROMA_Q = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# Annex K.3 typical Huffman tables: (bits[1..16] counts, symbol values)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal 8x8 DCT-II basis: spatial = T.T @ coeff @ T
_DCT_T = np.array([
    [(np.sqrt(1 / 8) if k == 0 else 0.5) * np.cos((2 * n + 1) * k * np.pi / 16)
     for n in range(8)]
    for k in range(8)
])


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(code_length, code_value) -> symbol, per T.81 canonical assignment."""
    out: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over entropy-coded bytes (0xFF00 already
    unstuffed by the caller)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("entropy data exhausted")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


def _huff_decode(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | reader.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 sign extension of a t-bit magnitude value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _idct8x8(coeff: np.ndarray) -> np.ndarray:
    return _DCT_T.T @ coeff @ _DCT_T


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline-sequential JFIF payload to (h, w, ch) uint8
    (ch = 3 RGB for YCbCr images, 1 for grayscale). Raises ValueError for
    non-baseline variants (progressive SOF2, arithmetic coding, 12-bit)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}  # (class, id)
    frame = None          # (h, w, comps) from SOF0
    restart_interval = 0
    i = 2
    n = len(payload)
    while i < n:
        if payload[i] != 0xFF:
            raise ValueError("marker expected")
        marker = payload[i + 1]
        i += 2
        if marker == 0xD8:
            continue
        if marker == 0xD9:  # EOI
            break
        length = int.from_bytes(payload[i : i + 2], "big")
        seg = payload[i + 2 : i + length]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                prec, tid = seg[j] >> 4, seg[j] & 0x0F
                j += 1
                if prec:
                    raise ValueError("16-bit quantization tables not supported")
                q = np.frombuffer(seg[j : j + 64], dtype=np.uint8).astype(np.int32)
                qtables[tid] = q  # zigzag order
                j += 64
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0x0F
                bits = list(seg[j + 1 : j + 17])
                nv = sum(bits)
                vals = list(seg[j + 17 : j + 17 + nv])
                huff[(tc, th)] = _canonical_codes(bits, vals)
                j += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/SOF1 (baseline huffman)
            if seg[0] != 8:
                raise ValueError("only 8-bit precision supported")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"non-baseline SOF marker 0xFF{marker:02X} not supported")
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(x for x in frame[2] if x["id"] == cid)
                scan.append((comp, tt >> 4, tt & 0x0F))
            ecs_start = i + length
            return _decode_scan(
                payload, ecs_start, frame, scan, qtables, huff, restart_interval
            )
        # APPn / COM / everything else: skip
        i += length
    raise ValueError("no scan data found")


def _decode_scan(payload, start, frame, scan, qtables, huff, restart_interval):
    img_h, img_w, comps = frame
    # strip stuffed bytes and locate markers inside the entropy stream
    raw = bytearray()
    i, n = start, len(payload)
    while i < n:
        b = payload[i]
        if b == 0xFF:
            m = payload[i + 1] if i + 1 < n else 0xD9
            if m == 0x00:
                raw.append(0xFF)
                i += 2
                continue
            if 0xD0 <= m <= 0xD7:  # RSTn: keep a sentinel; reader aligns there
                raw.append(0xFF)
                raw.append(m)
                i += 2
                continue
            break  # EOI or next marker ends the scan
        raw.append(b)
        i += 1
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-img_w // (8 * hmax))
    mcus_y = -(-img_h // (8 * vmax))
    planes = {}
    for c in comps:
        pw, ph = mcus_x * 8 * c["h"], mcus_y * 8 * c["v"]
        planes[c["id"]] = np.zeros((ph, pw), dtype=np.float64)

    reader = _BitReader(bytes(raw))
    pred = {c["id"]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.align()
                if (
                    reader.pos + 1 < len(reader.data)
                    and reader.data[reader.pos] == 0xFF
                    and 0xD0 <= reader.data[reader.pos + 1] <= 0xD7
                ):
                    reader.pos += 2
                pred = {c["id"]: 0 for c in comps}
            for comp, td, ta in scan:
                q = qtables[comp["tq"]]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        zz = np.zeros(64, dtype=np.int32)
                        t = _huff_decode(reader, huff[(0, td)])
                        diff = _extend(reader.read_bits(t), t)
                        pred[comp["id"]] += diff
                        zz[0] = pred[comp["id"]]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(reader, huff[(1, ta)])
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past end of block")
                            zz[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[ZIGZAG] = (zz * q).astype(np.float64)
                        spatial = _idct8x8(block.reshape(8, 8)) + 128.0
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[comp["id"]][y0 : y0 + 8, x0 : x0 + 8] = spatial
            mcu_count += 1

    # upsample to full resolution (nearest), crop, color-convert
    full = []
    for c in comps:
        p = planes[c["id"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:img_h, :img_w])
    if len(full) == 1:
        y = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return y[:, :, None]
    if len(full) != 3:
        raise ValueError(f"{len(full)}-component JPEG not supported")
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder (fixture-maker: standard tables, baseline, 4:4:4 or 4:2:0)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        while self.nbits:
            self.write(1, 1)  # pad with 1s per spec

    def marker(self, m: int) -> None:
        """Byte-aligned raw marker (RSTn) — written unstuffed."""
        self.flush()
        self.out += bytes([0xFF, m])


def _scale_q(q: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(quality, 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((q * s + 50) // 100, 1, 255).astype(np.int32)


def _encode_codes(bits, vals):
    table = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return table


def _magnitude(v: int) -> tuple[int, int]:
    """(category t, t-bit code) for a DC diff / AC value per T.81 F.1.2."""
    t = int(v != 0 and int(abs(v)).bit_length())
    code = v if v >= 0 else v + (1 << t) - 1
    return t, code


def _fdct8x8(block: np.ndarray) -> np.ndarray:
    return _DCT_T @ block @ _DCT_T.T


def _encode_plane_block(writer, block, q, dc_tab, ac_tab, pred):
    coeff = _fdct8x8(block - 128.0)
    zz = np.round(coeff.reshape(64)[ZIGZAG] / q).astype(np.int32)
    diff = int(zz[0]) - pred
    t, code = _magnitude(diff)
    length, huffcode = dc_tab[t]
    writer.write(huffcode, length)
    if t:
        writer.write(code, t)
    run = 0
    last_nz = int(np.nonzero(zz[1:])[0][-1]) + 1 if np.any(zz[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            length, huffcode = ac_tab[0xF0]  # ZRL
            writer.write(huffcode, length)
            run -= 16
        t, code = _magnitude(v)
        length, huffcode = ac_tab[(run << 4) | t]
        writer.write(huffcode, length)
        writer.write(code, t)
        run = 0
    if last_nz < 63:
        length, huffcode = ac_tab[0x00]  # EOB
        writer.write(huffcode, length)
    return int(zz[0])


def encode_jpeg(
    img: np.ndarray,
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Baseline JFIF encode of an (h, w, 3) RGB or (h, w, 1)/(h, w) gray
    uint8 array. ``subsample=True`` writes 4:2:0 chroma;
    ``restart_interval`` emits a DRI segment + RSTn markers every that many
    MCUs (predictors reset — exercises the decoder's restart path)."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    gray = ch == 1
    ql = _scale_q(STD_LUMA_Q, quality)
    qc = _scale_q(STD_CHROMA_Q, quality)
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00\x01\x01\x00" + b"\x00\x01\x00\x01\x00\x00"

    def seg(marker, body):
        return marker + (len(body) + 2).to_bytes(2, "big") + body

    out += seg(b"\xff\xdb", bytes([0]) + bytes(ql.tolist()))
    if not gray:
        out += seg(b"\xff\xdb", bytes([1]) + bytes(qc.tolist()))
    # SOF0
    hv_y = 0x22 if (subsample and not gray) else 0x11
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    if gray:
        sof += bytes([1, 1, 0x11, 0])
    else:
        sof += bytes([3, 1, hv_y, 0, 2, 0x11, 1, 3, 0x11, 1])
    out += seg(b"\xff\xc0", sof)
    # DHT
    def dht(tc, th, bits, vals):
        return seg(b"\xff\xc4", bytes([(tc << 4) | th] + bits + vals))

    out += dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if not gray:
        out += dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    if restart_interval:
        out += seg(b"\xff\xdd", restart_interval.to_bytes(2, "big"))
    # SOS
    if gray:
        out += seg(b"\xff\xda", bytes([1, 1, 0x00, 0, 63, 0]))
    else:
        out += seg(b"\xff\xda", bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))

    dc_y = _encode_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_y = _encode_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _encode_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _encode_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    f = img.astype(np.float64)
    if gray:
        planes = [f[:, :, 0]]
    else:
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]

    def pad_to(p, mult):
        ph = -(-p.shape[0] // mult) * mult
        pw = -(-p.shape[1] // mult) * mult
        return np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge")

    writer = _BitWriter()
    if gray or not subsample:
        padded = [pad_to(p, 8) for p in planes]
        mcus_y, mcus_x = padded[0].shape[0] // 8, padded[0].shape[1] // 8
        preds = [0] * len(planes)
        tabs = [(ql, dc_y, ac_y)] + [(qc, dc_c, ac_c)] * (len(planes) - 1)
        mcu = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    writer.marker(0xD0 + (mcu // restart_interval - 1) % 8)
                    preds = [0] * len(planes)
                for ci, p in enumerate(padded):
                    q, dct, act = tabs[ci]
                    blk = p[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
                    preds[ci] = _encode_plane_block(writer, blk, q, dct, act, preds[ci])
                mcu += 1
    else:
        yp = pad_to(planes[0], 16)
        mcus_y, mcus_x = yp.shape[0] // 16, yp.shape[1] // 16

        # 4:2:0: average 2x2 chroma, then pad to exactly (mcus_y*8, mcus_x*8)
        def down(p):
            p = pad_to(p, 2)
            half = (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0
            return np.pad(
                half,
                ((0, mcus_y * 8 - half.shape[0]), (0, mcus_x * 8 - half.shape[1])),
                mode="edge",
            )

        cbp, crp = down(planes[1]), down(planes[2])
        pred = [0, 0, 0]
        mcu = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    writer.marker(0xD0 + (mcu // restart_interval - 1) % 8)
                    pred = [0, 0, 0]
                for by in range(2):
                    for bx in range(2):
                        blk = yp[
                            (my * 2 + by) * 8 : (my * 2 + by) * 8 + 8,
                            (mx * 2 + bx) * 8 : (mx * 2 + bx) * 8 + 8,
                        ]
                        pred[0] = _encode_plane_block(writer, blk, ql, dc_y, ac_y, pred[0])
                for ci, p in ((1, cbp), (2, crp)):
                    blk = p[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
                    pred[ci] = _encode_plane_block(writer, blk, qc, dc_c, ac_c, pred[ci])
                mcu += 1
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
