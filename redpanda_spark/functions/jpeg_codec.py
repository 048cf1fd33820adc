"""Pure-Python/numpy baseline JPEG codec (encoder + decoder).

Written from the public ITU-T T.81 specification (baseline sequential DCT,
8-bit, Huffman): marker segment parsing (SOI/APPn/DQT/SOF0/DHT/SOS/EOI),
entropy-coded segment with 0xFF00 byte stuffing, per-component DC
prediction, zigzag dequantization, 8x8 inverse DCT, chroma upsampling and
YCbCr→RGB per JFIF. The encoder produces 4:4:4 baseline streams with the
spec's example quantization/Huffman tables (T.81 Annex K) so tests can
round-trip without any third-party codec.

Role parity: the reference treats media payloads as opaque bytes; decode
parity here serves the multimodal pipeline layer (BASELINE mandate), giving
the image path a real JPEG branch where the container lacks PIL
(`functions/multimodal._decode_image` capability ladder).

Scope: baseline DCT, Huffman, 8-bit, 1 or 3 components, no restart
markers, no progressive — out-of-scope streams raise ValueError and the
caller's ladder falls through.
"""

from __future__ import annotations

import struct

import numpy as np

# T.81 Annex K.1 — example luminance/chrominance quantization tables
_QT_LUMA = np.array(
    [16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
     14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
     18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
     49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99],
    dtype=np.int32,
)
_QT_CHROMA = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99],
    dtype=np.int32,
)

# zigzag scan order (T.81 Figure 5)
_ZIGZAG = np.array(
    [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
     12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
     35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
     58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64,
)

# T.81 Annex K.3 — example Huffman tables: (bits[1..16], huffval)
_HT_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HT_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HT_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
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
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_HT_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
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
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)


def _dct_matrix() -> np.ndarray:
    """8x8 DCT-II basis matrix (orthonormal)."""
    n = 8
    M = np.zeros((n, n))
    for k in range(n):
        for i in range(n):
            M[k, i] = np.cos(np.pi * k * (2 * i + 1) / (2 * n))
    M *= np.sqrt(2.0 / n)
    M[0] *= np.sqrt(0.5)
    return M


_DCT = _dct_matrix()


def _fdct(block: np.ndarray) -> np.ndarray:
    return _DCT @ block @ _DCT.T


def _idct(coef: np.ndarray) -> np.ndarray:
    return _DCT.T @ coef @ _DCT


# ---------------------------------------------------------------------------
# Huffman helpers
# ---------------------------------------------------------------------------


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value → (code, length), canonical order per T.81 Annex C."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decode_map(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → value."""
    out: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("jpeg: bitstream exhausted")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:  # skip stuffed 0x00
                if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                    self.pos += 1
                else:
                    raise ValueError("jpeg: unexpected marker in scan")
            self.acc = b
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_code(self, dec: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            if (length, code) in dec:
                return dec[(length, code)]
        raise ValueError("jpeg: invalid huffman code")


def _magnitude(v: int) -> tuple[int, int]:
    """value → (size category, offset bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


# ---------------------------------------------------------------------------
# encoder (baseline, 4:4:4, Annex K tables)
# ---------------------------------------------------------------------------


def _scale_qt(qt: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(quality, 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((qt * s + 50) // 100, 1, 255).astype(np.int32)


def encode_jpeg(img: np.ndarray, quality: int = 90) -> bytes:
    """uint8 HxW (grayscale) or HxWx3 (RGB) → baseline JFIF bytes."""
    if img.ndim == 2:
        img = img[..., None]
    h, w, nc = img.shape
    if nc not in (1, 3):
        raise ValueError("jpeg encoder: 1 or 3 channels")
    img = img.astype(np.float64)
    if nc == 3:
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        comps = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    else:
        comps = [img[..., 0]]

    qts = [_scale_qt(_QT_LUMA, quality)] + (
        [_scale_qt(_QT_CHROMA, quality)] if nc == 3 else []
    )
    dc_codes = [_build_codes(*_HT_DC_LUMA)] + (
        [_build_codes(*_HT_DC_CHROMA)] if nc == 3 else []
    )
    ac_codes = [_build_codes(*_HT_AC_LUMA)] + (
        [_build_codes(*_HT_AC_CHROMA)] if nc == 3 else []
    )

    bw = _BitWriter()
    pred = [0] * nc
    by, bx = (h + 7) // 8, (w + 7) // 8
    for my in range(by):
        for mx in range(bx):
            for ci in range(nc):
                ti = 0 if ci == 0 else 1
                plane = comps[ci]
                blk = np.zeros((8, 8))
                ys, xs = my * 8, mx * 8
                sub = plane[ys : min(ys + 8, h), xs : min(xs + 8, w)]
                blk[: sub.shape[0], : sub.shape[1]] = sub
                # edge-replicate padding for partial blocks
                if sub.shape[0] < 8:
                    blk[sub.shape[0] :, : sub.shape[1]] = sub[-1:, :]
                if sub.shape[1] < 8:
                    blk[:, sub.shape[1] :] = blk[:, sub.shape[1] - 1 : sub.shape[1]]
                coef = _fdct(blk - 128.0)
                q = np.round(coef.flatten()[_ZIGZAG] / qts[ti][_ZIGZAG]).astype(int)
                # DC
                diff = int(q[0]) - pred[ci]
                pred[ci] = int(q[0])
                size, bits = _magnitude(diff)
                c, ln = dc_codes[ti][size]
                bw.write(c, ln)
                if size:
                    bw.write(bits, size)
                # AC with run-lengths
                run = 0
                for k in range(1, 64):
                    v = int(q[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        c, ln = ac_codes[ti][0xF0]  # ZRL
                        bw.write(c, ln)
                        run -= 16
                    size, bits = _magnitude(v)
                    c, ln = ac_codes[ti][(run << 4) | size]
                    bw.write(c, ln)
                    bw.write(bits, size)
                    run = 0
                if run:
                    c, ln = ac_codes[ti][0x00]  # EOB
                    bw.write(c, ln)
    scan = bw.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + b"\x00\x01\x00\x01\x00\x00"
    for ti, qt in enumerate(qts):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([ti]) + bytes(
            int(qt[z]) for z in _ZIGZAG
        )
    # SOF0
    ncomp = nc
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci in range(ncomp):
        out += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    # DHT
    tables = [(0x00, _HT_DC_LUMA), (0x10, _HT_AC_LUMA)]
    if nc == 3:
        tables += [(0x01, _HT_DC_CHROMA), (0x11, _HT_AC_CHROMA)]
    for tc, (bits, vals) in tables:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) + bytes([tc])
        out += bytes(bits) + bytes(vals)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        out += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    out += b"\x00\x3f\x00"
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes → HxWxC uint8 (C = 1 or 3, RGB)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_maps: dict[int, dict] = {}
    ac_maps: dict[int, dict] = {}
    comps: list[dict] = []
    h = w = 0
    scan_data = b""
    scan_comps: list[dict] = []
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"jpeg: expected marker at {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        seglen = struct.unpack_from(">H", payload, pos)[0]
        seg = payload[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT (may hold several tables)
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                if pq != 0:
                    raise ValueError("jpeg: 16-bit qt unsupported")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[_ZIGZAG] = np.frombuffer(seg[p + 1 : p + 65], dtype=np.uint8)
                qts[tq] = tbl
                p += 65
        elif marker == 0xC0:  # SOF0 baseline
            _prec, h, w, nf = struct.unpack_from(">BHHB", seg, 0)
            p = 6
            for _ in range(nf):
                cid, hv, tq = seg[p], seg[p + 1], seg[p + 2]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
                p += 3
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("jpeg: only baseline SOF0 supported")
        elif marker == 0xC4:  # DHT (may hold several tables)
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                (ac_maps if tc else dc_maps)[th] = _build_decode_map(bits, vals)
                p += 17 + n
        elif marker == 0xDD:
            raise ValueError("jpeg: restart intervals unsupported")
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            p = 1
            for _ in range(ns):
                cid, tbl = seg[p], seg[p + 1]
                comp = next(c for c in comps if c["id"] == cid)
                comp["td"], comp["ta"] = tbl >> 4, tbl & 0xF
                scan_comps.append(comp)
                p += 2
            # entropy-coded data runs to the next non-stuffed, non-RST marker
            end = pos
            while end < len(payload) - 1:
                if payload[end] == 0xFF and payload[end + 1] not in (0x00,) and not (
                    0xD0 <= payload[end + 1] <= 0xD7
                ):
                    break
                end += 1
            scan_data = payload[pos:end]
            pos = end
    if not scan_comps or h == 0:
        raise ValueError("jpeg: missing SOS/SOF0")
    hmax = max(c["h"] for c in scan_comps)
    vmax = max(c["v"] for c in scan_comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in scan_comps:
        pw, ph = mcux * 8 * c["h"], mcuy * 8 * c["v"]
        planes.append(np.zeros((ph, pw)))
    br = _BitReader(scan_data)
    pred = [0] * len(scan_comps)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, c in enumerate(scan_comps):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        size = br.read_code(dc_maps[c["td"]])
                        diff = _extend(br.read_bits(size), size)
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = br.read_code(ac_maps[c["ta"]])
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("jpeg: AC index overflow")
                            zz[k] = _extend(br.read_bits(s), s)
                            k += 1
                        coef = np.zeros(64)
                        coef[_ZIGZAG] = zz * qts[c["tq"]][_ZIGZAG]
                        blk = _idct(coef.reshape(8, 8)) + 128.0
                        ys = (my * c["v"] + by) * 8
                        xs = (mx * c["h"] + bx) * 8
                        planes[ci][ys : ys + 8, xs : xs + 8] = blk
    # upsample to full resolution and crop
    full = []
    for ci, c in enumerate(scan_comps):
        p = planes[ci]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)[..., None]
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
